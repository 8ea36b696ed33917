"""Shard-wise checkpoint format (SURVEY.md §5 sharding-aware layout).

Each process writes only its locally addressable shards as hyperslab
datasets with global offsets; loads reassemble per-device through
``jax.make_array_from_callback``. Verified here on the 8-device CPU
mesh: one dataset per device shard, replicated dedup, resharding on
load, and bit-exact SMC mid-ladder restore from per-shard data.
"""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.io import load_sharded_array, save_sharded_array
from aspire_tpu.parallel.mesh import (
    make_mesh,
    particle_sharding,
    replicated_sharding,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestShardedArrayIO:
    def test_numpy_roundtrip(self, tmp_path):
        x = np.arange(60.0).reshape(20, 3)
        with h5py.File(tmp_path / "a.h5", "w") as f:
            save_sharded_array(f, "arr", x)
        with h5py.File(tmp_path / "a.h5", "r") as f:
            assert len(f["arr"]) == 1  # single full-span shard
            out = load_sharded_array(f, "arr")
        np.testing.assert_array_equal(out, x)

    def test_one_dataset_per_device_shard(self, tmp_path, mesh):
        x = jnp.arange(64.0 * 3).reshape(64, 3)
        xs = jax.device_put(x, particle_sharding(mesh))
        with h5py.File(tmp_path / "b.h5", "w") as f:
            save_sharded_array(f, "arr", xs)
        with h5py.File(tmp_path / "b.h5", "r") as f:
            group = f["arr"]
            assert len(group) == 8
            assert all(ds.shape == (8, 3) for ds in group.values())
            out = load_sharded_array(f, "arr")
        np.testing.assert_array_equal(out, np.asarray(x))

    def test_replicated_array_dedups_to_one_shard(self, tmp_path, mesh):
        x = jax.device_put(jnp.ones((16, 2)), replicated_sharding(mesh))
        with h5py.File(tmp_path / "c.h5", "w") as f:
            save_sharded_array(f, "arr", x)
            assert len(f["arr"]) == 1

    def test_load_with_sharding_is_sharded_and_exact(self, tmp_path, mesh):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 5)), dtype=jnp.float32)
        xs = jax.device_put(x, particle_sharding(mesh))
        with h5py.File(tmp_path / "d.h5", "w") as f:
            save_sharded_array(f, "arr", xs)
        with h5py.File(tmp_path / "d.h5", "r") as f:
            out = load_sharded_array(
                f, "arr", sharding=particle_sharding(mesh)
            )
        assert len(out.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_reshard_on_load_across_mesh_sizes(self, tmp_path, mesh):
        """Written 8-way, read back onto a 4-device mesh: each device's
        callback stitches its region from two stored hyperslabs."""
        x = jnp.arange(32.0 * 2).reshape(32, 2)
        xs = jax.device_put(x, particle_sharding(mesh))
        with h5py.File(tmp_path / "e.h5", "w") as f:
            save_sharded_array(f, "arr", xs)
        small = make_mesh(4)
        with h5py.File(tmp_path / "e.h5", "r") as f:
            out = load_sharded_array(
                f, "arr", sharding=particle_sharding(small)
            )
        assert len(out.sharding.device_set) == 4
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_missing_region_raises(self, tmp_path, mesh):
        x = jax.device_put(
            jnp.ones((64, 2)), particle_sharding(mesh)
        )
        with h5py.File(tmp_path / "g.h5", "w") as f:
            save_sharded_array(f, "arr", x)
            del f["arr"][list(f["arr"].keys())[0]]
        with h5py.File(tmp_path / "g.h5", "r") as f:
            with pytest.raises(ValueError, match="unfilled"):
                load_sharded_array(f, "arr")


class TestMeshCheckpointRestore:
    @pytest.fixture(scope="class")
    def sampler_setup(self):
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem

        rng = np.random.default_rng(1)
        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(rng, 512), n_epochs=4, batch_size=256
        )
        return p, flow

    def _make_sampler(self, sampler_setup, mesh):
        from aspire_tpu.samplers import PCNSMC

        p, flow = sampler_setup
        return PCNSMC(
            log_likelihood=p.log_likelihood,
            log_prior=p.log_prior,
            dims=2,
            prior_flow=flow,
            parameters=p.parameters,
            rng=jax.random.key(9),
            mesh=mesh,
        )

    def test_mid_ladder_restore_bit_exact(
        self, sampler_setup, mesh, tmp_path
    ):
        """Save mid-ladder on the mesh, restore with a FRESH sampler:
        particle arrays must match bit-for-bit and come back sharded."""
        path = str(tmp_path / "mesh_ckpt.h5")
        sampler = self._make_sampler(sampler_setup, mesh)
        recorded = []
        sampler.sample(
            256,
            max_n_steps=2,
            sampler_kwargs={"n_steps": 3},
            checkpoint_callback=lambda s: recorded.append(s),
        )
        last = recorded[-1]
        sampler.save_checkpoint_to_hdf(last, path)

        with h5py.File(path, "r") as f:
            group = f["checkpoint/arrays/x"]
            assert len(group) == 8  # one dataset per device shard

        fresh = self._make_sampler(sampler_setup, mesh)
        # Loader-level: per-shard data reassembles bit-for-bit (before
        # the sampler's dtype policy is applied).
        state = type(fresh).load_checkpoint_from_file(
            path, sharding=fresh._particle_sharding()
        )
        for field in ("x", "log_likelihood", "log_prior", "log_q"):
            saved = np.asarray(getattr(last["samples"], field))
            loaded = np.asarray(getattr(state["samples"], field))
            assert loaded.dtype == saved.dtype
            np.testing.assert_array_equal(loaded, saved)
        assert len(state["samples"].x.sharding.device_set) == 8

        # API-level: full restore rebuilds iteration/beta/RNG exactly
        # and hands back mesh-sharded arrays.
        samples, beta, iteration = fresh.restore_smc_checkpoint(path)
        assert iteration == last["iteration"]
        assert beta == pytest.approx(last["meta"]["beta"])
        assert len(samples.x.sharding.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(fresh.key)), last["key"]
        )

    def test_mesh_resume_completes_ladder(
        self, sampler_setup, mesh, tmp_path
    ):
        path = str(tmp_path / "resume.h5")
        sampler = self._make_sampler(sampler_setup, mesh)
        sampler.sample(
            256,
            max_n_steps=2,
            sampler_kwargs={"n_steps": 3},
            checkpoint_every=1,
            checkpoint_file_path=path,
        )
        prefix = list(sampler.history.beta)

        fresh = self._make_sampler(sampler_setup, mesh)
        samples = fresh.sample(
            256, resume_from=path, sampler_kwargs={"n_steps": 3}
        )
        assert fresh.history.beta[: len(prefix)] == pytest.approx(prefix)
        assert fresh.history.beta[-1] == 1.0
        assert np.isfinite(float(samples.log_evidence))
