"""Sharding tests on the 8-device CPU mesh.

Validates the multi-chip design (SURVEY.md §2.2/§5): particle arrays
sharded P('data'), reductions and resampling correct under sharding, and
sharded results identical to unsharded ones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.ops.special import effective_sample_size, logsumexp
from aspire_tpu.parallel.mesh import (
    make_mesh,
    pad_to_shards,
    particle_sharding,
    shard_particles,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestMesh:
    def test_make_mesh(self, mesh):
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_shard_particles(self, mesh, rng):
        tree = {
            "x": jnp.asarray(rng.normal(size=(64, 3))),
            "scalar": jnp.asarray(1.0),
            "ragged": jnp.asarray(rng.normal(size=(13,))),
        }
        out = shard_particles(tree, mesh)
        assert len(out["x"].sharding.device_set) == 8
        # Ragged / scalar arrays are replicated.
        assert out["scalar"].sharding.is_fully_replicated
        assert out["ragged"].sharding.is_fully_replicated

    def test_pad_to_shards(self, mesh):
        x = jnp.ones((13, 2))
        padded, n = pad_to_shards(x, mesh)
        assert padded.shape[0] == 16
        assert n == 13


class TestShardedReductions:
    def test_logsumexp_matches_unsharded(self, mesh, rng):
        lw = jnp.asarray(rng.normal(size=800))
        lw_sharded = jax.device_put(lw, particle_sharding(mesh))
        expected = float(jax.jit(logsumexp)(lw))
        got = float(jax.jit(logsumexp)(lw_sharded))
        assert got == pytest.approx(expected, rel=1e-12)

    def test_ess_matches_unsharded(self, mesh, rng):
        lw = jnp.asarray(rng.normal(size=800))
        lw_sharded = jax.device_put(lw, particle_sharding(mesh))
        expected = float(jax.jit(effective_sample_size)(lw))
        got = float(jax.jit(effective_sample_size)(lw_sharded))
        assert got == pytest.approx(expected, rel=1e-12)


class TestShardedSMC:
    def test_sharded_run_matches_unsharded(self, mesh, rng):
        """Full SMC: sharded and unsharded runs give identical results
        (same PRNG stream, deterministic device math)."""
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import PCNSMC

        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(rng, 800),
            n_epochs=5,
            batch_size=256,
        )

        def run(mesh_arg):
            sampler = PCNSMC(
                log_likelihood=p.log_likelihood,
                log_prior=p.log_prior,
                dims=2,
                prior_flow=flow,
                parameters=p.parameters,
                rng=jax.random.key(5),
                mesh=mesh_arg,
            )
            samples = sampler.sample(
                256, sampler_kwargs={"n_steps": 4}, max_n_steps=3
            )
            return samples, sampler.history

        s_sharded, h_sharded = run(mesh)
        s_plain, h_plain = run(None)
        assert h_sharded.beta == pytest.approx(h_plain.beta, rel=1e-5)
        assert float(s_sharded.log_evidence) == pytest.approx(
            float(s_plain.log_evidence), abs=1e-3
        )

    def test_dp_flow_training(self, mesh, rng):
        """Flow fit with batch sharding over the mesh runs and learns."""
        from aspire_tpu.flows import Flow

        data = rng.normal(2.0, 0.5, size=(1024, 2))
        flow = Flow(dims=2, architecture="maf", key=1, n_layers=2)
        history = flow.fit(
            data,
            n_epochs=8,
            batch_size=256,
            sharding=particle_sharding(mesh),
        )
        assert history.training_loss[-1] < history.training_loss[0]


def test_sample_posterior_routes_mesh_to_sampler(mesh):
    """`mesh=` through the facade must reach the sampler ctor (it was
    silently dropped when subclasses forward *args/**kwargs)."""
    import numpy as np

    from aspire_tpu import Aspire, Samples
    from aspire_tpu.models import GaussianProblem

    p = GaussianProblem(dims=2)
    rng = np.random.default_rng(0)
    asp = Aspire(
        log_likelihood=p.log_likelihood,
        log_prior=p.log_prior,
        dims=2,
        prior_bounds=p.prior_bounds,
        seed=0,
    )
    asp.fit(Samples(rng.normal(size=(256, 2))), n_epochs=2)
    samples = asp.sample_posterior(
        sampler="smc",
        n_samples=64,
        mesh=mesh,
        sampler_kwargs=dict(n_steps=2),
    )
    assert asp.sampler.mesh is mesh
    assert len(samples) == 64
