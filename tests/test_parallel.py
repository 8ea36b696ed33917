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

    def test_windowed_tau_subset_on_mesh(self, mesh, rng):
        """windowed_tau with tau_walkers < n on a sharded population:
        the in-scan subset gather crosses shards; tau must match the
        unsharded run (same PRNG stream, same chain values)."""
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import PCNSMC

        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(rng, 800), n_epochs=5, batch_size=256
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
            sampler.sample(
                256,
                sampler_kwargs={
                    "n_steps": 4,
                    "windowed_tau": True,
                    "tau_walkers": 32,
                },
                max_n_steps=3,
            )
            return sampler.history.mcmc_autocorr

        taus_sharded = run(mesh)
        taus_plain = run(None)
        assert len(taus_sharded) >= 1
        np.testing.assert_allclose(
            taus_sharded, taus_plain, rtol=1e-4
        )

    def test_pt_walker_sharding_matches_unsharded(self, mesh, rng):
        """Parallel tempering with the walker axis sharded over the
        mesh: identical PRNG stream, so the evidence must match the
        unsharded run."""
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import ParallelTemperedSampler

        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(rng, 800), n_epochs=5, batch_size=256
        )

        def run(mesh_arg):
            sampler = ParallelTemperedSampler(
                log_likelihood=p.log_likelihood,
                log_prior=p.log_prior,
                dims=2,
                prior_flow=flow,
                parameters=p.parameters,
                rng=jax.random.key(9),
                mesh=mesh_arg,
            )
            post = sampler.sample(
                64, n_steps=30, n_temperatures=5, swap_every=5
            )
            return post.log_evidence_stepping_stone()

        lz_sharded, err_sharded = run(mesh)
        lz_plain, err_plain = run(None)
        assert lz_sharded == pytest.approx(lz_plain, abs=1e-4)
        assert err_sharded == pytest.approx(err_plain, abs=1e-5)

    @pytest.mark.parametrize("name", ["minipcn", "emcee"])
    def test_standalone_mcmc_walker_sharding(self, mesh, rng, name):
        """Standalone MCMC chains shard their walker axis over the
        mesh; same PRNG stream, so the chain matches the unsharded
        run."""
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import EnsembleSampler, PCNSampler

        cls = {"minipcn": PCNSampler, "emcee": EnsembleSampler}[name]
        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(rng, 800), n_epochs=5, batch_size=256
        )

        def run(mesh_arg):
            sampler = cls(
                log_likelihood=p.log_likelihood,
                log_prior=p.log_prior,
                dims=2,
                prior_flow=flow,
                parameters=p.parameters,
                rng=jax.random.key(21),
                mesh=mesh_arg,
            )
            post = sampler.sample(64, n_steps=20)
            return np.asarray(post.x)

        np.testing.assert_allclose(
            run(mesh), run(None), rtol=1e-5, atol=1e-6
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


class TestRingResampling:
    """Hand-rolled shard_map resampling (SURVEY.md §5): weight
    all-gather + ppermute ring, bit-identical to the GSPMD path."""

    def _population(self, mesh, rng, n=256, d=3):
        import jax

        from aspire_tpu.samples import SMCSamples

        sh = particle_sharding(mesh)
        s = SMCSamples(
            x=jax.device_put(
                jnp.asarray(rng.normal(size=(n, d)), jnp.float32), sh
            ),
            beta=0.2,
        )
        s.log_likelihood = jax.device_put(
            jnp.asarray(rng.normal(size=n), jnp.float32), sh
        )
        s.log_prior = jax.device_put(
            jnp.asarray(rng.normal(size=n), jnp.float32), sh
        )
        s.log_q = jax.device_put(
            jnp.asarray(rng.normal(size=n), jnp.float32), sh
        )
        return s

    def test_ring_matches_gspmd_bit_exact(self, mesh, rng):
        import jax

        pop = self._population(mesh, rng)
        key = jax.random.key(11)
        auto = pop.resample(0.6, key=key, impl="auto")
        ring = pop.resample(0.6, key=key, impl="ring")
        for field in ("x", "log_likelihood", "log_prior", "log_q"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ring, field)),
                np.asarray(getattr(auto, field)),
            )
        # Output keeps the particle sharding (no replication fallback).
        assert len(ring.x.sharding.device_set) == 8
        assert ring.x.sharding.spec == particle_sharding(mesh).spec

    def test_ring_collective_schedule(self, mesh, rng):
        """Pin the collective recipe: exactly one all-gather (the O(n)
        weight vector) and a ppermute ring; the (n, d) particle matrix
        is never globally gathered."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        from aspire_tpu.ops import resampling as R

        n, cols = 256, 6
        ring = [(i, (i + 1) % 8) for i in range(8)]
        resampler = R.get_resampler("systematic")

        def local_fn(key, lw_local, block):
            chunk = block.shape[0]
            lw_global = jax.lax.all_gather(lw_local, "data", tiled=True)
            idx = resampler(key, lw_global, lw_global.shape[0])
            me = jax.lax.axis_index("data")
            idx_mine = jax.lax.dynamic_slice_in_dim(
                idx, me * chunk, chunk
            )

            def step(r, carry):
                held, out = carry
                src = (me - r) % 8
                rows = idx_mine - src * chunk
                want = (rows >= 0) & (rows < chunk)
                out = jnp.where(
                    want[:, None], held[jnp.clip(rows, 0, chunk - 1)], out
                )
                return jax.lax.ppermute(held, "data", perm=ring), out

            return jax.lax.fori_loop(
                0, 8, step, (block, jnp.zeros_like(block))
            )[1]

        fn = jax.jit(
            shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
        )
        import jax.numpy as jnp_  # noqa: F401

        key = jax.random.key(0)
        lw = jnp.zeros(n, jnp.float32)
        data = jnp.zeros((n, cols), jnp.float32)
        text = fn.lower(key, lw, data).as_text()
        assert "collective_permute" in text
        # Every all_gather in the program is the 1-D weight vector —
        # the (n, cols) particle matrix is never globally gathered.
        gather_lines = [
            line for line in text.splitlines() if "all_gather" in line
        ]
        assert 1 <= len(gather_lines) <= 2
        assert all(f"x{cols}x" not in line for line in gather_lines)

    def test_full_smc_run_ring_matches_auto(self, mesh, rng):
        """End-to-end sharded SMC with resampling_impl='ring' follows
        the identical trajectory as the GSPMD path (same keys, ring
        resampling is bit-identical, so histories must agree)."""
        import jax

        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import PCNSMC

        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(rng, 512), n_epochs=4, batch_size=256
        )

        def run(impl):
            sampler = PCNSMC(
                log_likelihood=p.log_likelihood,
                log_prior=p.log_prior,
                dims=2,
                prior_flow=flow,
                parameters=p.parameters,
                rng=jax.random.key(3),
                mesh=mesh,
                resampling_impl=impl,
            )
            samples = sampler.sample(
                256, sampler_kwargs={"n_steps": 3}, max_n_steps=3
            )
            return samples, sampler.history

        s_auto, h_auto = run("auto")
        s_ring, h_ring = run("ring")
        assert h_ring.beta == pytest.approx(h_auto.beta, rel=1e-6)
        assert float(s_ring.log_evidence) == pytest.approx(
            float(s_auto.log_evidence), abs=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_ring.x), np.asarray(s_auto.x), rtol=2e-5,
            atol=1e-6,
        )


class TestWasteFreeComposition:
    """Round 3: waste-free SMC composes with the particle mesh — the
    M = n/k ancestor population is resampled sharded and the pooled
    k-step chains re-tile ancestor-major without cross-device moves."""

    def _run(self, mesh_arg, rng, impl="auto", **extra):
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import PCNSMC

        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(np.random.default_rng(7), 800),
            n_epochs=5,
            batch_size=256,
        )
        sampler = PCNSMC(
            log_likelihood=p.log_likelihood,
            log_prior=p.log_prior,
            dims=2,
            prior_flow=flow,
            parameters=p.parameters,
            rng=jax.random.key(5),
            mesh=mesh_arg,
            resampling_impl=impl,
        )
        samples = sampler.sample(
            256,
            sampler_kwargs={"n_steps": 4, "waste_free": True},
            **extra,
        )
        return samples, sampler

    def test_sharded_matches_unsharded(self, mesh, rng):
        s_sharded, sm_sharded = self._run(mesh, rng)
        s_plain, sm_plain = self._run(None, rng)
        assert sm_sharded.history.beta == pytest.approx(
            sm_plain.history.beta, rel=1e-5
        )
        assert float(s_sharded.log_evidence) == pytest.approx(
            float(s_plain.log_evidence), abs=1e-3
        )
        # Eval savings preserved under sharding: M = 64 ancestors at 4
        # steps + refreshes, nowhere near the standard n-per-step cost.
        assert (
            sm_sharded.n_likelihood_evaluations
            == sm_plain.n_likelihood_evaluations
        )

    @pytest.mark.parametrize("impl", ["ring", "alltoall"])
    @pytest.mark.parametrize("ladder", [True, False])
    def test_collectives_compose_with_waste_free(
        self, mesh, rng, impl, ladder
    ):
        """The hand-rolled collectives emit the M = n/k ancestor
        population directly (n_out < n), so waste-free runs with
        resampling_impl='ring'/'alltoall' are bit-identical to 'auto'
        on both the compiled device ladder and the host ladder."""
        s_coll, sm_coll = self._run(
            mesh, rng, impl=impl, device_ladder=ladder
        )
        s_auto, sm_auto = self._run(
            mesh, rng, impl="auto", device_ladder=ladder
        )
        assert sm_coll.history.beta == pytest.approx(
            sm_auto.history.beta, rel=1e-9
        )
        assert float(s_coll.log_evidence) == pytest.approx(
            float(s_auto.log_evidence), abs=1e-9
        )
        assert (
            sm_coll.n_likelihood_evaluations
            == sm_auto.n_likelihood_evaluations
        )

    def test_mesh_divisibility_is_validated(self, mesh, rng):
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import PCNSMC

        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(np.random.default_rng(7), 400),
            n_epochs=2,
            batch_size=256,
        )
        sampler = PCNSMC(
            log_likelihood=p.log_likelihood,
            log_prior=p.log_prior,
            dims=2,
            prior_flow=flow,
            parameters=p.parameters,
            rng=jax.random.key(5),
            mesh=mesh,
        )
        # n/k = 256/64 = 4 ancestors cannot shard over 8 devices.
        with pytest.raises(ValueError, match="divisible by the mesh"):
            sampler.sample(
                256, sampler_kwargs={"n_steps": 64, "waste_free": True}
            )


class TestRingInDeviceLadder:
    """Round 3: the compiled device ladder honors resampling_impl."""

    def _sampler(self, mesh_arg, impl):
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import PCNSMC

        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(np.random.default_rng(3), 800),
            n_epochs=5,
            batch_size=256,
        )
        return PCNSMC(
            log_likelihood=p.log_likelihood,
            log_prior=p.log_prior,
            dims=2,
            prior_flow=flow,
            parameters=p.parameters,
            rng=jax.random.key(5),
            mesh=mesh_arg,
            resampling_impl=impl,
        )

    def test_ladder_routes_through_ring(self, mesh, monkeypatch):
        """With impl='ring', the compiled ladder's resample traces
        through ring_resample_matrix; with 'auto' it never does. The
        run trajectories are identical (bit-identical resampling)."""
        from aspire_tpu.ops import resampling as R

        calls = {"n": 0}
        real = R.ring_resample_matrix

        def counting(*args, **kwargs):
            calls["n"] += 1
            return real(*args, **kwargs)

        monkeypatch.setattr(R, "ring_resample_matrix", counting)

        ring_sampler = self._sampler(mesh, "ring")
        s_ring = ring_sampler.sample(
            256, sampler_kwargs={"n_steps": 4}, device_ladder=True
        )
        assert calls["n"] > 0, "ladder did not use the ring collective"

        ring_calls = calls["n"]
        auto_sampler = self._sampler(mesh, "auto")
        s_auto = auto_sampler.sample(
            256, sampler_kwargs={"n_steps": 4}, device_ladder=True
        )
        assert calls["n"] == ring_calls, "auto ladder used the ring"

        assert ring_sampler.history.beta == pytest.approx(
            auto_sampler.history.beta, rel=1e-6
        )
        assert float(s_ring.log_evidence) == pytest.approx(
            float(s_auto.log_evidence), abs=1e-6
        )

    def test_final_resample_honors_impl_when_it_tiles(
        self, mesh, monkeypatch
    ):
        """The n_final_samples draw routes through the collective when
        the requested size tiles the mesh, and silently falls back to
        the GSPMD gather when it does not (e.g. 500 on 8 shards)."""
        from aspire_tpu.ops import resampling as R

        calls = {"n": 0}
        real = R.ring_resample_matrix

        def counting(*args, **kwargs):
            calls["n"] += 1
            return real(*args, **kwargs)

        monkeypatch.setattr(R, "ring_resample_matrix", counting)

        sampler = self._sampler(mesh, "ring")
        out = sampler.sample(
            256,
            sampler_kwargs={"n_steps": 4},
            n_final_samples=128,
            device_ladder=True,
        )
        assert len(out) == 128
        in_loop = calls["n"]
        assert in_loop > 0

        sampler2 = self._sampler(mesh, "ring")
        before = calls["n"]
        out2 = sampler2.sample(
            256,
            sampler_kwargs={"n_steps": 4},
            n_final_samples=100,  # does not tile 8 shards
            device_ladder=True,
        )
        assert len(out2) == 100
        # The in-loop resamples still used the ring; the final draw
        # did not add a collective call beyond them.
        ladder_calls = calls["n"] - before
        assert ladder_calls == in_loop - 1

    def test_ring_without_mesh_raises(self):
        sampler = self._sampler(None, "ring")
        with pytest.raises(ValueError, match="mesh-sharded"):
            sampler.sample(128, sampler_kwargs={"n_steps": 2})

    def test_collective_counts_distinguish_schedules(self, mesh):
        """The ring schedule moves particles via collective-permute
        steps; the GSPMD gather schedule does not contain a ppermute
        ring of that depth. Counting collective-permutes in the lowered
        programs separates the two."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from aspire_tpu.ops import resampling as R

        n, d = 256, 3
        sh = NamedSharding(mesh, P("data"))
        key = jax.random.key(0)
        lw = jax.device_put(jnp.zeros(n, jnp.float32), sh)
        x = jax.device_put(jnp.zeros((n, d), jnp.float32), sh)

        resampler = R.get_resampler("systematic")

        @jax.jit
        def gspmd(key, lw, x):
            return x[resampler(key, lw, n)]

        auto_text = gspmd.lower(key, lw, x).compile().as_text()
        ring_fn = R._build_ring_resampler(mesh, "data", "systematic")
        ring_text = ring_fn.lower(key, lw, x).compile().as_text()

        def global_matrix_collectives(text):
            # all-reduce / all-gather ops materializing the FULL
            # (n, d) matrix on every device — the signature of the
            # GSPMD gather lowering (masked select + all-reduce).
            return sum(
                1
                for line in text.splitlines()
                if ("all-reduce" in line or "all-gather" in line)
                and f"f32[{n},{d}]" in line
            )

        def block_permutes(text):
            # collective-permutes of per-shard (n/8, d) blocks — the
            # ring schedule's only matrix movement.
            return sum(
                1
                for line in text.splitlines()
                if "collective-permute" in line
                and f"f32[{n // 8},{d}]" in line
            )

        assert global_matrix_collectives(auto_text) > 0
        assert global_matrix_collectives(ring_text) == 0
        assert block_permutes(ring_text) > 0
        assert block_permutes(auto_text) == 0


class TestAllToAllResampling:
    """Pod-scale bucketed all_to_all redistribution (SURVEY.md §5):
    only rows that change shards move; overflow falls back to the ring
    in-program."""

    def _inputs(self, mesh, rng, n=512, d=3):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("data"))
        key = jax.random.key(7)
        lw = jax.device_put(
            jnp.asarray(rng.normal(size=n), jnp.float32), sh
        )
        x = jax.device_put(
            jnp.asarray(rng.normal(size=(n, d)), jnp.float32), sh
        )
        return key, lw, x

    def test_bit_exact_vs_gspmd_and_ring(self, mesh, rng):
        from aspire_tpu.ops import resampling as R

        key, lw, x = self._inputs(mesh, rng)
        n = lw.shape[0]
        ref = x[R.get_resampler("systematic")(key, lw, n)]
        ring = R.ring_resample_matrix(key, lw, x, mesh)
        a2a = R.alltoall_resample_matrix(key, lw, x, mesh)
        np.testing.assert_array_equal(np.asarray(a2a), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(a2a), np.asarray(ring))
        assert a2a.sharding.spec == particle_sharding(mesh).spec

    def test_n_out_subpopulation_exact(self, mesh, rng):
        """n_out < n (waste-free ancestor selection): both collectives
        emit an (n_out, cols) mesh-sharded matrix bit-identical to the
        replicated gather, including the a2a overflow fallback."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from aspire_tpu.ops import resampling as R

        key, lw, x = self._inputs(mesh, rng)
        n, n_out = lw.shape[0], 64
        ref = x[R.get_resampler("systematic")(key, lw, n_out)]
        ring = R.ring_resample_matrix(key, lw, x, mesh, n_out=n_out)
        a2a = R.alltoall_resample_matrix(key, lw, x, mesh, n_out=n_out)
        assert ring.shape == (n_out, x.shape[1])
        np.testing.assert_array_equal(np.asarray(ring), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(a2a), np.asarray(ref))
        assert ring.sharding.spec == particle_sharding(mesh).spec
        assert a2a.sharding.spec == particle_sharding(mesh).spec
        # Degenerate weights blow the bucket caps: the in-program ring
        # fallback must honor n_out too.
        sh = NamedSharding(mesh, P("data"))
        lw_deg = jax.device_put(
            jnp.where(jnp.arange(n) == 3, 50.0, -50.0).astype(
                jnp.float32
            ),
            sh,
        )
        ref_deg = x[R.get_resampler("systematic")(key, lw_deg, n_out)]
        a2a_deg = R.alltoall_resample_matrix(
            key, lw_deg, x, mesh, n_out=n_out
        )
        np.testing.assert_array_equal(
            np.asarray(a2a_deg), np.asarray(ref_deg)
        )
        # Non-tiling n_out is rejected up front.
        with pytest.raises(ValueError, match="divisible by the mesh"):
            R.ring_resample_matrix(key, lw, x, mesh, n_out=12)
        with pytest.raises(ValueError, match="divisible by the mesh"):
            R.alltoall_resample_matrix(key, lw, x, mesh, n_out=12)

    def test_overflow_falls_back_to_ring(self, mesh, rng):
        """All weight on one particle: every (src, dst) bucket bound is
        blown, the in-program ring fallback must still be exact."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from aspire_tpu.ops import resampling as R

        key, _, x = self._inputs(mesh, rng)
        n = x.shape[0]
        sh = NamedSharding(mesh, P("data"))
        lw = jax.device_put(
            jnp.where(jnp.arange(n) == 3, 50.0, -50.0).astype(
                jnp.float32
            ),
            sh,
        )
        ref = x[R.get_resampler("systematic")(key, lw, n)]
        a2a = R.alltoall_resample_matrix(key, lw, x, mesh)
        np.testing.assert_array_equal(np.asarray(a2a), np.asarray(ref))

    def test_schedule_contains_alltoall_not_full_ring(self, mesh, rng):
        """Collective-count assertion: the a2a program contains an
        all-to-all exchange of the capped buckets; the ring program
        contains none (it only ppermutes full blocks)."""
        from aspire_tpu.ops import resampling as R

        key, lw, x = self._inputs(mesh, rng)
        a2a_fn = R._build_alltoall_resampler(mesh, "data", "systematic", 32)
        ring_fn = R._build_ring_resampler(mesh, "data", "systematic")
        a2a_text = a2a_fn.lower(key, lw, x).compile().as_text()
        ring_text = ring_fn.lower(key, lw, x).compile().as_text()
        assert "all-to-all" in a2a_text
        assert "all-to-all" not in ring_text

    def test_full_smc_run_matches_auto(self, mesh, rng):
        from aspire_tpu.flows import Flow
        from aspire_tpu.models import GaussianProblem
        from aspire_tpu.samplers import PCNSMC

        p = GaussianProblem(dims=2)
        flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
        flow.fit(
            p.draw_initial_samples(np.random.default_rng(3), 800),
            n_epochs=5,
            batch_size=256,
        )

        def run(impl):
            sampler = PCNSMC(
                log_likelihood=p.log_likelihood,
                log_prior=p.log_prior,
                dims=2,
                prior_flow=flow,
                parameters=p.parameters,
                rng=jax.random.key(5),
                mesh=mesh,
                resampling_impl=impl,
            )
            out = sampler.sample(256, sampler_kwargs={"n_steps": 4})
            return out, sampler.history

        s_a2a, h_a2a = run("alltoall")
        s_auto, h_auto = run("auto")
        assert h_a2a.beta == pytest.approx(h_auto.beta, rel=1e-6)
        assert float(s_a2a.log_evidence) == pytest.approx(
            float(s_auto.log_evidence), abs=1e-6
        )
