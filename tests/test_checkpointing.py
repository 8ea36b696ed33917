"""Checkpoint/resume integration tests: all three resume modes.

Models reference tests/integration_tests/test_checkpointing.py:
1. ``Aspire.resume_from_file`` (:4-47)
2. manual primed call via a fresh sampler with ``resume_from`` (:49-88)
3. same-instance ``auto_checkpoint(resume=True)`` (:91-126) + fit-skip
   proven by stubbing ``flow.fit`` to raise (:176-219).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu import Aspire, Samples

DIMS = 2
TRUE_LOG_Z = -DIMS * math.log(20)


def log_likelihood(samples):
    return jnp.sum(
        -0.5 * (samples.x - 1.0) ** 2 - 0.5 * jnp.log(2 * jnp.pi), axis=-1
    )


def log_prior(samples):
    x = samples.x
    inside = jnp.all((x >= -10) & (x <= 10), axis=-1)
    return jnp.where(inside, -DIMS * jnp.log(20.0), -jnp.inf)


def make_aspire(**kwargs):
    return Aspire(
        log_likelihood=log_likelihood,
        log_prior=log_prior,
        dims=DIMS,
        parameters=[f"x_{i}" for i in range(DIMS)],
        prior_bounds={f"x_{i}": [-10, 10] for i in range(DIMS)},
        seed=0,
        **kwargs,
    )


@pytest.fixture(scope="module")
def initial_samples():
    rng = np.random.default_rng(3)
    return Samples(rng.normal(1.0, 1.1, size=(1000, DIMS)))


@pytest.fixture
def checkpoint_file(tmp_path, initial_samples):
    """Run a complete checkpointed SMC and return the file path."""
    path = tmp_path / "ckpt.h5"
    asp = make_aspire()
    with asp.auto_checkpoint(path, every=1):
        asp.fit(initial_samples, n_epochs=8, batch_size=256)
        asp.sample_posterior(
            n_samples=200,
            sampler="smc",
            n_final_samples=400,
            sampler_kwargs={"n_steps": 5},
        )
    return path


def test_resume_from_file(checkpoint_file):
    asp = Aspire.resume_from_file(
        str(checkpoint_file),
        log_likelihood=log_likelihood,
        log_prior=log_prior,
    )
    assert asp.flow is not None
    samples = asp.sample_posterior(n_final_samples=400)
    assert len(samples) == 400
    assert float(samples.log_evidence) == pytest.approx(TRUE_LOG_Z, abs=0.7)


def test_manual_resume(checkpoint_file, initial_samples):
    """Fresh sampler resuming from checkpoint bytes completes."""
    asp = make_aspire()
    asp.fit(initial_samples, n_epochs=5, batch_size=256)
    sampler = asp.init_sampler("smc")
    samples = sampler.sample(
        200, resume_from=str(checkpoint_file), n_final_samples=300
    )
    assert len(samples) == 300


def test_auto_checkpoint_resume_same_instance(
    checkpoint_file, initial_samples
):
    asp = make_aspire()
    with asp.auto_checkpoint(checkpoint_file, every=1, resume=True):
        history = asp.fit(initial_samples, n_epochs=8)
        # fit must be skipped: checkpointed flow was loaded.
        assert history.training_loss == []
        samples = asp.sample_posterior(n_final_samples=400)
    assert len(samples) == 400
    # Context exit restores the outer (empty) policy/resume/fit state.
    assert asp._checkpoints is None
    assert asp._resume is None
    assert not asp._skip_fit


def test_fit_skip_proven_by_raising_stub(checkpoint_file, initial_samples):
    """Prove fit() short-circuits: stub flow.fit to raise."""
    asp = make_aspire()
    with asp.auto_checkpoint(checkpoint_file, every=1, resume=True):
        def boom(*a, **k):
            raise AssertionError("flow.fit should not be called")

        asp.flow.fit = boom
        history = asp.fit(initial_samples, n_epochs=8)
        assert history.training_loss == []


def test_mid_run_resume(tmp_path, initial_samples):
    """Interrupt SMC mid-ladder; resume completes with the same history."""
    path = tmp_path / "mid.h5"
    asp = make_aspire()
    asp.fit(initial_samples, n_epochs=8, batch_size=256)

    sampler = asp.init_sampler("smc")
    # Run only 2 temperature iterations by capping max_n_steps.
    sampler.sample(
        200,
        max_n_steps=2,
        sampler_kwargs={"n_steps": 5},
        checkpoint_every=1,
        checkpoint_file_path=str(path),
    )
    n_iter_first = len(sampler.history.beta)
    assert n_iter_first <= 2

    # Resume with a fresh sampler and finish.
    sampler2 = asp.init_sampler("smc")
    samples = sampler2.sample(
        200, resume_from=str(path), sampler_kwargs={"n_steps": 5}
    )
    assert sampler2.history.beta[:n_iter_first] == pytest.approx(
        sampler.history.beta
    )
    assert sampler2.history.beta[-1] == 1.0
    assert float(samples.log_evidence) == pytest.approx(TRUE_LOG_Z, abs=0.7)


def test_completed_checkpoint_skips_loop(checkpoint_file, initial_samples):
    """Resume from a completed run jumps straight to final mutation."""
    asp = make_aspire()
    asp.fit(initial_samples, n_epochs=5, batch_size=256)
    sampler = asp.init_sampler("smc")
    samples = sampler.sample(
        200, resume_from=str(checkpoint_file), n_final_samples=250
    )
    assert len(samples) == 250


def test_resume_with_flow_preconditioning(tmp_path, initial_samples):
    """A checkpoint taken while preconditioning='flow' is active must
    carry the fitted transport map: the resumed sampler continues with
    the SAME map instead of silently running unpreconditioned."""
    import numpy as np

    path = tmp_path / "flow_precond.h5"
    asp = make_aspire()
    asp.fit(initial_samples, n_epochs=6, batch_size=256)
    sampler = asp.init_sampler(
        "smc",
        preconditioning="flow",
        preconditioning_kwargs={"fit_kwargs": {"n_epochs": 3}},
    )
    sampler.sample(
        128,
        max_n_steps=2,
        sampler_kwargs={"n_steps": 4},
        checkpoint_every=1,
        checkpoint_file_path=str(path),
    )
    fitted = sampler.preconditioning_transform
    assert fitted._params is not None

    fresh = asp.init_sampler(
        "smc",
        preconditioning="flow",
        preconditioning_kwargs={"fit_kwargs": {"n_epochs": 3}},
    )
    assert fresh.preconditioning_transform._params is None
    samples = fresh.sample(
        128, resume_from=str(path), sampler_kwargs={"n_steps": 4}
    )
    restored = fresh.preconditioning_transform
    # The transport map came back fitted and numerically identical.
    assert restored._params is not None
    for a, b in zip(
        jax_leaves(fitted._params), jax_leaves(restored._params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        )
    assert fresh.history.beta[-1] == 1.0
    assert np.isfinite(float(samples.log_evidence))


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_flow_preconditioning_hdf5_roundtrip(tmp_path, initial_samples):
    """Transform-level save/load (class dispatch) restores the map."""
    import h5py
    import jax
    import numpy as np

    from aspire_tpu.transforms import (
        BaseTransform,
        FlowPreconditioningTransform,
    )

    t = FlowPreconditioningTransform(
        parameters=["x_0", "x_1"],
        flow_backend="maf",
        fit_kwargs={"n_epochs": 3},
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 2))
    z = t.fit(x)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        t.save(f, "precond")
    with h5py.File(tmp_path / "t.h5", "r") as f:
        t2 = BaseTransform.load(f, "precond")
    z2, logj2 = t2.forward(x)
    z1, logj1 = t.forward(x)
    np.testing.assert_allclose(
        np.asarray(z2), np.asarray(z1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(logj2), np.asarray(logj1), rtol=1e-5, atol=1e-6
    )


def test_resume_from_file_resumes_recorded_sampler(checkpoint_file):
    """The run file records the sampler type after every run, so a
    resumed orchestrator continues SMC — it must not silently fall
    back to the default importance sampler (a round-2 latent bug)."""
    asp = Aspire.resume_from_file(
        str(checkpoint_file),
        log_likelihood=log_likelihood,
        log_prior=log_prior,
    )
    assert asp._resume is not None
    assert asp._resume.sampler_type == "smc"
    samples = asp.sample_posterior(n_final_samples=250)
    from aspire_tpu.samplers.smc import SMCSampler

    assert isinstance(asp.sampler, SMCSampler)
    # A completed checkpoint jumps straight to the final mutation.
    assert len(samples) == 250


def test_mcmc_chain_checkpoint(tmp_path, initial_samples):
    """Standalone MCMC samplers persist the finished x-space chain when
    a checkpoint path is routed in (reference mcmc.py:169-192 parity) —
    previously the facade warned 'does not support checkpointing'."""
    import h5py

    asp = make_aspire()
    asp.fit(initial_samples, n_epochs=8, batch_size=256)
    path = tmp_path / "mcmc.h5"
    asp.sample_posterior(
        n_samples=64, sampler="minipcn", n_steps=20,
        checkpoint_path=str(path),
    )
    with h5py.File(path, "r") as f:
        ds = f["checkpoint/mcmc_chain"]
        assert ds.shape == (20, 64, DIMS)
        assert int(ds.attrs["iteration"]) == 20
    chain, it = asp.sampler.load_chain_checkpoint(str(path))
    assert chain.shape == (20, 64, DIMS) and it == 20

    # PT: the (T, rounds, n, d) tempered chain + its ladder.
    pt_path = tmp_path / "pt.h5"
    asp.sample_posterior(
        n_samples=16, sampler="ptmcmc", n_steps=12,
        n_temperatures=4, swap_every=4,
        checkpoint_path=str(pt_path),
    )
    with h5py.File(pt_path, "r") as f:
        ds = f["checkpoint/mcmc_chain"]
        assert ds.shape == (4, 3, 16, DIMS)
        betas = np.asarray(ds.attrs["betas"])
        assert betas.shape == (4,) and betas[0] == 1.0

    # checkpoint_every <= 0 disables the save.
    off_path = tmp_path / "off.h5"
    asp.sample_posterior(
        n_samples=32, sampler="emcee", n_steps=10,
        checkpoint_path=str(off_path), checkpoint_every=0,
    )
    with h5py.File(off_path, "r") as f:
        assert "checkpoint/mcmc_chain" not in f


def test_pt_midrun_checkpoint_resume(tmp_path, initial_samples):
    """PT mid-run state checkpoints: a run killed between chunks and
    resumed from the file reproduces the uninterrupted run exactly
    (the full round-key array is saved, so the remaining PRNG stream
    replays bit-identically)."""
    import h5py

    from aspire_tpu.samplers.mcmc import ParallelTemperedSampler

    asp = make_aspire()
    asp.fit(initial_samples, n_epochs=8, batch_size=256)

    common = dict(
        n_steps=24, n_temperatures=4, swap_every=4,
    )
    # Uninterrupted reference run (same facade-seeded sampler state).
    ref = asp.init_sampler("ptmcmc", preconditioning="none").sample(
        16, **common
    )

    # Chunked run: checkpoint every 2 rounds (6 rounds total).
    path = tmp_path / "pt_state.h5"
    s2 = asp.init_sampler("ptmcmc", preconditioning="none")
    full = s2.sample(
        16, **common,
        checkpoint_file_path=str(path), state_checkpoint_every=2,
    )
    np.testing.assert_array_equal(
        np.asarray(full.x), np.asarray(ref.x)
    )
    with h5py.File(path, "r") as f:
        assert int(f["checkpoint/pt_state"].attrs["rounds_done"]) == 6

    # Genuine interruption: kill the run right after the round-2 state
    # hits disk, then resume from that file — the result must be
    # bit-identical to the uninterrupted run.
    crash_path = tmp_path / "pt_crash.h5"
    s3 = asp.init_sampler("ptmcmc", preconditioning="none")
    real_save = s3.save_pt_state

    class _Killed(RuntimeError):
        pass

    def crashing_save(file_path, **kw):
        real_save(file_path, **kw)
        if kw["rounds_done"] == 2:
            raise _Killed()

    s3.save_pt_state = crashing_save
    with pytest.raises(_Killed):
        s3.sample(
            16, **common,
            checkpoint_file_path=str(crash_path),
            state_checkpoint_every=2,
        )
    s3.save_pt_state = real_save
    with h5py.File(crash_path, "r") as f:
        assert int(f["checkpoint/pt_state"].attrs["rounds_done"]) == 2
    resumed = s3.sample(16, **common, resume_from=str(crash_path))
    np.testing.assert_array_equal(
        np.asarray(resumed.x), np.asarray(ref.x)
    )

    # Resume from the COMPLETED state: no rounds re-run, identical
    # samples out.
    s4 = asp.init_sampler("ptmcmc", preconditioning="none")
    full2 = s4.sample(
        16, **common,
        checkpoint_file_path=str(path), state_checkpoint_every=2,
    )
    evals_before = s4.n_likelihood_evaluations
    again = s4.sample(16, **common, resume_from=str(path))
    np.testing.assert_array_equal(
        np.asarray(again.x), np.asarray(full2.x)
    )
    assert s4.n_likelihood_evaluations == evals_before

    # Config mismatch raises.
    with pytest.raises(ValueError, match="disagrees"):
        s4.sample(16, n_steps=32, n_temperatures=4, swap_every=4,
                  resume_from=str(path))


def test_pt_facade_resume_from_file(tmp_path, initial_samples):
    """Mode-1 resume works for PT runs: resume_from_file + a bare
    sample_posterior() continues (here: rebuilds, the run completed)
    the checkpointed PT run with its recorded configuration."""
    path = tmp_path / "pt_run.h5"
    asp = make_aspire()
    asp.fit(initial_samples, n_epochs=8, batch_size=256)
    post = asp.sample_posterior(
        sampler="ptmcmc",
        n_samples=16,
        n_steps=24,
        n_temperatures=4,
        swap_every=4,
        preconditioning="none",
        state_checkpoint_every=2,
        checkpoint_path=str(path),
    )

    asp2 = Aspire.resume_from_file(
        str(path),
        log_likelihood=log_likelihood,
        log_prior=log_prior,
    )
    assert asp2._resume is not None
    assert asp2._resume.sampler_type == "ptmcmc"
    # No arguments: sampler type, n_samples, and the recorded PT
    # kwargs all come from the file (the facade's default
    # preconditioning is discarded with a warning on resume).
    post2 = asp2.sample_posterior()
    np.testing.assert_array_equal(
        np.asarray(post2.x), np.asarray(post.x)
    )
    # The completed-state resume re-ran no chain rounds.
    assert asp2.sampler.n_likelihood_evaluations == 0


def test_pt_midrun_checkpoint_host_target(tmp_path, initial_samples):
    """The host (non-jittable) PT path shares the state-checkpoint and
    resume machinery: kill after the round-2 save, resume, and match
    the uninterrupted host run exactly."""
    import h5py

    def host_ll(samples):
        x = np.asarray(samples.x)
        out = np.sum(
            -0.5 * (x - 1.0) ** 2 - 0.5 * np.log(2 * np.pi), axis=-1
        )
        if out.shape[0] == 0:  # data-dependent branch: not traceable
            raise RuntimeError
        return out

    asp = Aspire(
        log_likelihood=host_ll,
        log_prior=log_prior,
        dims=DIMS,
        parameters=[f"x_{i}" for i in range(DIMS)],
        prior_bounds={f"x_{i}": [-10, 10] for i in range(DIMS)},
        seed=0,
    )
    asp.fit(initial_samples, n_epochs=6, batch_size=256)
    common = dict(n_steps=12, n_temperatures=3, swap_every=3)

    ref = asp.init_sampler("ptmcmc", preconditioning="none").sample(
        8, **common
    )

    path = tmp_path / "pt_host.h5"
    s2 = asp.init_sampler("ptmcmc", preconditioning="none")
    assert not s2.target_is_jittable()
    real_save = s2.save_pt_state

    class _Killed(RuntimeError):
        pass

    def crashing_save(file_path, **kw):
        real_save(file_path, **kw)
        if kw["rounds_done"] == 2:
            raise _Killed()

    s2.save_pt_state = crashing_save
    with pytest.raises(_Killed):
        s2.sample(
            8, **common,
            checkpoint_file_path=str(path), state_checkpoint_every=2,
        )
    s2.save_pt_state = real_save
    with h5py.File(path, "r") as f:
        assert int(f["checkpoint/pt_state"].attrs["rounds_done"]) == 2
    resumed = s2.sample(8, **common, resume_from=str(path))
    np.testing.assert_array_equal(
        np.asarray(resumed.x), np.asarray(ref.x)
    )


def test_pt_facade_crash_recovery(tmp_path, initial_samples):
    """The advertised crash flow really works: kill a facade-driven PT
    run BEFORE any post-sample record exists, then resume_from_file +
    bare sample_posterior() continues it — the continuation kwargs come
    from the PT state group's own attrs."""
    path = tmp_path / "pt_crash_facade.h5"
    asp = make_aspire()
    asp.fit(initial_samples, n_epochs=8, batch_size=256)

    class _Killed(RuntimeError):
        pass

    from aspire_tpu.samplers.mcmc import ParallelTemperedSampler

    real_save = ParallelTemperedSampler.save_pt_state

    def crashing_save(self, file_path, **kw):
        real_save(self, file_path, **kw)
        if kw["rounds_done"] == 2:
            raise _Killed()

    ParallelTemperedSampler.save_pt_state = crashing_save
    try:
        with pytest.raises(_Killed):
            asp.sample_posterior(
                sampler="ptmcmc",
                n_samples=16,
                n_steps=24,
                n_temperatures=4,
                swap_every=4,
                preconditioning="none",
                state_checkpoint_every=2,
                checkpoint_path=str(path),
            )
    finally:
        ParallelTemperedSampler.save_pt_state = real_save
    import h5py

    with h5py.File(path, "r") as f:
        assert "sampler_config" not in f  # genuinely mid-crash
        assert "aspire_config" in f  # written BEFORE sampling
        assert "flow" in f

    asp2 = Aspire.resume_from_file(
        str(path),
        log_likelihood=log_likelihood,
        log_prior=log_prior,
    )
    assert asp2._resume is not None
    assert asp2._resume.sampler_type == "ptmcmc"
    assert asp2._resume.n_samples == 16
    post = asp2.sample_posterior()
    # 24 steps / swap_every 4 = 6 rounds of 4 temps x 16 walkers.
    assert np.asarray(post.x).shape == (4 * 6 * 16, DIMS)
    # Only the remaining 4 rounds were paid for.
    assert (
        asp2.sampler.n_likelihood_evaluations
        == 4 * 4 * 4 * 16  # rounds * swap_every * temps * walkers
    )
