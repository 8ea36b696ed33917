"""Tests for the sample containers (model: reference tests/test_samples.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.ops.special import effective_sample_size, logsumexp
from aspire_tpu.samples import (
    BaseSamples,
    MCMCSamples,
    PTMCMCSamples,
    Samples,
    SMCSamples,
)


def make_samples(rng, n=100, d=3, cls=Samples, **kwargs):
    return cls(
        x=rng.normal(size=(n, d)),
        log_likelihood=rng.normal(size=n),
        log_prior=rng.normal(size=n),
        log_q=rng.normal(size=n),
        **kwargs,
    )


class TestBaseSamples:
    def test_basic(self, rng):
        s = BaseSamples(rng.normal(size=(10, 2)))
        assert len(s) == 10
        assert s.dims == 2
        assert s.parameters == ["x_0", "x_1"]

    def test_1d_promoted(self, rng):
        s = BaseSamples(rng.normal(size=10))
        assert s.x.shape == (10, 1)

    def test_dtype(self, rng, dtype):
        s = BaseSamples(rng.normal(size=(10, 2)), dtype=dtype)
        if dtype is not None:
            assert s.x.dtype == jnp.dtype(dtype)

    def test_getitem(self, rng):
        s = make_samples(rng, cls=BaseSamples)
        sub = s[:10]
        assert len(sub) == 10
        assert sub.log_likelihood.shape == (10,)

    def test_concatenate(self, rng):
        s1 = make_samples(rng, n=10, cls=BaseSamples)
        s2 = make_samples(rng, n=20, cls=BaseSamples)
        cat = BaseSamples.concatenate([s1, s2])
        assert len(cat) == 30

    def test_concatenate_empty_raises(self):
        with pytest.raises(ValueError, match="No samples"):
            BaseSamples.concatenate([])

    def test_concatenate_mismatched_parameters_raises(self, rng):
        s1 = BaseSamples(rng.normal(size=(5, 2)), parameters=["a", "b"])
        s2 = BaseSamples(rng.normal(size=(5, 2)), parameters=["c", "d"])
        with pytest.raises(ValueError, match="Parameters do not match"):
            BaseSamples.concatenate([s1, s2])

    def test_to_dict_roundtrip(self, rng):
        s = make_samples(rng, cls=BaseSamples)
        d = s.to_dict(flat=True)
        s2 = BaseSamples.from_dict(d)
        np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s.x))

    def test_to_dict_nested_roundtrip(self, rng):
        s = make_samples(rng, cls=BaseSamples)
        d = s.to_dict(flat=False)
        s2 = BaseSamples.from_dict(d)
        np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s.x))

    def test_to_dataframe(self, rng):
        s = make_samples(rng, cls=BaseSamples, n=17, d=2)
        df = s.to_dataframe()
        assert len(df) == 17
        assert "x_0" in df.columns
        assert "log_likelihood" in df.columns

    def test_save_load(self, rng, tmp_path):
        import h5py

        s = make_samples(rng, cls=BaseSamples)
        path = tmp_path / "s.h5"
        with h5py.File(path, "w") as f:
            s.save(f, "samples")
        with h5py.File(path, "r") as f:
            s2 = BaseSamples.load(f, "samples")
        np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s.x))
        assert s2.parameters == s.parameters


class TestSamples:
    def test_compute_weights_constant_case(self, rng):
        """If logL+logPi == log_q exactly, logZ = 0 and ESS = n."""
        n, d = 50, 2
        x = rng.normal(size=(n, d))
        log_prior = rng.normal(size=n)
        log_likelihood = rng.normal(size=n)
        log_q = log_prior + log_likelihood
        s = Samples(
            x,
            log_likelihood=log_likelihood,
            log_prior=log_prior,
            log_q=log_q,
        )
        assert float(s.log_evidence) == pytest.approx(0.0, abs=1e-10)
        assert float(s.effective_sample_size) == pytest.approx(n, rel=1e-10)
        assert float(s.efficiency) == pytest.approx(1.0, rel=1e-10)

    def test_log_evidence_shift(self, rng):
        """A constant offset c in log_w gives logZ = c."""
        n = 100
        x = rng.normal(size=(n, 2))
        log_q = rng.normal(size=n)
        s = Samples(
            x,
            log_likelihood=log_q + 3.0,
            log_prior=jnp.zeros(n),
            log_q=log_q,
        )
        assert float(s.log_evidence) == pytest.approx(3.0, abs=1e-10)

    def test_rejection_sample_proportional(self, rng):
        n = 20000
        x = rng.normal(size=(n, 1))
        log_w = np.where(x[:, 0] > 0, np.log(2.0), 0.0)
        s = Samples(
            x,
            log_likelihood=log_w,
            log_prior=np.zeros(n),
            log_q=np.zeros(n),
        )
        out = s.rejection_sample(key=jax.random.key(0))
        frac_pos = float(np.mean(np.asarray(out.x[:, 0]) > 0))
        # Positive samples twice as likely to be kept -> ~2/3 of accepted.
        assert frac_pos == pytest.approx(2 / 3, abs=0.03)

    def test_rejection_sample_stays_on_device(self, rng):
        # Round-4 regression: the accept path must not round-trip the
        # population through numpy (VERDICT r3 weak #5).
        s = make_samples(rng)
        out = s.rejection_sample(key=jax.random.key(1))
        assert isinstance(out.x, jax.Array)
        assert isinstance(out.log_likelihood, jax.Array)

    def test_getitem_keeps_evidence(self, rng):
        s = make_samples(rng)
        sub = s[:10]
        assert sub.log_evidence == s.log_evidence


class TestMCMCSamples:
    def test_from_chain_roundtrip(self, rng):
        chain = rng.normal(size=(20, 4, 3))
        s = MCMCSamples.from_chain(chain)
        assert s.x.shape == (80, 3)
        np.testing.assert_allclose(np.asarray(s.chain), chain)

    def test_post_process(self, rng):
        chain = rng.normal(size=(20, 4, 3))
        s = MCMCSamples.from_chain(
            chain, log_likelihood=rng.normal(size=80)
        )
        out = s.post_process(burn_in=10, thin=2)
        assert out.chain.shape == (5, 4, 3)
        assert out.log_likelihood.shape == (20,)

    def test_autocorrelation_time(self, rng):
        # Strongly autocorrelated AR(1) chain should give tau >> 1.
        n, w = 2000, 4
        x = np.zeros((n, w, 1))
        for t in range(1, n):
            x[t] = 0.95 * x[t - 1] + rng.normal(size=(w, 1))
        s = MCMCSamples.from_chain(x)
        tau = s.compute_autocorrelation_time()
        assert float(tau[0]) > 10


class TestPTMCMCSamples:
    def _make(self, rng, n_temps=6, n_steps=50, n_walkers=4, d=2):
        betas = np.linspace(1, 0, n_temps)
        chain = rng.normal(size=(n_temps, n_steps, n_walkers, d))
        logl = rng.normal(size=chain[..., 0].size)
        return PTMCMCSamples.from_chain(
            chain.reshape(-1, *chain.shape[2:]), betas=betas
        ), betas, chain, logl

    def test_at_temperature(self, rng):
        n_temps, n_steps, n_walkers, d = 3, 10, 4, 2
        chain = rng.normal(size=(n_temps, n_steps, n_walkers, d))
        s = PTMCMCSamples(
            x=chain.reshape(-1, d),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.linspace(1, 0, n_temps),
        )
        cold = s.cold_chain()
        np.testing.assert_allclose(
            np.asarray(cold.chain), chain[0]
        )

    def test_slicing_raises(self, rng):
        s = PTMCMCSamples(
            x=rng.normal(size=(12, 2)),
            chain_shape=(3, 2, 2),
            betas=np.linspace(1, 0, 3),
        )
        with pytest.raises(NotImplementedError):
            s[:2]

    def test_ti_constant_likelihood(self, rng):
        """If logL == c for all samples and temps, TI logZ == c exactly."""
        n_temps, n_steps, n_walkers, d = 5, 20, 2, 2
        c = -3.5
        s = PTMCMCSamples(
            x=rng.normal(size=(n_temps * n_steps * n_walkers, d)),
            log_likelihood=np.full(n_temps * n_steps * n_walkers, c),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.linspace(1, 0, n_temps),
        )
        logz, err = s.log_evidence_thermodynamic_integration()
        assert logz == pytest.approx(c, abs=1e-10)
        assert err == pytest.approx(0.0, abs=1e-10)

    def test_stepping_stone_constant_likelihood(self, rng):
        n_temps, n_steps, n_walkers, d = 5, 20, 2, 2
        c = -2.0
        s = PTMCMCSamples(
            x=rng.normal(size=(n_temps * n_steps * n_walkers, d)),
            log_likelihood=np.full(n_temps * n_steps * n_walkers, c),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.linspace(1, 0, n_temps),
        )
        logz, _ = s.log_evidence_stepping_stone()
        assert logz == pytest.approx(c, abs=1e-10)

    def test_stepping_stone_requires_beta_zero(self, rng):
        s = PTMCMCSamples(
            x=rng.normal(size=(12, 2)),
            log_likelihood=rng.normal(size=12),
            chain_shape=(3, 2, 2),
            betas=np.linspace(1, 0.1, 3),
        )
        with pytest.raises(ValueError, match="hottest"):
            s.log_evidence_stepping_stone()

    def test_subsample(self, rng):
        n_temps, n_steps, n_walkers, d = 3, 10, 4, 2
        s = PTMCMCSamples(
            x=rng.normal(size=(n_temps * n_steps * n_walkers, d)),
            log_likelihood=rng.normal(size=n_temps * n_steps * n_walkers),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.linspace(1, 0, n_temps),
        )
        sub = s.subsample(5, rng=rng)
        assert sub.chain_shape == (3, 5, 1)
        assert len(sub) == 15

    def test_subsample_key_deterministic_on_device(self, rng):
        # Round-4 regression: index draws + gathers run on device and a
        # jax key gives a reproducible draw (VERDICT r3 weak #5).
        n_temps, n_steps, n_walkers, d = 3, 10, 4, 2
        s = PTMCMCSamples(
            x=rng.normal(size=(n_temps * n_steps * n_walkers, d)),
            log_likelihood=rng.normal(size=n_temps * n_steps * n_walkers),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.linspace(1, 0, n_temps),
        )
        a = s.subsample(5, key=jax.random.key(3))
        b = s.subsample(5, key=jax.random.key(3))
        assert isinstance(a.x, jax.Array)
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        np.testing.assert_array_equal(
            np.asarray(a.log_likelihood), np.asarray(b.log_likelihood)
        )
        # Without replacement within each rung.
        flat = np.asarray(a.chain).reshape(n_temps, -1, d)
        for t in range(n_temps):
            rows = {tuple(r) for r in flat[t]}
            assert len(rows) == 5


class TestSMCSamples:
    def _make(self, rng, n=200, beta=0.3):
        return SMCSamples(
            x=rng.normal(size=(n, 2)),
            log_likelihood=rng.normal(size=n),
            log_prior=rng.normal(size=n),
            log_q=rng.normal(size=n),
            beta=beta,
        )

    def test_log_p_t_endpoints(self, rng):
        s = self._make(rng)
        np.testing.assert_allclose(
            np.asarray(s.log_p_t(0.0)), np.asarray(s.log_q)
        )
        np.testing.assert_allclose(
            np.asarray(s.log_p_t(1.0)),
            np.asarray(s.log_likelihood + s.log_prior),
        )

    def test_unnormalized_log_weights(self, rng):
        s = self._make(rng, beta=0.2)
        lw = s.unnormalized_log_weights(0.5)
        expected = 0.3 * (
            np.asarray(s.log_likelihood + s.log_prior) - np.asarray(s.log_q)
        )
        np.testing.assert_allclose(np.asarray(lw), expected, rtol=1e-10)

    def test_log_weights_offset(self, rng):
        """Parity with reference samples.py:1244-1249: log_weights =
        unnormalized log_w + log evidence ratio (a constant shift)."""
        s = self._make(rng)
        lw = np.asarray(s.log_weights(0.6))
        raw = np.asarray(s.unnormalized_log_weights(0.6))
        ratio = float(s.log_evidence_ratio(0.6))
        np.testing.assert_allclose(lw, raw + ratio, rtol=1e-10)
        assert math.isfinite(ratio)

    def test_log_weights_nan_raises(self, rng):
        s = self._make(rng)
        s.log_likelihood = s.log_likelihood.at[0].set(jnp.nan)
        with pytest.raises(ValueError, match="NaN"):
            s.log_weights(0.5)

    def test_evidence_ratio_constant(self, rng):
        """Constant logL+logPi-log_q == c gives ratio = dbeta * c."""
        n = 100
        x = rng.normal(size=(n, 2))
        log_q = rng.normal(size=n)
        c = 2.5
        s = SMCSamples(
            x,
            log_likelihood=log_q + c,
            log_prior=np.zeros(n),
            log_q=log_q,
            beta=0.2,
        )
        ratio = float(s.log_evidence_ratio(0.7))
        assert ratio == pytest.approx(0.5 * c, abs=1e-10)
        var = float(s.log_evidence_ratio_variance(0.7))
        assert var == pytest.approx(0.0, abs=1e-12)

    @pytest.mark.parametrize(
        "method", ["systematic", "multinomial", "stratified", "residual"]
    )
    def test_resample_methods(self, rng, method):
        s = self._make(rng, n=500)
        out = s.resample(0.8, key=jax.random.key(1), method=method)
        assert len(out) == 500
        assert out.beta == 0.8

    def test_resample_targets_weights(self, rng):
        """Resampled population concentrates on high-weight particles."""
        n = 5000
        x = np.arange(n, dtype=float)[:, None]
        log_q = np.zeros(n)
        # Give the first half much higher targets.
        logl = np.where(x[:, 0] < n / 2, 5.0, 0.0)
        s = SMCSamples(
            x, log_likelihood=logl, log_prior=np.zeros(n), log_q=log_q,
            beta=0.0,
        )
        out = s.resample(1.0, key=jax.random.key(2), method="systematic")
        frac_low = float(np.mean(np.asarray(out.x[:, 0]) < n / 2))
        assert frac_low > 0.98

    def test_resample_same_beta_warns(self, rng, caplog):
        s = self._make(rng)
        out = s.resample(s.beta)
        assert out is s

    def test_to_standard_samples(self, rng):
        s = self._make(rng)
        s.log_evidence = -1.0
        s.log_evidence_error = 0.1
        std = s.to_standard_samples()
        assert isinstance(std, Samples)
        assert std.log_evidence is not None


class TestOps:
    def test_logsumexp_matches_scipy(self, rng):
        from scipy.special import logsumexp as scipy_lse

        x = jnp.asarray(rng.normal(size=1000))
        assert float(logsumexp(x)) == pytest.approx(
            float(scipy_lse(np.asarray(x))), rel=1e-9
        )

    def test_logsumexp_all_neg_inf(self):
        x = jnp.full(10, -jnp.inf)
        assert float(logsumexp(x)) == -jnp.inf

    def test_ess_uniform(self):
        lw = jnp.zeros(100)
        assert float(effective_sample_size(lw)) == pytest.approx(100.0)

    def test_ess_single(self):
        lw = jnp.concatenate([jnp.zeros(1), jnp.full(99, -jnp.inf)])
        assert float(effective_sample_size(lw)) == pytest.approx(1.0)


def test_compute_weights_error_no_underflow_at_large_negative_logz():
    """Relative evidence error must survive |logZ| >> 44 in f32.

    Regression: the raw (weights - evidence)**2 form underflows and
    silently reports zero error (found on the d=32 hierarchical run).
    """
    import jax.numpy as jnp

    from aspire_tpu.samples import Samples

    rng = np.random.default_rng(0)
    n = 4096
    s = Samples(
        x=rng.normal(size=(n, 2)),
        log_likelihood=jnp.asarray(
            -500.0 + rng.normal(0, 0.5, size=n), jnp.float32
        ),
        log_prior=jnp.zeros(n, jnp.float32),
        log_q=jnp.zeros(n, jnp.float32),
    )
    err = float(s.log_evidence_error)
    assert np.isfinite(err) and err > 0
    # Same spread shifted to logZ ~ 0 must give the same relative error.
    s2 = Samples(
        x=rng.normal(size=(n, 2)),
        log_likelihood=s.log_likelihood + 500.0,
        log_prior=jnp.zeros(n, jnp.float32),
        log_q=jnp.zeros(n, jnp.float32),
    )
    assert err == pytest.approx(float(s2.log_evidence_error), rel=1e-3)


class TestPTMCMCSamplesRound3:
    """Round-3 review fixes: the PT ladder's inherited 3-D machinery."""

    def _make(self, rng, n_temps=3, n_steps=20, n_walkers=4, d=2):
        chain = rng.normal(size=(n_temps, n_steps, n_walkers, d))
        s = PTMCMCSamples(
            x=chain.reshape(-1, d),
            log_likelihood=rng.normal(size=chain[..., 0].size),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.linspace(1, 0, n_temps),
        )
        return s, chain

    def test_post_process_trims_step_axis_and_keeps_betas(self, rng):
        s, chain = self._make(rng)
        out = s.post_process(burn_in=5, thin=2)
        assert out.chain_shape == (3, 8, 4)  # (20 - 5) strided by 2
        np.testing.assert_allclose(
            np.asarray(out.chain), chain[:, 5::2], rtol=1e-6
        )
        assert out.betas is not None
        assert out.n_temperatures == 3
        # metadata records what was applied; a repeat call is a no-op
        again = out.post_process()
        assert again.chain_shape == out.chain_shape

    def test_autocorr_time_shape(self, rng):
        s, _ = self._make(rng)
        tau = s.compute_autocorrelation_time()
        assert tau.shape == (3, 2)  # (n_temps, d)
        assert np.all(np.asarray(tau) >= 0)

    def test_subsample_indices_independent_per_rung(self, rng):
        n_temps, n_steps, n_walkers, d = 3, 40, 4, 1
        # positions encode their flattened (step, walker) index so the
        # drawn indices are recoverable per rung
        base = np.arange(n_steps * n_walkers, dtype=float)
        chain = np.broadcast_to(
            base[None, :, None], (n_temps, n_steps * n_walkers, d)
        ).reshape(n_temps, n_steps, n_walkers, d)
        s = PTMCMCSamples(
            x=chain.reshape(-1, d),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.linspace(1, 0, n_temps),
        )
        sub = s.subsample(30, rng=np.random.default_rng(0))
        picked = np.asarray(sub.chain).reshape(n_temps, -1)
        # With independent draws, the three rungs' index sets differ.
        assert not (
            np.array_equal(picked[0], picked[1])
            and np.array_equal(picked[1], picked[2])
        )

    def test_ti_total_error_covers_discretization(self, rng):
        # Convex integrand E(beta) = -8*(1-beta)^2 sampled on a COARSE
        # ladder: the trapezoid overshoots the true integral (-8/3) by
        # ~(2/3) nat while per-rung sampling noise is tiny. The
        # "variance" bar misses the truth; "total" must cover it.
        n_temps, n_steps, n_walkers = 3, 400, 4
        betas = np.linspace(1, 0, n_temps)
        means = -8.0 * (1.0 - betas) ** 2
        ll = means[:, None, None] + rng.normal(
            0.0, 0.05, size=(n_temps, n_steps, n_walkers)
        )
        s = PTMCMCSamples(
            x=np.zeros((n_temps * n_steps * n_walkers, 1)),
            log_likelihood=ll.reshape(-1),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=betas,
        )
        true_logz = -8.0 / 3.0
        logz_v, err_v = s.log_evidence_thermodynamic_integration(
            method="variance"
        )
        logz_t, err_t = s.log_evidence_thermodynamic_integration(
            method="total"
        )
        assert logz_t == logz_v
        assert err_t > err_v
        assert abs(logz_v - true_logz) > 2 * err_v  # variance alone lies
        assert abs(logz_t - true_logz) < 2 * err_t  # total covers it
        with pytest.raises(ValueError, match="total"):
            s.log_evidence_thermodynamic_integration(method="nope")

    def test_betas_validation(self, rng):
        chain = rng.normal(size=(3, 5, 2, 1))
        kwargs = dict(
            x=chain.reshape(-1, 1), chain_shape=(3, 5, 2)
        )
        with pytest.raises(ValueError, match="decreasing"):
            PTMCMCSamples(betas=[0.0, 0.5, 1.0], **kwargs)
        with pytest.raises(ValueError, match="start at 1"):
            PTMCMCSamples(betas=[0.9, 0.5, 0.1], **kwargs)
        with pytest.raises(ValueError, match="rungs"):
            PTMCMCSamples(betas=[1.0, 0.5], **kwargs)


def test_mcmc_samples_slicing_keeps_chain_metadata(rng):
    chain = rng.normal(size=(30, 4, 2))
    s = MCMCSamples.from_chain(chain, burn_in=3, thin=2)
    s.compute_autocorrelation_time()
    sub = s[:40]
    assert len(sub) == 40
    assert sub.chain.shape == (40, 1, 2)  # usable, single-walker view
    assert sub.burn_in == 3 and sub.thin == 2
    assert sub.autocorrelation_time is not None


def test_integer_x_promotes_to_float(rng):
    s = BaseSamples(
        x=np.array([[1, 2], [3, 4]]),
        log_likelihood=[-1.5, -2.7],
    )
    assert jnp.issubdtype(s.x.dtype, jnp.floating)
    np.testing.assert_allclose(
        np.asarray(s.log_likelihood), [-1.5, -2.7]
    )


def test_samples_str_without_error_bar(rng):
    s = Samples(
        x=rng.normal(size=(10, 2)),
        log_likelihood=rng.normal(size=10),
        log_prior=rng.normal(size=10),
        log_evidence=-5.0,
    )
    assert "Log evidence: -5.00" in str(s)


class TestPTDiagnosticsPersistence:
    def test_acceptance_fields_roundtrip(self, rng, tmp_path):
        """move/swap acceptance are dataclass fields: they survive
        to_dict/save/load and ride through post_process/subsample."""
        import h5py

        n_temps, n_steps, n_walkers, d = 3, 10, 4, 2
        chain = rng.normal(size=(n_temps, n_steps, n_walkers, d))
        s = PTMCMCSamples(
            x=chain.reshape(-1, d),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.linspace(1, 0, n_temps),
            move_acceptance=np.array([0.4, 0.5, 0.6]),
            swap_acceptance=np.array([0.2, 0.9]),
        )
        with h5py.File(tmp_path / "pt.h5", "w") as f:
            s.save(f, "pt")
        with h5py.File(tmp_path / "pt.h5", "r") as f:
            loaded = PTMCMCSamples.load(f, "pt")
        np.testing.assert_allclose(
            loaded.move_acceptance, s.move_acceptance
        )
        np.testing.assert_allclose(
            loaded.swap_acceptance, s.swap_acceptance
        )
        np.testing.assert_allclose(loaded.betas, s.betas)

        thinned = s.post_process(burn_in=2, thin=2)
        np.testing.assert_allclose(
            thinned.swap_acceptance, s.swap_acceptance
        )
        sub = s.subsample(5, rng=rng)
        np.testing.assert_allclose(
            sub.move_acceptance, s.move_acceptance
        )

    def test_plot_ladder(self, rng, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n_temps, n_steps, n_walkers, d = 4, 10, 4, 2
        chain = rng.normal(size=(n_temps, n_steps, n_walkers, d))
        s = PTMCMCSamples(
            x=chain.reshape(-1, d),
            chain_shape=(n_temps, n_steps, n_walkers),
            betas=np.asarray([1.0, 0.5, 0.2, 0.0]),
            move_acceptance=np.array([0.4, 0.5, 0.6, 0.7]),
            swap_acceptance=np.array([0.6, 0.05, 0.8]),
        )
        fig = s.plot_ladder()
        assert len(fig.axes) == 2
        plt.close(fig)
        s.swap_acceptance = None
        import pytest as _pytest

        with _pytest.raises(ValueError, match="diagnostics"):
            s.plot_ladder()


class TestSteppingStoneExtremeSkew:
    def test_funnel_like_prior_rung_stays_finite(self, rng):
        """A prior rung whose logL spans 1e19 (deep-funnel geometry)
        must not overflow the f32 device reduction: max-centering
        bounds every device exponent by 0, and the result matches an
        f64 host reference. Regression: the jitted mean-centered
        reduction returned +-inf here (XLA reassociated the shifted
        exp into an overflowing form)."""
        T, S = 4, 256
        logl = np.stack([
            np.where(
                rng.uniform(size=S) < 0.05,
                -1.8e19,
                rng.normal(-12, 2, S),
            ),
            rng.normal(-100, 30, S),
            rng.normal(-30, 5, S),
            rng.normal(3, 1, S),
        ])
        s = PTMCMCSamples(
            x=np.zeros((T * 1 * S, 2)),
            chain_shape=(T, 1, S),
            betas=np.array([1.0, 0.05, 1e-3, 0.0]),
        )
        s.log_likelihood = logl[::-1].reshape(-1)  # cold rung first
        lz, err = s.log_evidence_stepping_stone(burn_in_fraction=None)
        assert np.isfinite(lz) and np.isfinite(err)
        betas = np.array([0.0, 1e-3, 0.05, 1.0])
        gaps = np.diff(betas)
        a = gaps[:, None] * logl[:-1]
        sh = a.max(axis=1, keepdims=True)
        ref = float(
            (np.log(np.exp(a - sh).mean(axis=1)) + sh[:, 0]).sum()
        )
        assert lz == pytest.approx(ref, rel=1e-5)

    def test_dead_rung_gives_minus_inf_not_nan(self, rng):
        """A rung with every walker outside the likelihood support
        contributes an honest zero power ratio: logZ -> -inf, never
        NaN (the -inf row would otherwise make shift = -inf and
        a - shift = NaN inside the reduction)."""
        s = PTMCMCSamples(
            x=np.zeros((3 * 1 * 8, 2)),
            chain_shape=(3, 1, 8),
            betas=np.array([1.0, 0.5, 0.0]),
        )
        ll = np.array([[-1.0] * 8, [-np.inf] * 8, [-2.0] * 8])
        s.log_likelihood = ll[::-1].reshape(-1)  # cold rung first
        lz, err = s.log_evidence_stepping_stone(burn_in_fraction=None)
        assert lz == -np.inf
        assert not np.isnan(lz)


class TestLogsumexpInfEdges:
    def test_plus_inf_propagates(self):
        """+inf log-weights must stay loud (the overflow clip is
        skipped when the max is not finite)."""
        import jax.numpy as jnp

        from aspire_tpu.ops.special import (
            effective_sample_size,
            logsumexp,
        )

        assert float(logsumexp(jnp.array([0.0, np.inf]))) == np.inf
        assert float(
            logsumexp(jnp.array([-np.inf, -np.inf]))
        ) == -np.inf
        assert np.isfinite(
            float(effective_sample_size(jnp.array([0.0, -1.0])))
        )
