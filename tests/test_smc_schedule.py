"""Adaptive temperature-ladder control (reference smc/base.py:80-213).

Covers the target-efficiency schedule (fixed and (lo, hi) ramp), the
ESS-targeted beta bisection, step clamps, and the stall error — the
control logic every SMC run lives or dies by.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.ops.special import effective_sample_size
from aspire_tpu.samplers.smc import BetaScheduleError, SMCSampler


def make_sampler(**kwargs):
    s = SMCSampler.__new__(SMCSampler)
    s.adaptive = kwargs.pop("adaptive", True)
    s.adaptive_min_beta_step = kwargs.pop("adaptive_min_beta_step", False)
    s._adaptive_target_efficiency = False
    s.target_efficiency_rate = 1.0
    s.target_efficiency = kwargs.pop("target_efficiency", 0.5)
    return s


class TestTargetEfficiency:
    def test_fixed(self):
        s = make_sampler(target_efficiency=0.7)
        assert s.current_target_efficiency(0.0) == 0.7
        assert s.current_target_efficiency(1.0) == 0.7

    def test_ramp(self):
        s = make_sampler(target_efficiency=(0.3, 0.9))
        s.target_efficiency_rate = 2.0
        assert s.current_target_efficiency(0.0) == pytest.approx(0.3)
        assert s.current_target_efficiency(1.0) == pytest.approx(0.9)
        assert s.current_target_efficiency(0.5) == pytest.approx(
            0.3 + 0.6 * 0.25
        )

    @pytest.mark.parametrize("bad", [0.0, 1.0, -0.1, (0.9, 0.3), (0.5,)])
    def test_invalid_raises(self, bad):
        with pytest.raises(ValueError):
            make_sampler(target_efficiency=bad)


class TestDetermineBeta:
    def test_bisection_hits_target_efficiency(self, rng):
        s = make_sampler(target_efficiency=0.5)
        delta = jnp.asarray(rng.normal(0, 3.0, size=20_000), jnp.float32)
        beta, _ = s.determine_beta(
            delta, 0.0, beta_step=0.1, min_beta_step=1e-6
        )
        assert 0.0 < beta < 1.0
        eff = float(
            effective_sample_size(beta * delta) / delta.shape[0]
        )
        assert eff == pytest.approx(0.5, abs=0.02)

    def test_jumps_to_one_when_target_met(self, rng):
        s = make_sampler(target_efficiency=0.5)
        delta = jnp.asarray(rng.normal(0, 0.01, size=5_000), jnp.float32)
        beta, _ = s.determine_beta(
            delta, 0.0, beta_step=0.1, min_beta_step=1e-6
        )
        assert beta == 1.0

    def test_max_beta_step_clamp(self, rng):
        s = make_sampler(target_efficiency=0.5)
        delta = jnp.asarray(rng.normal(0, 0.01, size=5_000), jnp.float32)
        beta, _ = s.determine_beta(
            delta, 0.0, beta_step=0.1, min_beta_step=1e-6, max_beta_step=0.25
        )
        assert beta == pytest.approx(0.25)

    def test_min_beta_step_floor(self, rng):
        s = make_sampler(target_efficiency=0.5)
        delta = jnp.asarray(rng.normal(0, 100.0, size=5_000), jnp.float32)
        beta, _ = s.determine_beta(
            delta, 0.0, beta_step=0.1, min_beta_step=0.05
        )
        assert beta >= 0.05 - 1e-6

    def test_non_adaptive_fixed_step(self):
        s = make_sampler(adaptive=False)
        delta = jnp.zeros(100, jnp.float32)
        beta, _ = s.determine_beta(
            delta, 0.3, beta_step=0.25, min_beta_step=1e-6
        )
        assert beta == pytest.approx(0.55)
        beta, _ = s.determine_beta(
            delta, 0.9, beta_step=0.25, min_beta_step=1e-6
        )
        assert beta == 1.0

    def test_stall_raises_beta_schedule_error(self):
        s = make_sampler(target_efficiency=0.5)
        # One dominant particle: any positive step collapses ESS, and
        # with no minimum step the ladder cannot advance.
        delta = jnp.zeros(1000, jnp.float32).at[0].set(1e10)
        with pytest.raises(BetaScheduleError):
            s.determine_beta(delta, 0.5, beta_step=0.1, min_beta_step=0.0)

    def test_adaptive_min_step_rescales(self, rng):
        s = make_sampler(target_efficiency=0.5, adaptive_min_beta_step=True)
        delta = jnp.asarray(rng.normal(0, 3.0, size=10_000), jnp.float32)
        beta, min_step = s.determine_beta(
            delta, 0.0, beta_step=0.1, min_beta_step=0.01
        )
        # min step scaled by (1 - beta_prev) / (1 - beta_star).
        assert min_step == pytest.approx(0.01 / (1 - beta), rel=1e-3)


class TestLineageDegeneracy:
    """The evidence-error inflation recursion: resampling shrinks the
    independent-lineage fraction by ESS/n, mutation recovers it by
    1 - rho^(2k) with rho from the recorded autocorrelation time."""

    def _sampler(self, n_steps=10):
        from aspire_tpu.history import SMCHistory

        s = make_sampler()
        s.dims = 2
        s.sampler_kwargs = {"n_steps": n_steps}
        s.history = SMCHistory()
        s._lineage_fraction = 1.0
        return s

    def test_perfect_mixing_keeps_full_fraction(self):
        s = self._sampler()
        for _ in range(20):
            s._update_lineage_after_resample(ess=500.0, n=1000)
            # tau = 1, full traversal: an iid kernel.
            s._last_chain_stats = (1.0, 1.0)
            s._update_lineage_after_mutation()
        assert s._lineage_fraction == pytest.approx(1.0)

    def test_stuck_kernel_decays_geometrically(self):
        s = self._sampler(n_steps=10)
        for _ in range(10):
            s._update_lineage_after_resample(ess=500.0, n=1000)
            # tau at the frozen-chain saturation (~2e4): duplicates
            # essentially never decorrelate within a sweep.
            s._last_chain_stats = (2e4, 1.0)
            s._update_lineage_after_mutation()
        # Ten halvings with barely any recovery: tiny fraction, so the
        # reported evidence variance is inflated by orders of magnitude.
        assert s._lineage_fraction < 0.05

    def test_fraction_floor_is_one_particle(self):
        s = self._sampler()
        for _ in range(100):
            s._update_lineage_after_resample(ess=1.0, n=1000)
        assert s._lineage_fraction >= 1.0 / 1000

    def test_partial_recovery_between_extremes(self):
        s = self._sampler(n_steps=5)
        s._update_lineage_after_resample(ess=500.0, n=1000)
        s._last_chain_stats = (3.0, 1.0)
        s._update_lineage_after_mutation()
        assert 0.5 < s._lineage_fraction < 1.0

    def test_mode_trapped_kernel_inflates_despite_small_tau(self):
        """The mala-on-a-mixture failure: tau is small (good local
        mixing) but chains never traverse modes (mixing << 1), so the
        lineage fraction must still decay."""
        s = self._sampler(n_steps=10)
        for _ in range(10):
            s._update_lineage_after_resample(ess=500.0, n=1000)
            s._last_chain_stats = (2.0, 0.2)  # fast locally, trapped
            s._update_lineage_after_mutation()
        assert s._lineage_fraction < 0.4


class TestAdaptivePTLadder:
    """Conditional-ESS rung placement for the PT sampler
    (``mcmc._bisect_pt_beta`` / ``adaptive_beta_ladder``) — the same
    ladder-control discipline as the SMC bisection, applied to the
    tempered path with a flow-probe population."""

    def _cess(self, log_l, log_base, beta_prev, beta):
        import jax.scipy.special as jss

        lu = log_base + beta_prev * log_l
        lu = lu - jss.logsumexp(lu)
        lv = (beta - beta_prev) * log_l
        num = 2.0 * jss.logsumexp(lu + lv)
        den = jss.logsumexp(lu + 2.0 * lv)
        return float(jnp.exp(num - den))

    def test_bisection_hits_cess_target(self, rng):
        from aspire_tpu.samplers.mcmc import _bisect_pt_beta

        log_l = jnp.asarray(rng.normal(0.0, 8.0, size=2000))
        log_base = jnp.asarray(rng.normal(0.0, 0.3, size=2000))
        target = 0.9
        beta = float(
            _bisect_pt_beta(log_l, log_base, 0.0, target, 1e-8)
        )
        assert 0.0 < beta < 1.0
        # CESS at the returned rung meets the target...
        assert self._cess(log_l, log_base, 0.0, beta) >= target - 1e-6
        # ...and a slightly colder rung would not (maximality).
        assert (
            self._cess(log_l, log_base, 0.0, min(beta + 1e-3, 1.0))
            < target
        )

    def test_bisection_jumps_to_one_when_overlap_is_high(self, rng):
        from aspire_tpu.samplers.mcmc import _bisect_pt_beta

        # Tiny likelihood spread: one rung suffices.
        log_l = jnp.asarray(rng.normal(0.0, 1e-3, size=500))
        log_base = jnp.zeros(500)
        beta = float(
            _bisect_pt_beta(log_l, log_base, 0.0, 0.9, 1e-8)
        )
        assert beta == pytest.approx(1.0)

    def _ladder(self, rng, spread, **kwargs):
        from aspire_tpu.samplers.mcmc import ParallelTemperedSampler

        s = ParallelTemperedSampler.__new__(ParallelTemperedSampler)
        n = 2000

        class Probe:
            log_likelihood = rng.normal(0.0, spread, size=n)
            log_prior = np.full(n, -1.0)
            log_q = rng.normal(-1.0, 0.2, size=n)

        return s.adaptive_beta_ladder(Probe(), **kwargs)

    def test_ladder_shape_and_ordering(self, rng):
        betas = self._ladder(rng, spread=8.0, min_n_temperatures=4)
        # Descending, cold end exactly 1, hot end exactly 0.
        assert betas[0] == 1.0
        assert betas[-1] == 0.0
        assert np.all(np.diff(betas) < 0)
        assert len(betas) >= 4

    def test_hard_target_gets_more_rungs_than_easy(self, rng):
        easy = self._ladder(rng, spread=0.5, min_n_temperatures=2)
        hard = self._ladder(rng, spread=30.0, min_n_temperatures=2)
        assert len(hard) > len(easy)

    def test_min_count_backfills_by_midpoint_split(self, rng):
        betas = self._ladder(rng, spread=1e-3, min_n_temperatures=6)
        assert len(betas) == 6
        assert betas[0] == 1.0 and betas[-1] == 0.0

    def test_cap_is_strict_and_cold_rung_forced(self, rng):
        betas = self._ladder(
            rng,
            spread=200.0,
            min_n_temperatures=2,
            max_n_temperatures=5,
            target_efficiency=0.999,
        )
        assert betas[0] == 1.0
        assert len(betas) <= 5  # cap honored even when beta=1 is forced

    def test_infinite_probe_entries_are_dropped(self, rng):
        # Hard-constraint targets hand public callers probes with -inf
        # logL; 0 * -inf = NaN must not poison the CESS bisection
        # (symptom: a garbage ladder creeping by min_beta_step).
        from aspire_tpu.samplers.mcmc import ParallelTemperedSampler

        s = ParallelTemperedSampler.__new__(ParallelTemperedSampler)
        n = 512

        class Probe:
            log_likelihood = np.where(
                rng.uniform(size=n) < 0.2,
                -np.inf,
                rng.normal(0.0, 5.0, size=n),
            )
            log_prior = np.full(n, -1.0)
            log_q = rng.normal(-1.0, 0.2, size=n)

        betas = s.adaptive_beta_ladder(Probe(), min_n_temperatures=4)
        assert betas[0] == 1.0 and betas[-1] == 0.0
        assert np.all(np.isfinite(betas))
        # A poisoned bisection creeps by min_beta_step=1e-4 per rung;
        # a healthy one takes real steps.
        assert np.max(np.diff(betas[::-1])) > 0.01

    def test_all_infinite_probe_raises(self):
        from aspire_tpu.samplers.mcmc import ParallelTemperedSampler

        s = ParallelTemperedSampler.__new__(ParallelTemperedSampler)

        class Probe:
            log_likelihood = np.full(16, -np.inf)
            log_prior = np.full(16, -1.0)
            log_q = np.full(16, -1.0)

        with pytest.raises(ValueError, match="finite"):
            s.adaptive_beta_ladder(Probe())


class TestPilotLadderRefinement:
    """Equal-dE rung re-placement from measured pilot rung means
    (``ParallelTemperedSampler.refine_ladder_from_run``)."""

    def _pt_samples(self, betas_desc, rung_means, noise=0.0, rng=None):
        from aspire_tpu.samples import PTMCMCSamples

        t, r, n = len(betas_desc), 8, 16
        ll = np.repeat(
            np.asarray(rung_means, float)[:, None, None], r, axis=1
        ).repeat(n, axis=2)
        if noise and rng is not None:
            ll = ll + rng.normal(0.0, noise, size=ll.shape)
        s = PTMCMCSamples(
            x=np.zeros((t * r * n, 2)),
            chain_shape=(t, r, n),
            betas=np.asarray(betas_desc, float),
        )
        s.log_likelihood = ll.reshape(-1)
        return s

    def _sampler(self):
        from aspire_tpu.samplers.mcmc import ParallelTemperedSampler

        return ParallelTemperedSampler.__new__(ParallelTemperedSampler)

    def test_splits_concentrate_in_steep_segment(self):
        # Hot segment [0, 0.2] holds 30 of the 33 nats of integrand
        # range: the refined ladder must subdivide it.
        betas = [1.0, 0.6, 0.2, 0.0]
        means = [-3.0, -4.0, -6.0, -36.0]
        out = self._sampler().refine_ladder_from_run(
            self._pt_samples(betas, means), n_temperatures=8
        )
        assert out[0] == 1.0 and out[-1] == 0.0
        assert np.all(np.diff(out) < 0)
        # Pilot rungs survive (union), plus new hot-end rungs.
        for b in betas:
            assert np.min(np.abs(out - b)) < 1e-12
        assert np.sum(out < 0.2) > np.sum((out >= 0.2) & (out < 1.0))

    def test_flat_integrand_returns_pilot_ladder(self):
        betas = [1.0, 0.5, 0.0]
        out = self._sampler().refine_ladder_from_run(
            self._pt_samples(betas, [-2.0, -2.0, -2.0]),
            n_temperatures=8,
        )
        np.testing.assert_array_equal(out, betas)

    def test_flat_integrand_still_honors_the_cap(self):
        # The flat-integrand early return must thin to the rung budget
        # (evenly, endpoints pinned) rather than bypass it.
        betas = np.linspace(1.0, 0.0, 12)
        out = self._sampler().refine_ladder_from_run(
            self._pt_samples(betas, [-2.0] * 12),
            n_temperatures=12,
            max_n_temperatures=5,
        )
        assert len(out) <= 5
        assert out[0] == 1.0 and out[-1] == 0.0
        assert np.all(np.diff(out) < 0)

    def test_redundant_levels_are_dropped(self):
        # Linear integrand on an equal-dE pilot grid: every new level
        # coincides with an existing rung, so nothing is added.
        betas = np.linspace(1.0, 0.0, 5)
        means = -2.0 - 10.0 * (1.0 - betas)
        out = self._sampler().refine_ladder_from_run(
            self._pt_samples(betas, means), n_temperatures=5
        )
        assert len(out) == len(betas)

    def test_nonfinite_rungs_are_ignored(self, rng):
        betas = [1.0, 0.5, 0.2, 0.0]
        means = [-3.0, -5.0, np.nan, -30.0]
        s = self._pt_samples(betas, means)
        out = self._sampler().refine_ladder_from_run(
            s, n_temperatures=6
        )
        assert np.all(np.isfinite(out))
        assert out[0] == 1.0 and out[-1] == 0.0

    def test_noise_never_breaks_monotonicity(self, rng):
        betas = [1.0, 0.7, 0.4, 0.2, 0.1, 0.0]
        means = [-3.0, -3.2, -4.0, -6.0, -9.0, -36.0]
        out = self._sampler().refine_ladder_from_run(
            self._pt_samples(betas, means, noise=0.5, rng=rng),
            n_temperatures=10,
        )
        assert np.all(np.diff(out) < 0)

    def test_cap_is_enforced_on_the_union(self):
        # Dense pilot grid + curved integrand: the equal-dE union would
        # exceed the cap; flattest-span rungs must be dropped instead.
        betas = np.linspace(1.0, 0.0, 12)
        means = -30.0 * (1.0 - betas) ** 4
        out = self._sampler().refine_ladder_from_run(
            self._pt_samples(betas, means),
            n_temperatures=12,
            max_n_temperatures=8,
        )
        assert len(out) <= 8
        assert out[0] == 1.0 and out[-1] == 0.0
        assert np.all(np.diff(out) < 0)

    def test_shared_bisection_scaffold(self):
        """SMC and PT ladders use one bisection implementation."""
        import inspect

        from aspire_tpu.samplers.kernels import monotone_beta_bisect
        from aspire_tpu.samplers import mcmc, smc

        assert "monotone_beta_bisect" in inspect.getsource(
            smc._bisect_beta.__wrapped__
        )
        assert "monotone_beta_bisect" in inspect.getsource(
            mcmc._bisect_pt_beta.__wrapped__
        )
        assert callable(monotone_beta_bisect)


class TestSwapFloorRescue:
    """Low-swap-acceptance pairs get a midpoint rung even when the
    equal-dE criterion sees nothing (the overlap blind spot)."""

    def _samples(self, betas_desc, rung_means, swap_acc):
        from aspire_tpu.samples import PTMCMCSamples

        t, r, n = len(betas_desc), 8, 16
        ll = np.repeat(
            np.asarray(rung_means, float)[:, None, None], r, axis=1
        ).repeat(n, axis=2)
        s = PTMCMCSamples(
            x=np.zeros((t * r * n, 2)),
            chain_shape=(t, r, n),
            betas=np.asarray(betas_desc, float),
        )
        s.log_likelihood = ll.reshape(-1)
        s.swap_acceptance = np.asarray(swap_acc, float)
        return s

    def _sampler(self):
        from aspire_tpu.samplers.mcmc import ParallelTemperedSampler

        return ParallelTemperedSampler.__new__(ParallelTemperedSampler)

    def test_low_swap_pair_gets_midpoint(self):
        # Linear integrand on an equal-dE grid: equal-dE adds nothing,
        # but the (0.5, 0.25) pair barely swaps -> midpoint inserted.
        betas = [1.0, 0.75, 0.5, 0.25, 0.0]
        means = -2.0 - 10.0 * (1.0 - np.asarray(betas))
        out = self._sampler().refine_ladder_from_run(
            self._samples(betas, means, [0.6, 0.7, 0.02, 0.5]),
            n_temperatures=5,
        )
        assert np.min(np.abs(out - 0.375)) < 1e-12
        assert len(out) == len(betas) + 1

    def test_healthy_swaps_add_nothing(self):
        betas = [1.0, 0.75, 0.5, 0.25, 0.0]
        means = -2.0 - 10.0 * (1.0 - np.asarray(betas))
        out = self._sampler().refine_ladder_from_run(
            self._samples(betas, means, [0.6, 0.7, 0.5, 0.5]),
            n_temperatures=5,
        )
        assert len(out) == len(betas)

    def test_rescue_survives_the_cap(self):
        # Ladder already at the budget: the rescue midpoint must not be
        # the first rung dropped by the flattest-span trim (it IS the
        # flattest-span rung by construction).
        betas = [1.0, 0.75, 0.5, 0.25, 0.0]
        means = -2.0 - 10.0 * (1.0 - np.asarray(betas))
        out = self._sampler().refine_ladder_from_run(
            self._samples(betas, means, [0.6, 0.7, 0.02, 0.5]),
            n_temperatures=5,
            max_n_temperatures=5,
        )
        assert len(out) == 5
        assert np.min(np.abs(out - 0.375)) < 1e-12

    def test_rescue_applies_on_flat_integrand(self):
        # Flat rung means (the early-return branch): the acceptance
        # diagnostic is still actionable and must insert the midpoint.
        betas = [1.0, 0.75, 0.5, 0.25, 0.0]
        out = self._sampler().refine_ladder_from_run(
            self._samples(betas, [-2.0] * 5, [0.6, 0.7, 0.02, 0.5]),
            n_temperatures=5,
        )
        assert np.min(np.abs(out - 0.375)) < 1e-12

    def test_rescue_reserved_in_flat_cap_thinning(self):
        betas = np.linspace(1.0, 0.0, 12)
        out = self._sampler().refine_ladder_from_run(
            self._samples(
                betas, [-2.0] * 12, [0.5] * 10 + [0.01]
            ),
            n_temperatures=12,
            max_n_temperatures=6,
        )
        assert len(out) <= 6
        mid = 0.5 * (betas[-2] + betas[-1])
        assert np.min(np.abs(out - mid)) < 1e-12
        assert out[0] == 1.0 and out[-1] == 0.0
