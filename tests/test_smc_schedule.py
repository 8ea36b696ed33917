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
