"""Standalone MCMC posterior samplers.

Parity with reference ``samplers/mcmc.py``: samplers that draw initial
states from the flow proposal and run MCMC on the posterior
``logL + logPi`` (optionally in a preconditioned space), returning
chain-shaped :class:`~aspire_tpu.samples.MCMCSamples`.

- :class:`PCNSampler`      — (t)pCN chains (reference ``MiniPCN``
  mcmc.py:267-348, minipcn internalized);
- :class:`EnsembleSampler` — affine-invariant ensemble (reference
  ``Emcee`` mcmc.py:203-264, emcee internalized as the batched
  red-black stretch move);
- :class:`ParallelTemperedSampler` — PT ensemble with replica swaps
  producing :class:`~aspire_tpu.samples.PTMCMCSamples` for the
  thermodynamic-integration / stepping-stone evidence estimators (the
  reference only stubs this; mcmc.py:351-368).

Chains run as ``lax.scan`` over batched kernel steps; the whole run is a
single XLA computation when the user target is jit-traceable.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..samples import MCMCSamples, PTMCMCSamples
from ..utils import track_calls
from . import kernels as K
from .base import Sampler

logger = logging.getLogger("aspire_tpu")


@jax.jit
def _bisect_pt_beta(log_l, log_base, beta_prev, target, tol):
    """Next PT rung by conditional-ESS bisection.

    The rung-placement discipline the SMC ladder uses (on-device
    fixed-54-iteration bisection; ``smc._bisect_beta``), applied to the
    PT tempering path ``p_beta ∝ exp(logPi + beta * logL)`` with a
    probe population drawn from the flow ``q``. The criterion is the
    conditional ESS of Zhou, Johansen & Aston (2016, JCGS 25:3): with
    normalized probe weights ``u ∝ exp(log_base + beta_prev * logL)``
    (``log_base = logPi - log_q``) and increment
    ``v = exp((beta - beta_prev) * logL)``,

        CESS(beta) = n * (Σ u v)^2 / (Σ u v^2),

    which estimates the incremental overlap between adjacent rungs
    under p_{beta_prev} itself — not merely the probe's overlap with
    the flow. Returns the largest ``beta`` in ``[beta_prev, 1]`` with
    ``CESS >= target * n`` (monotone in beta near beta_prev), via the
    bisection scaffold shared with the SMC ladder
    (:func:`aspire_tpu.samplers.kernels.monotone_beta_bisect`).
    """
    lu = log_base + beta_prev * log_l
    lu = lu - jax.scipy.special.logsumexp(lu)
    log_target = jnp.log(target)

    def ok(beta):
        lv = (beta - beta_prev) * log_l
        num = 2.0 * jax.scipy.special.logsumexp(lu + lv)
        den = jax.scipy.special.logsumexp(lu + 2.0 * lv)
        return num - den >= log_target

    return K.monotone_beta_bisect(ok, beta_prev, tol, log_l.dtype)


def _stack_rounds(outs):
    """Stack per-round (z, logL, logPi) tuples into one host chunk."""
    return tuple(
        np.stack([np.asarray(o[i]) for o in outs]) for i in range(3)
    )


class MCMCSampler(Sampler):
    """Base for MCMC samplers: posterior log-density + chain persistence."""

    chain_checkpoint_path = "checkpoint"
    chain_dataset_name = "mcmc_chain"

    def make_log_prob(self) -> Callable:
        """Posterior log-density in the preconditioned space.

        Parity: reference mcmc.py:112-126 — invert the preconditioning,
        evaluate logL + logPi, add the inverse-transform Jacobian.
        """
        precond = self.preconditioning_transform
        log_likelihood = self.log_likelihood
        log_prior = self.log_prior
        make_view = self._make_view

        def log_prob(z):
            if precond is None:
                x = z
                log_j = jnp.zeros(z.shape[0], dtype=z.dtype)
            else:
                x, log_j = precond.inverse(z)
            view = make_view(x)
            lp = (
                jnp.asarray(log_likelihood(view)).reshape(-1)
                + jnp.asarray(log_prior(view)).reshape(-1)
                + log_j
            )
            return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

        return log_prob

    def _finalize_chain(
        self,
        chain_z,
        burn_in: int,
        thin: int,
        checkpoint_file_path: str | None = None,
        checkpoint_every: int | None = None,
    ):
        """Invert preconditioning over the whole chain and wrap."""
        n_steps, n_walkers, d = chain_z.shape
        flat = chain_z.reshape(-1, d)
        x, _ = self.invert_preconditioning(flat)
        chain = x.reshape(n_steps, n_walkers, d)
        self._maybe_checkpoint_chain(
            chain, n_steps, checkpoint_file_path, checkpoint_every
        )
        samples = MCMCSamples.from_chain(
            chain,
            parameters=self.parameters,
            dtype=self.dtype,
        )
        samples.log_prior = self.evaluate_log_prior(samples.x)
        samples.log_likelihood = self.evaluate_log_likelihood(samples.x)
        return samples.post_process(burn_in=burn_in, thin=thin)

    # -- chain checkpointing (reference mcmc.py:128-191) --------------------

    def _maybe_checkpoint_chain(
        self,
        chain,
        iteration: int,
        file_path: str | None,
        every: int | None,
        extra_attrs: dict | None = None,
    ) -> None:
        """Persist the finished x-space chain when a path was routed in.

        Reference semantics (mcmc.py:169-192): ``checkpoint_every <= 0``
        disables saving; the full pre-burn/pre-thin chain is written so
        burn-in/thin decisions can be revisited at load time.
        """
        if file_path is None:
            return
        if every is not None and every <= 0:
            return
        self.save_chain_checkpoint(
            np.asarray(chain), int(iteration), str(file_path),
            extra_attrs=extra_attrs,
        )

    def save_chain_checkpoint(
        self,
        chain: np.ndarray,
        iteration: int,
        file_path: str,
        extra_attrs: dict | None = None,
    ) -> None:
        from ..io import AspireFile

        with AspireFile(file_path, "a") as f:
            grp = f.require_group(self.chain_checkpoint_path)
            if self.chain_dataset_name in grp:
                del grp[self.chain_dataset_name]
            ds = grp.create_dataset(
                self.chain_dataset_name, data=np.asarray(chain)
            )
            ds.attrs["iteration"] = iteration
            ds.attrs["shape"] = chain.shape
            for key, value in (extra_attrs or {}).items():
                ds.attrs[key] = value

    def load_chain_checkpoint(self, file_path: str):
        import h5py

        with h5py.File(file_path, "r") as f:
            ds = f[self.chain_checkpoint_path][self.chain_dataset_name]
            return np.asarray(ds[()]), int(ds.attrs["iteration"])


class PCNSampler(MCMCSampler):
    """(t)pCN MCMC on the posterior (minipcn parity)."""

    @track_calls
    def sample(
        self,
        n_samples: int,
        n_steps: int | None = None,
        step_fn: str = "tpcn",
        target_acceptance_rate: float = 0.234,
        nu: float = 5.0,
        adaptation_rate: float = 0.1,
        initial_step_size: float = 0.5,
        burn_in: int = 0,
        thin: int = 1,
        checkpoint_file_path: str | None = None,
        checkpoint_every: int | None = None,
    ) -> MCMCSamples:
        # No **kwargs: an open signature would silently swallow
        # misrouted options (sample_posterior only warns about unknown
        # kwargs when the sampler's signature is closed).
        n_steps = n_steps or 5 * self.dims
        init = self.draw_initial_samples(n_samples)
        z = self.fit_preconditioning_transform(init.x)
        # Mesh: walkers shard P('data') — pCN proposals/accepts are
        # elementwise per walker; the only cross-shard traffic is the
        # scalar mean-acceptance all-reduce the step-size adaptation
        # takes each step (single-controller; the stored chain is
        # gathered to host by _finalize_chain).
        if jax.process_count() == 1:
            z = self.shard_array(z)
        log_prob_fn = self.make_log_prob()
        ref = K.fit_gaussian_reference(z)
        if step_fn == "pcn":
            step = partial(
                K.pcn_step,
                log_prob_fn=log_prob_fn,
                ref=ref,
                target_acceptance=target_acceptance_rate,
                adaptation_rate=adaptation_rate,
            )
        elif step_fn == "tpcn":
            step = partial(
                K.tpcn_step,
                log_prob_fn=log_prob_fn,
                ref=ref,
                nu=nu,
                target_acceptance=target_acceptance_rate,
                adaptation_rate=adaptation_rate,
            )
        else:
            raise ValueError(f"Unknown step function: {step_fn}")

        state = K.ChainState(
            x=z,
            log_prob=log_prob_fn(z),
            key=self.next_key(),
            step_size=jnp.asarray(initial_step_size, dtype=z.dtype),
            n_accept=jnp.zeros(z.shape[0], dtype=z.dtype),
        )
        if self.target_is_jittable():
            run = jax.jit(
                lambda s: K.run_chain(step, s, n_steps, store_chain=True)
            )
            final, chain = run(state)
        else:
            chain_list = []
            final = state
            for _ in range(n_steps):
                final = step(final)
                chain_list.append(final.x)
            chain = jnp.stack(chain_list)
        # Chain evals + the chain-seeding log_prob_fn(z) call —
        # matches the SMC paths' exact accounting.
        self.n_likelihood_evaluations += (n_steps + 1) * z.shape[0]
        acceptance = float(jnp.mean(final.n_accept / n_steps))
        logger.info("Mean acceptance rate: %.3f", acceptance)
        samples = self._finalize_chain(
            chain, burn_in, thin,
            checkpoint_file_path=checkpoint_file_path,
            checkpoint_every=checkpoint_every,
        )
        samples.acceptance_rate = acceptance
        return samples


class EnsembleSampler(MCMCSampler):
    """Affine-invariant ensemble MCMC (emcee parity)."""

    @track_calls
    def sample(
        self,
        n_samples: int,
        n_steps: int = 100,
        a: float = 2.0,
        burn_in: int = 0,
        thin: int = 1,
        checkpoint_file_path: str | None = None,
        checkpoint_every: int | None = None,
    ) -> MCMCSamples:
        # No **kwargs — see PCNSampler.sample.
        init = self.draw_initial_samples(n_samples)
        z = self.fit_preconditioning_transform(init.x)
        # Mesh: walkers shard P('data'); the red-black stretch
        # partner picks gather across shards (single-controller).
        if jax.process_count() == 1:
            z = self.shard_array(z)
        log_prob_fn = self.make_log_prob()
        step = partial(K.stretch_step, log_prob_fn=log_prob_fn, a=a)
        state = K.ChainState(
            x=z,
            log_prob=log_prob_fn(z),
            key=self.next_key(),
            step_size=jnp.asarray(1.0, dtype=z.dtype),
            n_accept=jnp.zeros(z.shape[0], dtype=z.dtype),
        )
        if self.target_is_jittable():
            run = jax.jit(
                lambda s: K.run_chain(step, s, n_steps, store_chain=True)
            )
            final, chain = run(state)
        else:
            chain_list = []
            final = state
            for _ in range(n_steps):
                final = step(final)
                chain_list.append(final.x)
            chain = jnp.stack(chain_list)
        # Chain evals + the chain-seeding log_prob_fn(z) call —
        # matches the SMC paths' exact accounting.
        self.n_likelihood_evaluations += (n_steps + 1) * z.shape[0]
        acceptance = float(jnp.mean(final.n_accept / n_steps))
        logger.info("Mean acceptance rate: %.3f", acceptance)
        samples = self._finalize_chain(
            chain, burn_in, thin,
            checkpoint_file_path=checkpoint_file_path,
            checkpoint_every=checkpoint_every,
        )
        samples.acceptance_rate = acceptance
        samples.compute_autocorrelation_time()
        return samples


class ParallelTemperedSampler(MCMCSampler):
    """Parallel-tempered MCMC with replica-exchange swaps.

    Runs one stretch-move ensemble per inverse temperature beta_t on the
    tempered posterior ``beta * logL + logPi`` (prior kept cold, the
    standard PT convention for evidence estimation), with periodic
    nearest-neighbour swaps. Returns :class:`PTMCMCSamples` whose
    ``log_evidence_thermodynamic_integration`` / stepping-stone methods
    estimate logZ. All temperatures advance in one batched computation
    (temperature is just a leading axis on device).
    """

    def adaptive_beta_ladder(
        self,
        samples,
        target_efficiency: float = 0.9,
        max_n_temperatures: int = 32,
        min_n_temperatures: int = 2,
        min_beta_step: float = 1e-4,
        tol: float = 1e-8,
        ti_quadrature_tol: float = 0.1,
    ) -> np.ndarray:
        """Place PT rungs where the tempered path actually steepens.

        Walks beta from 0 to 1, each rung chosen by the conditional-ESS
        bisection (:func:`_bisect_pt_beta`) on a probe population — the
        same adaptive-ladder control the SMC driver uses, instead of
        the blind geometric default. Returns betas sorted descending
        with the hottest rung forced to 0 (stepping-stone convention).

        The CESS criterion controls adjacent-rung *overlap* (swap
        acceptance and stepping-stone bridging); a well-matched flow
        proposal can satisfy it with very few rungs, which leaves the
        thermodynamic-integration trapezoid under-resolved — the
        integrand ``E_beta[logL]`` is steepest near ``beta=0``, exactly
        where overlap is cheapest. A second, quadrature-driven stage
        therefore midpoint-splits segments until every segment's
        trapezoid-vs-midpoint discrepancy (probe importance-weighted
        rung means of ``logL``) is below ``ti_quadrature_tol`` nats and
        at least ``min_n_temperatures`` rungs exist, up to
        ``max_n_temperatures``. Splitting drives the extra rungs into
        the curved hot end where TI actually needs them, and overlap
        only improves under subdivision.
        """
        log_l = jnp.asarray(samples.log_likelihood)
        log_base = jnp.asarray(samples.log_prior) - jnp.asarray(
            samples.log_q
        )
        # Hard-constraint targets hand public callers probes with
        # -inf entries; 0 * -inf = NaN would otherwise poison every
        # CESS comparison (each bisection then returns beta_prev) and
        # every rung mean. Zero-posterior-mass states carry no ladder
        # information — drop them. (The internal sample() path already
        # filters via draw_initial_samples.)
        finite = np.asarray(jnp.isfinite(log_l) & jnp.isfinite(log_base))
        if not finite.any():
            raise ValueError(
                "adaptive_beta_ladder needs at least one probe sample "
                "with finite log_likelihood and finite "
                "log_prior - log_q; got none."
            )
        if not finite.all():
            log_l = log_l[finite]
            log_base = log_base[finite]
        betas = [0.0]
        while betas[-1] < 1.0 and len(betas) < max_n_temperatures:
            b = float(
                _bisect_pt_beta(
                    log_l,
                    log_base,
                    jnp.asarray(betas[-1], dtype=log_l.dtype),
                    target_efficiency,
                    tol,
                )
            )
            b = min(max(b, betas[-1] + min_beta_step), 1.0)
            betas.append(b)
        if betas[-1] < 1.0:
            logger.warning(
                "Adaptive PT ladder hit max_n_temperatures=%d before "
                "reaching beta=1 (target_efficiency=%.3f); forcing "
                "the cold rung — consider raising the cap or lowering "
                "the target.",
                max_n_temperatures,
                target_efficiency,
            )
            if len(betas) >= max_n_temperatures:
                # Honor the cap strictly: the last placed rung is the
                # closest to 1 anyway, so promote it rather than
                # exceeding the user's rung budget.
                betas[-1] = 1.0
            else:
                betas.append(1.0)
        # Quadrature refinement. Self-normalized IS estimate of the TI
        # integrand E_beta[logL] from the probe. Near beta=0 the
        # weights are prior-dominated and noisy, but this only steers
        # rung *placement* (never the estimator itself), and any bias
        # still points the splits at the steep hot end.
        log_l_np = np.asarray(log_l, dtype=np.float64)
        log_base_np = np.asarray(log_base, dtype=np.float64)

        def rung_mean(b: float) -> float:
            lw = log_base_np + b * log_l_np
            lw -= lw.max()
            w = np.exp(lw)
            return float(np.sum(w * log_l_np) / np.sum(w))

        def segment_error(lo: float, hi: float) -> float:
            # Trapezoid-vs-midpoint discrepancy: ~0 where E is linear
            # in beta, large where it curves (the hot end).
            e_mid = rung_mean(0.5 * (lo + hi))
            e_trap = 0.5 * (means[lo] + means[hi])
            return abs(e_trap - e_mid) * (hi - lo)

        means = {b: rung_mean(b) for b in betas}
        floor = min(min_n_temperatures, max_n_temperatures)
        while len(betas) < max_n_temperatures:
            gaps = np.diff(betas)
            splittable = np.nonzero(gaps >= 2 * min_beta_step)[0]
            if splittable.size == 0:
                break
            errs = np.array(
                [
                    segment_error(betas[i], betas[i + 1])
                    for i in splittable
                ]
            )
            if errs.max() > ti_quadrature_tol:
                i = int(splittable[np.argmax(errs)])
            elif len(betas) < floor:
                # Quadrature satisfied but the rung-density floor is
                # not: split the widest remaining segment.
                i = int(splittable[np.argmax(gaps[splittable])])
            else:
                break
            mid = 0.5 * (betas[i] + betas[i + 1])
            betas.insert(i + 1, mid)
            means[mid] = rung_mean(mid)
        return np.asarray(betas[::-1], dtype=float)

    def refine_ladder_from_run(
        self,
        samples: PTMCMCSamples,
        n_temperatures: int,
        discard_fraction: float = 0.5,
        min_beta_step: float = 1e-4,
        max_n_temperatures: int | None = None,
        swap_floor: float = 0.15,
    ) -> np.ndarray:
        """Re-place PT rungs from a pilot run's *measured* rung means.

        The flow probe behind :meth:`adaptive_beta_ladder` cannot see
        the prior-dominated hot end (importance weights from a
        posterior-matched flow to the beta~0 targets collapse onto a
        handful of tail draws), but a pilot PT run measures
        ``E_beta[logL]`` at every rung directly — the ``beta=0`` chain
        samples the prior itself. New rungs are placed at equal
        increments of the measured integrand (equal-``dE`` spacing, the
        classic TI discipline of Calderhead & Girolami 2009): betas
        where the monotone interpolant of the measured rung means
        crosses ``n_temperatures`` equally spaced levels between
        ``E_0[logL]`` and ``E_1[logL]``. For a convex integrand this
        equalizes per-segment trapezoid error, concentrating rungs in
        the curved hot end.

        The first ``discard_fraction`` of pilot rounds is dropped as
        burn-in; rungs closer than ``min_beta_step`` are merged.
        Returns betas sorted descending with endpoints pinned to 1, 0.

        When the pilot carries per-pair ``swap_acceptance``, any
        adjacent pair below ``swap_floor`` additionally gets its
        midpoint inserted. This is deliberately independent of the
        equal-``dE`` criterion: swap acceptance depends on the OVERLAP
        of the two rungs' logL *distributions*, so a pair can have a
        tiny mean increment (equal-dE sees nothing) yet exchange
        rarely when the within-rung logL variance is large.
        """
        t_dim, r_dim, n_dim = samples.chain_shape
        ll = np.asarray(
            samples.log_likelihood, dtype=np.float64
        ).reshape(t_dim, r_dim, n_dim)
        start = min(int(r_dim * discard_fraction), r_dim - 1)
        tail = ll[:, start:]
        finite = np.isfinite(tail)
        n_finite = finite.sum(axis=(1, 2))
        sums = np.where(finite, tail, 0.0).sum(axis=(1, 2))
        means = np.where(
            n_finite > 0, sums / np.maximum(n_finite, 1), np.nan
        )
        betas_desc = np.asarray(samples.betas, dtype=np.float64)
        # Swap-overlap rescue: midpoints of pilot pairs whose measured
        # DEO swap acceptance fell below the floor. Computed before any
        # early return — the diagnostic is actionable even when the
        # rung means are flat or unmeasurable. These bypass the
        # equal-dE redundancy check: low acceptance at a small-dE pair
        # means the logL distributions barely overlap despite the close
        # means (the equal-dE blind spot).
        swap_acc = getattr(samples, "swap_acceptance", None)
        rescue = []
        if (
            swap_acc is not None
            and len(swap_acc) == len(betas_desc) - 1
        ):
            for i, acc in enumerate(np.asarray(swap_acc, dtype=float)):
                if np.isfinite(acc) and acc < swap_floor:
                    rescue.append(
                        0.5 * (betas_desc[i] + betas_desc[i + 1])
                    )
        rescue_set = {float(b) for b in rescue}
        order = np.argsort(betas_desc)
        b_asc = betas_desc[order]
        e_asc = means[order]
        valid = np.isfinite(e_asc)
        b_asc, e_asc = b_asc[valid], e_asc[valid]
        if len(b_asc) < 2 or e_asc[-1] - e_asc[0] < 1e-9:
            # Flat or unmeasurable integrand: the pilot ladder is
            # already as good as any — but the rung budget still binds;
            # with no integrand to rank rungs by, thin evenly by index
            # (endpoints land on indices 0 and len-1, so they survive).
            # Rescue midpoints are reserved budget: the pilot rungs are
            # thinned to (cap - #rescue) first so the rescued pairs
            # keep their new rung.
            cap = (
                max(max_n_temperatures, 2)
                if max_n_temperatures is not None
                else None
            )
            base = betas_desc
            resc = np.asarray(
                [b for b in rescue if 0.0 < b < 1.0], dtype=float
            )
            if cap is not None and len(base) > max(cap - resc.size, 2):
                idx = np.unique(
                    np.round(
                        np.linspace(
                            0, len(base) - 1, max(cap - resc.size, 2)
                        )
                    ).astype(int)
                )
                base = base[idx]
            ladder = np.unique(np.concatenate([base, resc]))[::-1]
            if cap is not None and len(ladder) > cap:
                # Rescue alone exceeded the budget: thin its interior.
                inner = ladder[1:-1]
                idx = np.unique(
                    np.round(
                        np.linspace(0, len(inner) - 1, cap - 2)
                    ).astype(int)
                )
                ladder = np.concatenate(
                    [ladder[:1], inner[idx], ladder[-1:]]
                )
            return np.asarray(ladder, dtype=float)
        # Monotone envelope: E_beta[logL] is nondecreasing in beta in
        # expectation; pilot noise must not fold the interpolant back.
        e_asc = np.maximum.accumulate(e_asc)
        levels = np.linspace(e_asc[0], e_asc[-1], n_temperatures)
        new_b = np.interp(levels[1:-1], e_asc, b_asc)
        # Union with the pilot rungs: equal-dE alone would abandon the
        # pilot's cold-side rungs whenever one hot segment holds most
        # of the integrand's range (the interpolant is only piecewise
        # linear — the measured grid is still the best cold-side
        # knowledge we have), while subdivision improves both swap
        # overlap and quadrature monotonically. New rungs that do not
        # advance the measured integrand past an existing rung by a
        # quarter level are redundant and dropped.
        e_step = (e_asc[-1] - e_asc[0]) / max(n_temperatures - 1, 1)
        keep_new = [
            b
            for b in new_b
            if np.abs(
                np.interp(b, b_asc, e_asc) - e_asc
            ).min() > 0.25 * e_step
        ]
        union = np.sort(np.concatenate([b_asc, keep_new, rescue]))
        ladder = [0.0]
        for b in union:
            if b - ladder[-1] >= min_beta_step and b <= 1.0 - min_beta_step:
                ladder.append(float(b))
        ladder.append(1.0)
        if max_n_temperatures is not None:
            # The union can exceed the user's rung budget; repeatedly
            # drop the interior rung spanning the flattest stretch of
            # the measured integrand (its removal costs the least
            # quadrature resolution and the most-overlapped swap pair).
            # The 0/1 endpoints are never dropped, so the effective
            # floor of the budget is 2. Rescue midpoints sit where the
            # rung means are flattest BY CONSTRUCTION (they were added
            # because acceptance, not dE, flagged the pair), so the
            # flattest-span rule would delete them first — they are
            # protected unless nothing else remains.
            while len(ladder) > max(max_n_temperatures, 2):
                e_lad = np.interp(ladder, b_asc, e_asc)
                spans = e_lad[2:] - e_lad[:-2]  # span bridged by rung i
                drop = None
                for j in np.argsort(spans):
                    if float(ladder[1 + int(j)]) not in rescue_set:
                        drop = 1 + int(j)
                        break
                if drop is None:
                    drop = 1 + int(np.argmin(spans))
                del ladder[drop]
        return np.asarray(ladder[::-1], dtype=float)

    def _sample_replicated(
        self, k: int, n_samples: int, kwargs: dict
    ) -> PTMCMCSamples:
        """Run ``k`` independent PT replicates; report the replicate
        mean stepping-stone logZ with the between-replicate bar.

        Each replicate continues the sampler's key stream (independent
        draws) and re-runs any ladder adaptation from scratch, so the
        replicates are fully independent — including the ladder. The
        reported error follows the SMC replicate tier's consistency
        scaling: ``std/sqrt(k)`` when the replicates agree with their
        own single-run bars, the un-shrunk dispersion when they
        scatter beyond them (shared systematics).
        """
        def run_one():
            s = self.sample(n_samples, **kwargs)
            lz, err = s.log_evidence_stepping_stone()
            return s, lz, err

        return self._replicate_evidence(k, run_one, "PT stepping-stone")

    #: HDF5 group holding the resumable mid-run PT state.
    pt_state_path = "checkpoint/pt_state"

    def save_pt_state(
        self,
        file_path: str,
        *,
        betas,
        round_keys,
        rounds_done: int,
        swap_every: int,
        n_steps: int,
        n_samples: int,
        a: float,
        carry,
        chunks,
    ) -> None:
        """Persist a resumable mid-run PT state.

        ``carry`` is the live scan carry (z, logL, logPi, move_acc,
        swap_acc); ``chunks`` the per-chunk (chain, chain_ll, chain_lp)
        outputs so far. The full round-key array is saved so a resumed
        run replays the exact remaining PRNG stream — a completed
        resume is bit-identical to the uninterrupted run.

        Crash-safe: the state is written to a sibling group first and
        swapped in with an HDF5 move, so a kill mid-save leaves either
        the previous complete state or the new one (``load_pt_state``
        checks both locations). Only process 0 writes on
        multi-controller runs.
        """
        if jax.process_index() != 0:
            return
        from ..io import AspireFile

        new_path = self.pt_state_path + "_new"
        z, ll, lp, move_acc, swap_acc = carry
        with self.profiler.phase("pt/checkpoint"), AspireFile(
            file_path, "a"
        ) as f:
            if new_path in f:
                del f[new_path]
            g = f.require_group(new_path)
            g.create_dataset("z", data=np.asarray(z))
            g.create_dataset("ll", data=np.asarray(ll))
            g.create_dataset("lp", data=np.asarray(lp))
            g.create_dataset("move_acc", data=np.asarray(move_acc))
            g.create_dataset("swap_acc", data=np.asarray(swap_acc))
            g.create_dataset("betas", data=np.asarray(betas, float))
            g.create_dataset(
                "round_keys",
                data=np.asarray(jax.random.key_data(round_keys)),
            )
            for name, i in (("chain", 0), ("chain_ll", 1),
                            ("chain_lp", 2)):
                g.create_dataset(
                    name,
                    data=np.concatenate(
                        [np.asarray(c[i]) for c in chunks], axis=0
                    ),
                )
            g.attrs["rounds_done"] = int(rounds_done)
            g.attrs["swap_every"] = int(swap_every)
            g.attrs["n_steps"] = int(n_steps)
            g.attrs["n_samples"] = int(n_samples)
            g.attrs["a"] = float(a)
            g.attrs["prng_impl"] = self.key_impl_name()
            # Swap the complete new state in (metadata-level move: the
            # window with neither group present is tiny and covered by
            # the _new fallback in load_pt_state).
            if self.pt_state_path in f:
                del f[self.pt_state_path]
            f.move(new_path, self.pt_state_path)

    def load_pt_state(self, file_path: str) -> dict:
        import h5py

        if not isinstance(file_path, (str, bytes, os.PathLike)):
            raise TypeError(
                "PT resume_from expects a checkpoint file path; got "
                f"{type(file_path).__name__}."
            )
        with h5py.File(file_path, "r") as f:
            path = self.pt_state_path
            if path not in f:
                if self.pt_state_path + "_new" in f:
                    # A save was killed between the delete and the
                    # move; the staged group is complete.
                    path = self.pt_state_path + "_new"
                else:
                    raise ValueError(
                        f"{file_path!r} holds no resumable PT state "
                        f"({self.pt_state_path} missing). Mid-run "
                        "state checkpoints are written only when "
                        "sample() ran with state_checkpoint_every > 0 "
                        "and preconditioning=None."
                    )
            g = f[path]
            state = {k: np.asarray(g[k][()]) for k in g.keys()}
            # Attrs come back as numpy scalars; coerce to Python
            # scalars — a strongly-typed np.float64 `a` would promote
            # the whole stretch proposal to f64 under x64 and trip the
            # f64->f32 scatter cast.
            for k in g.attrs.keys():
                v = g.attrs[k]
                if isinstance(v, np.floating):
                    v = float(v)
                elif isinstance(v, np.integer):
                    v = int(v)
                state[k] = v
        saved_impl = str(state.get("prng_impl", "threefry2x32"))
        current_impl = self.key_impl_name()
        if saved_impl != current_impl:
            raise ValueError(
                f"PT state was saved under PRNG impl {saved_impl!r} "
                f"but this sampler's key stream uses {current_impl!r}; "
                "resuming would mix two incompatible bit streams. "
                f"Construct the sampler with prng_impl={saved_impl!r} "
                "(or the matching JAX_DEFAULT_PRNG_IMPL) to resume."
            )
        state["round_keys"] = jax.random.wrap_key_data(
            jnp.asarray(state["round_keys"]), impl=saved_impl
        )
        return state

    @track_calls
    def sample(
        self,
        n_samples: int,
        n_steps: int = 100,
        n_temperatures: int = 8,
        betas: np.ndarray | str | None = None,
        swap_every: int = 1,
        a: float = 2.0,
        burn_in: int = 0,
        thin: int = 1,
        ladder_target_efficiency: float = 0.9,
        max_n_temperatures: int = 32,
        ladder_probe_size: int = 4096,
        ladder_pilot_steps: int = 0,
        ladder_pilot_iterations: int = 1,
        checkpoint_file_path: str | None = None,
        checkpoint_every: int | None = None,
        state_checkpoint_every: int | None = None,
        resume_from: str | None = None,
        n_replicates: int | None = None,
        _init_x: np.ndarray | None = None,
    ) -> PTMCMCSamples:
        # No **kwargs — see PCNSampler.sample. checkpoint_every gates
        # the FINAL chain save (reference semantics, as in the other
        # MCMC samplers); state_checkpoint_every > 0 additionally
        # chunks the run and saves a resumable mid-run state every k
        # swap rounds — a separate knob because the facade defaults
        # checkpoint_every=1, which must not silently break a
        # 1000-round scan into 1000 dispatches.
        if n_steps < swap_every:
            raise ValueError(
                f"n_steps ({n_steps}) must be at least swap_every "
                f"({swap_every}) — fewer steps than one swap round "
                "would run no rounds at all."
            )
        if n_replicates is not None and n_replicates > 1:
            # Same replicate tier (and consistency-scaled bar) as the
            # SMC sampler: between-run stepping-stone spread covers
            # seed-dependent bias no single-run bar can see.
            if (
                resume_from is not None
                or checkpoint_file_path is not None
            ):
                raise ValueError(
                    "n_replicates runs independent replicates; combine "
                    "it with checkpointing/resume per replicate "
                    "manually instead."
                )
            return self._sample_replicated(
                n_replicates,
                n_samples,
                dict(
                    n_steps=n_steps,
                    n_temperatures=n_temperatures,
                    betas=betas,
                    swap_every=swap_every,
                    a=a,
                    burn_in=burn_in,
                    thin=thin,
                    ladder_target_efficiency=ladder_target_efficiency,
                    max_n_temperatures=max_n_temperatures,
                    ladder_probe_size=ladder_probe_size,
                    ladder_pilot_steps=ladder_pilot_steps,
                    ladder_pilot_iterations=ladder_pilot_iterations,
                ),
            )
        pt_resume = None
        if resume_from is not None:
            if jax.process_count() > 1:
                raise ValueError(
                    "PT resume_from is single-controller only (the "
                    "chunked resume path gathers chains to host)."
                )
            pt_resume = self.load_pt_state(resume_from)
            mismatches = {
                "n_steps": (int(pt_resume["n_steps"]), n_steps),
                "swap_every": (
                    int(pt_resume["swap_every"]), swap_every
                ),
                "n_samples": (
                    int(pt_resume["n_samples"]), n_samples
                ),
                "a": (float(pt_resume.get("a", a)), float(a)),
            }
            bad = {k: v for k, v in mismatches.items() if v[0] != v[1]}
            if bad:
                raise ValueError(
                    "resume_from state disagrees with this call's "
                    f"configuration: {bad} (saved, requested)."
                )
            # The saved ladder IS the run's ladder: adaptation and
            # pilots already happened before the first chunk.
            betas = np.asarray(pt_resume["betas"], dtype=float)
            ladder_pilot_steps = 0
            logger.info(
                "Resuming PT sampling at round %d/%d from %s",
                int(pt_resume["rounds_done"]),
                n_steps // swap_every,
                resume_from,
            )
        probe = None
        probe_full = None
        if isinstance(betas, str):
            if betas != "adaptive":
                raise ValueError(
                    f"Unknown betas option {betas!r}: pass an array, "
                    "None (geometric ladder) or 'adaptive'."
                )
            # CESS and the importance-weighted rung means need a probe
            # large enough to resolve the prior-dominated hot end —
            # n_samples alone (often tens of chains) is far too small.
            # The probe is recycled as chain-initial populations below
            # (pilot rungs first, then the main run's cold rung), so
            # its target evaluations are not wasted.
            with self.profiler.phase("pt/adapt_ladder"):
                probe_full = self.draw_initial_samples(
                    max(n_samples, ladder_probe_size)
                )
                betas = self.adaptive_beta_ladder(
                    probe_full,
                    target_efficiency=ladder_target_efficiency,
                    max_n_temperatures=max_n_temperatures,
                    # n_temperatures doubles as the floor: TI
                    # quadrature needs rung density even when overlap
                    # does not.
                    min_n_temperatures=n_temperatures,
                )
            probe = probe_full[:n_samples]
        elif betas is None:
            # Geometric ladder beta_t = (1/2)^t, hottest forced to 0 for
            # the stepping-stone estimator.
            betas = np.concatenate(
                [0.5 ** np.arange(n_temperatures - 1), [0.0]]
            )
        if ladder_pilot_steps > 0:
            # Two-phase adaptation on ANY starting ladder (adaptive,
            # explicit array, or geometric): a short pilot run, then
            # equal-dE re-placement from the rung means it actually
            # measured (a flow probe cannot see the prior-dominated
            # hot end; the pilot's beta=0 chain can). `__wrapped__`
            # skips @track_calls so the pilot never pollutes the
            # recorded call history that checkpoint resume replays.
            # The pilot seeds its rungs from the adaptive probe when
            # one exists (topped up with fresh draws only when it runs
            # out), and the main run below continues from the pilot's
            # final states — warm starts, no re-paid likelihood
            # evaluations.
            #
            # ladder_pilot_iterations > 1 repeats the
            # (pilot -> re-place) cycle on the refined ladder: for
            # pathologically peaked integrands one pilot measures
            # E_beta[logL] on rungs that are themselves badly
            # placed, so its equal-dE solution is still biased —
            # re-measuring on the refined rungs converges the fixed
            # point. Each cycle warm-starts from the previous
            # pilot's final states, and the loop exits early once
            # the ladder stops moving (same rung count, every rung
            # within min_beta_step of the previous cycle's).
            betas = np.sort(np.asarray(betas, dtype=float))[::-1]
            need = n_samples * len(betas)
            if probe_full is not None:
                probe_x = np.asarray(probe_full.x)
            else:
                probe_x = np.empty((0, self.dims))
            if probe_x.shape[0] < need:
                extra = self.draw_initial_samples(
                    need - probe_x.shape[0]
                )
                probe_x = np.concatenate(
                    [probe_x, np.asarray(extra.x)], axis=0
                )
            pilot_init = probe_x[:need]
            for pilot_round in range(max(ladder_pilot_iterations, 1)):
                with self.profiler.phase("pt/pilot"):
                    pilot = ParallelTemperedSampler.sample.__wrapped__(
                        self,
                        n_samples,
                        n_steps=ladder_pilot_steps,
                        betas=np.asarray(betas),
                        swap_every=min(swap_every, ladder_pilot_steps),
                        a=a,
                        _init_x=pilot_init,
                    )
                pilot_betas = np.asarray(pilot.betas, dtype=float)
                refined = self.refine_ladder_from_run(
                    pilot,
                    n_temperatures=max(n_temperatures, len(betas)),
                    max_n_temperatures=max_n_temperatures,
                )
                logger.info(
                    "Pilot-refined PT ladder (cycle %d, %d rungs):"
                    " %s",
                    pilot_round + 1,
                    len(refined),
                    np.array2string(np.asarray(refined), precision=4),
                )
                # Each refined rung starts from the final pilot
                # states of its nearest pilot rung (betas are
                # sorted before use, so order here only needs to
                # match the sort).
                final = np.asarray(pilot.chain)[:, -1]  # (T_p, N, d)
                betas_sorted = np.sort(np.asarray(refined))[::-1]
                nearest = np.argmin(
                    np.abs(
                        pilot_betas[None, :] - betas_sorted[:, None]
                    ),
                    axis=1,
                )
                pilot_init = final[nearest].reshape(-1, self.dims)
                converged = len(refined) == len(
                    betas
                ) and np.allclose(
                    np.sort(refined),
                    np.sort(np.asarray(betas, dtype=float)),
                    atol=1e-4,
                )
                betas = refined
                if converged:
                    break
            _init_x = pilot_init
            probe = None
        betas = np.sort(np.asarray(betas, dtype=float))[::-1].copy()
        n_temps = len(betas)
        betas_arr = jnp.asarray(betas)

        # The transform actually used by THIS run: a local, never a
        # mutation of sampler state (the facade caches and reuses the
        # sampler instance across calls).
        precond = self.preconditioning_transform
        if pt_resume is not None:
            # The carry (z, logL, logPi) is restored below; no initial
            # draws (or their target evaluations) are needed. Mid-run
            # states are only ever SAVED under preconditioning=None
            # (see save gate below), so the saved z ARE x-space states:
            # a transform configured on the resuming sampler (e.g. the
            # facade's default) is provably not the one the run used —
            # ignore it for this call rather than refit it into a
            # mismatched z-space.
            if precond is not None:
                logger.warning(
                    "PT resume: the checkpointed run used no "
                    "preconditioning transform; ignoring the "
                    "configured one for this call so the saved states "
                    "keep their meaning."
                )
                precond = None
            z0 = None
        else:
            if _init_x is not None:
                init_x = jnp.asarray(_init_x).reshape(-1, self.dims)
                if init_x.shape[0] != n_samples * n_temps:
                    raise ValueError(
                        f"_init_x supplies {init_x.shape[0]} states; "
                        f"the run needs n_temperatures * n_samples = "
                        f"{n_temps * n_samples}."
                    )
            elif probe is not None and n_temps > 1:
                rest = self.draw_initial_samples(
                    n_samples * (n_temps - 1)
                )
                init_x = type(probe).concatenate([probe, rest]).x
            elif probe is not None:
                init_x = probe.x
            else:
                init_x = self.draw_initial_samples(
                    n_samples * n_temps
                ).x
            z0 = self.fit_preconditioning_transform(init_x)
            z0 = z0.reshape(n_temps, n_samples, self.dims)
            # fit_preconditioning_transform may have (re)fitted it.
            precond = self.preconditioning_transform

        log_likelihood = self.log_likelihood
        log_prior = self.log_prior
        make_view = self._make_view

        def logl_logp(z_flat):
            if precond is None:
                x = z_flat
                log_j = jnp.zeros(z_flat.shape[0], dtype=z_flat.dtype)
            else:
                x, log_j = precond.inverse(z_flat)
            view = make_view(x)
            log_l = jnp.asarray(log_likelihood(view)).reshape(-1)
            log_p = jnp.asarray(log_prior(view)).reshape(-1) + log_j
            return log_l, log_p

        half = n_samples // 2
        blocks = ((0, half, half, n_samples), (half, n_samples, 0, half))

        def one_move(z, ll, lp, k_move, bt):
            """One tempered red-black stretch move, carrying (logL,
            logPi) so replica swaps never re-evaluate the target. Pure
            jnp ops: runs traced (under vmap/scan) for jittable targets
            and EAGERLY for host-numpy targets."""
            keys = jax.random.split(k_move, 6)
            n_acc = jnp.zeros((), z.dtype)
            for b, (m0, m1, o0, o1) in enumerate(blocks):
                n_move, n_other = m1 - m0, o1 - o0
                idx = jnp.arange(m0, m1)
                pick = jax.random.randint(
                    keys[3 * b], (n_move,), 0, n_other
                )
                partners = z[o0 + pick]
                u = jax.random.uniform(
                    keys[3 * b + 1], (n_move,), dtype=z.dtype
                )
                g = (
                    u * (jnp.sqrt(a) - jnp.sqrt(1 / a))
                    + jnp.sqrt(1 / a)
                ) ** 2
                z_move = z[idx]
                z_prop = partners + g[:, None] * (z_move - partners)
                ll_prop, lp_prop = logl_logp(z_prop)
                t_prop = bt * ll_prop + lp_prop
                t_curr = bt * ll[idx] + lp[idx]
                # A NaN current density (e.g. beta=0 with logL=-inf)
                # must not freeze the walker: treat it as -inf so
                # any finite proposal is accepted.
                t_curr = jnp.where(jnp.isnan(t_curr), -jnp.inf, t_curr)
                log_alpha = (
                    (self.dims - 1) * jnp.log(g) + t_prop - t_curr
                )
                log_alpha = jnp.where(
                    jnp.isnan(log_alpha), -jnp.inf, log_alpha
                )
                accept = (
                    jnp.log(
                        jax.random.uniform(
                            keys[3 * b + 2], (n_move,)
                        )
                    )
                    < log_alpha
                )
                z = z.at[idx].set(
                    jnp.where(accept[:, None], z_prop, z_move)
                )
                ll = ll.at[idx].set(
                    jnp.where(accept, ll_prop, ll[idx])
                )
                lp = lp.at[idx].set(
                    jnp.where(accept, lp_prop, lp[idx])
                )
                n_acc = n_acc + jnp.sum(accept.astype(z.dtype))
            return z, ll, lp, n_acc

        def tempered_stretch_sweep(zt, llt, lpt, kt, bt):
            """``swap_every`` moves at ONE temperature. vmapped over
            the temperature axis for jittable targets, so all rungs
            advance in one batched computation (a T=64 ladder compiles
            the same program as T=8). Also returns the accepted-move
            count at this rung (the per-rung acceptance diagnostic)."""

            def body(carry, k_move):
                z, ll, lp, acc = carry
                z, ll, lp, n_acc = one_move(z, ll, lp, k_move, bt)
                return (z, ll, lp, acc + n_acc), None

            move_keys = jax.random.split(kt, swap_every)
            acc0 = jnp.zeros((), zt.dtype)
            (zt, llt, lpt, acc), _ = jax.lax.scan(
                body, (zt, llt, lpt, acc0), move_keys
            )
            return zt, llt, lpt, acc

        # Even/odd (DEO) replica-exchange passes: all disjoint adjacent
        # pairs swap in one vectorized step, so a sweep is two gathers
        # regardless of the number of temperatures.
        swap_starts = {
            0: np.arange(0, n_temps - 1, 2),
            1: np.arange(1, n_temps - 1, 2),
        }

        def swap_pass(z, log_l, log_p, swap_acc, key, parity):
            lo = swap_starts[parity]
            if lo.size == 0:
                return z, log_l, log_p, swap_acc
            hi = lo + 1
            d_beta = betas_arr[lo] - betas_arr[hi]
            log_alpha = -d_beta[:, None] * (log_l[lo] - log_l[hi])
            u = jnp.log(
                jax.random.uniform(key, (lo.size, n_samples))
            )
            swap = u < log_alpha

            def exchange(arr, mask):
                a_lo, a_hi = arr[lo], arr[hi]
                arr = arr.at[lo].set(jnp.where(mask, a_hi, a_lo))
                return arr.at[hi].set(jnp.where(mask, a_lo, a_hi))

            z = exchange(z, swap[..., None])
            log_l = exchange(log_l, swap)
            log_p = exchange(log_p, swap)
            swap_acc = swap_acc.at[lo].add(
                jnp.sum(swap, axis=1).astype(swap_acc.dtype)
            )
            return z, log_l, log_p, swap_acc

        # Mesh: shard the walker axis of the (T, n, d) ensemble so the
        # tempered sweeps (where every likelihood evaluation happens)
        # run SPMD across devices. Replica swaps exchange rungs
        # elementwise per walker, so they stay device-local; only the
        # in-rung stretch partner gathers cross shards.
        pt_constraint = None
        if self.mesh is not None and self.target_is_jittable():
            if n_samples % self.mesh.devices.size == 0:
                from ..parallel.mesh import walker_sharding

                pt_constraint = walker_sharding(self.mesh)
            else:
                logger.debug(
                    "n_samples (%d) does not tile the %d-device mesh;"
                    " PT runs without walker sharding.",
                    n_samples,
                    self.mesh.devices.size,
                )

        def _pin(z, log_l, log_p):
            if pt_constraint is None:
                return z, log_l, log_p
            return (
                jax.lax.with_sharding_constraint(z, pt_constraint),
                jax.lax.with_sharding_constraint(log_l, pt_constraint),
                jax.lax.with_sharding_constraint(log_p, pt_constraint),
            )

        def one_round(carry, key_round):
            z, log_l, log_p, move_acc, swap_acc = carry
            step_key, even_key, odd_key = jax.random.split(key_round, 3)
            step_keys = jax.random.split(step_key, n_temps)
            z, log_l, log_p, acc_t = jax.vmap(tempered_stretch_sweep)(
                z, log_l, log_p, step_keys, betas_arr
            )
            move_acc = move_acc + acc_t
            z, log_l, log_p, swap_acc = swap_pass(
                z, log_l, log_p, swap_acc, even_key, 0
            )
            z, log_l, log_p, swap_acc = swap_pass(
                z, log_l, log_p, swap_acc, odd_key, 1
            )
            z, log_l, log_p = _pin(z, log_l, log_p)
            # Stack densities with the positions: the chain's (logL,
            # logPi) are carried invariants, so storing them avoids a
            # full re-evaluation pass over every stored state (which
            # would cost n_rounds * T * n extra target evals — up to
            # 2x the chain itself at swap_every=1).
            return (
                (z, log_l, log_p, move_acc, swap_acc),
                (z, log_l, log_p),
            )

        def initial_densities(z):
            ll, lp = logl_logp(z.reshape(-1, self.dims))
            return (
                ll.reshape(n_temps, n_samples),
                lp.reshape(n_temps, n_samples),
            )

        n_rounds = n_steps // swap_every
        # Mid-run checkpointing: state_checkpoint_every > 0 chunks the
        # run at round granularity and saves a resumable state after
        # every chunk. Restricted to preconditioning=None (the saved
        # states live in the transform's z-space, which a fresh refit
        # would not reproduce) and single-controller runs (one HDF5
        # writer; the guard mirrors the device ladder's).
        save_every = None
        if (
            checkpoint_file_path is not None
            and state_checkpoint_every
            and int(state_checkpoint_every) > 0
        ):
            if precond is not None:
                logger.warning(
                    "Mid-run PT state checkpoints require "
                    "preconditioning=None; only the final chain will "
                    "be saved."
                )
            elif jax.process_count() > 1:
                logger.warning(
                    "Mid-run PT state checkpoints are single-"
                    "controller only; only the final chain will be "
                    "saved."
                )
            else:
                save_every = int(state_checkpoint_every)
        if pt_resume is not None:
            round_keys = pt_resume["round_keys"]
            rounds_done = int(pt_resume["rounds_done"])
            chunks = (
                [(
                    pt_resume["chain"],
                    pt_resume["chain_ll"],
                    pt_resume["chain_lp"],
                )]
                if rounds_done
                else []
            )
            carry0 = (
                jnp.asarray(pt_resume["z"]),
                jnp.asarray(pt_resume["ll"]),
                jnp.asarray(pt_resume["lp"]),
                jnp.asarray(pt_resume["move_acc"]),
                jnp.asarray(pt_resume["swap_acc"]),
            )
            new_evals = 0
        else:
            round_keys = jax.random.split(self.next_key(), n_rounds)
            rounds_done = 0
            chunks = []
            carry0 = None  # built on device below
            new_evals = n_temps * n_samples  # initialization pass
        if self.target_is_jittable():

            @jax.jit
            def init_carry(z):
                if pt_constraint is not None:
                    z = jax.lax.with_sharding_constraint(
                        z, pt_constraint
                    )
                ll, lp = initial_densities(z)
                z, ll, lp = _pin(z, ll, lp)
                return (
                    z,
                    ll,
                    lp,
                    jnp.zeros((n_temps,), z.dtype),
                    jnp.zeros((max(n_temps - 1, 0),), z.dtype),
                )

            if save_every is None and pt_resume is None:
                # Fast path: the whole run is ONE fused computation and
                # the chain stays a (possibly sharded) device array —
                # no host gather, works on multi-controller meshes.
                @jax.jit
                def run_all(z, keys):
                    carry, outs = jax.lax.scan(
                        one_round, init_carry(z), keys
                    )
                    return outs, carry[3], carry[4]

                with self.profiler.phase("pt/rounds"):
                    (chain, chain_ll, chain_lp), move_acc, swap_acc = (
                        run_all(z0, round_keys)
                    )
                    # Attribute device execution to this phase, not to
                    # whatever first materializes the arrays (the SMC
                    # sampler pairs compute with explicit sync phases
                    # for the same reason).
                    jax.block_until_ready(chain_ll)
                new_evals += n_rounds * swap_every * n_temps * n_samples
                if pt_constraint is not None and jax.process_count() > 1:
                    # Walker-SHARDED multi-controller run: the outputs
                    # span non-addressable devices, but everything
                    # downstream (evidence estimators, burn-in/thin,
                    # cold-chain extraction) is host numpy. Gather the
                    # global chain to every host — PT walker counts are
                    # modest, so the (rounds, T, n, d) array is small
                    # next to an SMC population. (An UNSHARDED
                    # multi-controller run computes identical
                    # host-local replicas per process, for which
                    # tiled=True would wrongly concatenate the rounds
                    # axis — hence the pt_constraint gate.)
                    from jax.experimental import multihost_utils

                    chain, chain_ll, chain_lp = (
                        multihost_utils.process_allgather(
                            (chain, chain_ll, chain_lp), tiled=True
                        )
                    )
            else:
                # Chunked path (mid-run state saves and/or resume):
                # chunk boundaries gather to host for the HDF5 write.
                @jax.jit
                def run_rounds(carry, keys):
                    return jax.lax.scan(one_round, carry, keys)

                carry = carry0 if carry0 is not None else init_carry(z0)
                r = rounds_done
                while r < n_rounds:
                    step = (
                        n_rounds - r
                        if save_every is None
                        else min(save_every, n_rounds - r)
                    )
                    with self.profiler.phase("pt/rounds"):
                        carry, outs = run_rounds(
                            carry, round_keys[r:r + step]
                        )
                        # The host gather blocks on the pending rounds:
                        # doing it inside the phase keeps compute out
                        # of pt/checkpoint.
                        chunks.append(
                            tuple(np.asarray(o) for o in outs)
                        )
                    r += step
                    new_evals += (
                        step * swap_every * n_temps * n_samples
                    )
                    # Also saved on completion: resuming a finished run
                    # rebuilds the samples without redoing any rounds.
                    if save_every is not None:
                        self.save_pt_state(
                            checkpoint_file_path,
                            betas=betas,
                            round_keys=round_keys,
                            rounds_done=r,
                            swap_every=swap_every,
                            n_steps=n_steps,
                            n_samples=n_samples,
                            a=a,
                            carry=carry,
                            chunks=chunks,
                        )
                chain = np.concatenate(
                    [c[0] for c in chunks], axis=0
                )
                chain_ll = np.concatenate(
                    [c[1] for c in chunks], axis=0
                )
                chain_lp = np.concatenate(
                    [c[2] for c in chunks], axis=0
                )
                move_acc, swap_acc = carry[3], carry[4]
        else:
            # Host-target fallback: the user callable cannot be traced,
            # so no vmap/scan — plain Python loops calling the SAME
            # one_move / swap_pass math eagerly (identical key usage,
            # so the two paths draw the same random streams).
            if carry0 is not None:
                z, ll, lp, move_acc, swap_acc = carry0
            else:
                z, (ll, lp) = z0, initial_densities(z0)
                move_acc = jnp.zeros((n_temps,), z.dtype)
                swap_acc = jnp.zeros((max(n_temps - 1, 0),), z.dtype)
            outs = []
            for r in range(rounds_done, n_rounds):
                key_round = round_keys[r]
                step_key, even_key, odd_key = jax.random.split(
                    key_round, 3
                )
                step_keys = jax.random.split(step_key, n_temps)
                per_temp = []
                for t in range(n_temps):
                    zt, llt, lpt = z[t], ll[t], lp[t]
                    for k_move in jax.random.split(
                        step_keys[t], swap_every
                    ):
                        zt, llt, lpt, n_acc = one_move(
                            zt, llt, lpt, k_move, betas_arr[t]
                        )
                        move_acc = move_acc.at[t].add(n_acc)
                    per_temp.append((zt, llt, lpt))
                z = jnp.stack([c[0] for c in per_temp])
                ll = jnp.stack([c[1] for c in per_temp])
                lp = jnp.stack([c[2] for c in per_temp])
                z, ll, lp, swap_acc = swap_pass(
                    z, ll, lp, swap_acc, even_key, 0
                )
                z, ll, lp, swap_acc = swap_pass(
                    z, ll, lp, swap_acc, odd_key, 1
                )
                outs.append((z, ll, lp))
                new_evals += swap_every * n_temps * n_samples
                if save_every is not None and (
                    (r + 1) % save_every == 0 or r + 1 == n_rounds
                ):
                    # Flush the pending rounds into a materialized
                    # chunk so every save is incremental (restacking
                    # the whole history at each boundary would be
                    # O(n_rounds^2)).
                    chunks.append(_stack_rounds(outs))
                    outs = []
                    self.save_pt_state(
                        checkpoint_file_path,
                        betas=betas,
                        round_keys=round_keys,
                        rounds_done=r + 1,
                        swap_every=swap_every,
                        n_steps=n_steps,
                        n_samples=n_samples,
                        a=a,
                        carry=(z, ll, lp, move_acc, swap_acc),
                        chunks=chunks,
                    )
            if outs:
                chunks.append(_stack_rounds(outs))
            chain = np.concatenate([c[0] for c in chunks], axis=0)
            chain_ll = np.concatenate([c[1] for c in chunks], axis=0)
            chain_lp = np.concatenate([c[2] for c in chunks], axis=0)
        # One tempered-density pass per stretch move plus (on a fresh
        # start) the single initialization pass — swaps reuse carried
        # logL, and a resume re-pays neither the finished rounds nor
        # the initialization.
        self.n_likelihood_evaluations += new_evals

        # chain: (n_rounds, T, n, d) -> (T, n_rounds, n, d)
        chain = jnp.moveaxis(chain, 1, 0)
        flat = chain.reshape(-1, self.dims)
        # Invert with the RUN's transform (the local, which a resume
        # may have cleared) — not the instance attribute.
        if precond is None:
            x = jnp.asarray(flat)
            log_j = jnp.zeros(flat.shape[0], dtype=flat.dtype)
        else:
            x, log_j = precond.inverse(flat)
        samples = PTMCMCSamples(
            x=x,
            chain_shape=(n_temps, n_rounds, n_samples),
            parameters=self.parameters,
            dtype=self.dtype,
            betas=betas,
        )
        # Densities were carried through the chain (every move/swap
        # keeps them consistent with the current state), so no second
        # evaluation pass over the n_rounds * T * n stored states is
        # needed. The carried log_p is the z-space density
        # log_prior(x) + log|dx/dz|; subtract the Jacobian to recover
        # the x-space prior exactly.
        samples.log_likelihood = jnp.moveaxis(chain_ll, 1, 0).reshape(-1)
        samples.log_prior = (
            jnp.moveaxis(chain_lp, 1, 0).reshape(-1) - log_j
        )
        samples.burn_in = burn_in
        samples.thin = thin
        # Per-rung diagnostics: stretch-move acceptance (one attempt
        # per walker per move) and adjacent-pair swap acceptance (each
        # DEO pair attempted once per round). Low swap acceptance at a
        # pair flags a ladder gap; near-1 flags redundant rungs.
        samples.move_acceptance = np.asarray(
            move_acc / (n_rounds * swap_every * n_samples)
        )
        samples.swap_acceptance = np.asarray(
            swap_acc / (n_rounds * n_samples)
        )
        if len(samples.swap_acceptance):
            logger.info(
                "PT acceptance: moves mean %.3f (min %.3f); swaps "
                "mean %.3f (min %.3f at pair %d)",
                float(samples.move_acceptance.mean()),
                float(samples.move_acceptance.min()),
                float(samples.swap_acceptance.mean()),
                float(samples.swap_acceptance.min()),
                int(samples.swap_acceptance.argmin()),
            )
        # Persist the finished (T, rounds, n, d) x-space chain with its
        # temperature ladder so evidence estimates can be recomputed
        # from the file (pilot runs pass neither kwarg, so they never
        # touch the checkpoint).
        self._maybe_checkpoint_chain(
            samples.chain,
            n_rounds * swap_every,
            checkpoint_file_path,
            checkpoint_every,
            extra_attrs={"betas": np.asarray(betas, dtype=float)},
        )
        return samples
