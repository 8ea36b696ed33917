"""MCMC mutation kernels as pure, jittable functions over particle batches.

Internalizes the kernels the reference imports (SURVEY.md §2.3):

- ``pcn`` / ``tpcn``: (t-)preconditioned Crank-Nicolson with acceptance-rate
  adaptation toward 0.234 (minipcn parity; reference mcmc.py:285-302,
  smc/minipcn.py:45-49). The tpCN uses the Gaussian-scale-mixture
  augmentation of the multivariate-t reference: w ~ Gamma((nu+d)/2,
  (nu+r^2)/2) then a pCN step under N(mu, Sigma/w), with the exact
  marginal acceptance correction.
- ``rwmh`` / ``mala`` / ``hmc``: random-walk, Langevin, and Hamiltonian
  kernels (blackjax parity; reference smc/blackjax.py:146-321).
- ``stretch``: affine-invariant ensemble move (emcee parity; reference
  mcmc.py:203-264) with the red-black two-half update so the whole
  ensemble advances in two batched steps.

Every kernel advances the *entire* ``(n, d)`` particle array per step —
no per-particle Python — and chains run under ``lax.scan``, so one SMC
mutation is a single fused XLA computation. All kernels take and return a
:class:`ChainState` and are stateless w.r.t. Python.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ChainState(NamedTuple):
    """State threaded through a `lax.scan` chain."""

    x: jax.Array  # (n, d) positions
    log_prob: jax.Array  # (n,) target log-density
    key: jax.Array  # PRNG key
    step_size: jax.Array  # scalar (adapted)
    n_accept: jax.Array  # (n,) running acceptance counts
    grad: jax.Array | None = None  # (n, d) cached gradients (MALA/HMC)


class GaussianReference(NamedTuple):
    """Fitted ensemble moments used by pCN/tpCN/RWMH proposals."""

    mean: jax.Array  # (d,)
    chol: jax.Array  # (d, d) lower Cholesky of covariance
    inv_chol: jax.Array  # (d, d)


@functools.partial(jax.jit, static_argnames=("jitter",))
def fit_gaussian_reference(
    x: jax.Array, jitter: float = 1e-6
) -> GaussianReference:
    """Fit mean/covariance of the particle ensemble (minipcn parity)."""
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / x.shape[0]
    cov = cov + jitter * jnp.eye(x.shape[1], dtype=x.dtype)
    chol = jnp.linalg.cholesky(cov)
    inv_chol = jax.scipy.linalg.solve_triangular(
        chol, jnp.eye(x.shape[1], dtype=x.dtype), lower=True
    )
    return GaussianReference(mean=mean, chol=chol, inv_chol=inv_chol)


def _mahalanobis_sq(ref: GaussianReference, x: jax.Array) -> jax.Array:
    z = (x - ref.mean) @ ref.inv_chol.T
    return jnp.sum(z**2, axis=-1)


def gamma_fixed_shape(key, alpha: float, n: int, dtype) -> jax.Array:
    """Sample Gamma(alpha, 1) for a *static* shape parameter.

    ``jax.random.gamma`` runs a rejection loop (~0.5 ms for 128k samples
    on v5e — 25% of a whole tpCN step). When ``2*alpha`` is an integer,
    Gamma(alpha, 1) = chi2_{2 alpha}/2 has the exact closed construction
    ``sum of floor(alpha) exponentials (+ half a squared normal when
    2 alpha is odd)``, which is pure vectorized RNG+VPU work (~10x
    faster). Falls back to ``jax.random.gamma`` otherwise.
    """
    two_alpha = 2.0 * alpha
    k = int(round(two_alpha))
    if abs(two_alpha - k) > 1e-9 or k <= 0:
        return jax.random.gamma(key, alpha, (n,), dtype=dtype)
    m, odd = divmod(k, 2)
    u_key, n_key = jax.random.split(key)
    out = jnp.zeros((n,), dtype=dtype)
    if m > 0:
        u = jax.random.uniform(u_key, (n, m), dtype=dtype)
        # log(1-u) with u in [0,1): strictly negative, never -inf.
        out = -jnp.sum(jnp.log1p(-u), axis=-1)
    if odd:
        out = out + 0.5 * jax.random.normal(n_key, (n,), dtype=dtype) ** 2
    return out


def _adapt_step_size(
    step_size,
    accept_prob_mean,
    target_acceptance,
    adaptation_rate,
    max_log_step: float = 0.0,
):
    """Robbins-Monro step-size adaptation in log space.

    ``max_log_step=0`` (step <= 1) is the pCN constraint (s in (0, 1]);
    unconstrained kernels (RWMH/MALA/HMC) pass a larger bound so the
    adaptation can actually reach the target acceptance on wide targets.
    """
    log_s = jnp.log(step_size) + adaptation_rate * (
        accept_prob_mean - target_acceptance
    )
    return jnp.exp(jnp.clip(log_s, -10.0, max_log_step)).astype(
        step_size.dtype
    )


# ---------------------------------------------------------------------------
# pCN / tpCN
# ---------------------------------------------------------------------------


def pcn_step(
    state: ChainState,
    log_prob_fn: Callable,
    ref: GaussianReference,
    target_acceptance: float = 0.234,
    adaptation_rate: float = 0.1,
) -> ChainState:
    """Preconditioned Crank-Nicolson step under N(mean, chol chol^T).

    Proposal: x' = mu + sqrt(1-s^2)(x-mu) + s L xi, reversible w.r.t. the
    Gaussian reference, so  log alpha = dlog p + (r'^2 - r^2)/2.
    """
    key, prop_key, accept_key = jax.random.split(state.key, 3)
    n, d = state.x.shape
    s = state.step_size
    xi = jax.random.normal(prop_key, (n, d), dtype=state.x.dtype)
    x_prop = (
        ref.mean
        + jnp.sqrt(1 - s**2) * (state.x - ref.mean)
        + s * xi @ ref.chol.T
    )
    lp_prop = log_prob_fn(x_prop)
    r2_old = _mahalanobis_sq(ref, state.x)
    r2_new = _mahalanobis_sq(ref, x_prop)
    log_alpha = lp_prop - state.log_prob + 0.5 * (r2_new - r2_old)
    log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
    log_u = jnp.log(jax.random.uniform(accept_key, (n,)))
    accept = log_u < log_alpha
    x_new = jnp.where(accept[:, None], x_prop, state.x)
    lp_new = jnp.where(accept, lp_prop, state.log_prob)
    acc_prob = jnp.mean(jnp.exp(jnp.minimum(log_alpha, 0.0)))
    s_new = _adapt_step_size(
        s, acc_prob, target_acceptance, adaptation_rate
    )
    return ChainState(
        x=x_new,
        log_prob=lp_new,
        key=key,
        step_size=s_new,
        n_accept=state.n_accept + accept,
    )


def tpcn_step(
    state: ChainState,
    log_prob_fn: Callable,
    ref: GaussianReference,
    nu: float = 5.0,
    target_acceptance: float = 0.234,
    adaptation_rate: float = 0.1,
) -> ChainState:
    """t-preconditioned Crank-Nicolson step (minipcn's default ``tpcn``).

    Scale-mixture construction: w | x ~ Gamma((nu+d)/2, (nu+r^2)/2); pCN
    under N(mu, Sigma/w); the z-dependent part of the auxiliary density
    gives  log alpha = dlog p + (nu+d)/2 [log(nu+r'^2) - log(nu+r^2)],
    leaving the multivariate-t_nu(mu, Sigma) as the effective reference —
    heavier tails than pCN, hence robust to over-dispersed particles.
    """
    key, w_key, prop_key, accept_key = jax.random.split(state.key, 4)
    n, d = state.x.shape
    s = state.step_size
    r2_old = _mahalanobis_sq(ref, state.x)
    alpha_gamma = 0.5 * (nu + d)
    w = gamma_fixed_shape(w_key, alpha_gamma, n, state.x.dtype)
    w = w / (0.5 * (nu + r2_old))
    xi = jax.random.normal(prop_key, (n, d), dtype=state.x.dtype)
    x_prop = (
        ref.mean
        + jnp.sqrt(1 - s**2) * (state.x - ref.mean)
        + (s / jnp.sqrt(w))[:, None] * (xi @ ref.chol.T)
    )
    lp_prop = log_prob_fn(x_prop)
    r2_new = _mahalanobis_sq(ref, x_prop)
    log_alpha = (
        lp_prop
        - state.log_prob
        + alpha_gamma * (jnp.log(nu + r2_new) - jnp.log(nu + r2_old))
    )
    log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
    log_u = jnp.log(jax.random.uniform(accept_key, (n,)))
    accept = log_u < log_alpha
    x_new = jnp.where(accept[:, None], x_prop, state.x)
    lp_new = jnp.where(accept, lp_prop, state.log_prob)
    acc_prob = jnp.mean(jnp.exp(jnp.minimum(log_alpha, 0.0)))
    s_new = _adapt_step_size(s, acc_prob, target_acceptance, adaptation_rate)
    return ChainState(
        x=x_new,
        log_prob=lp_new,
        key=key,
        step_size=s_new,
        n_accept=state.n_accept + accept,
    )


# ---------------------------------------------------------------------------
# Random-walk Metropolis-Hastings
# ---------------------------------------------------------------------------


def rwmh_step(
    state: ChainState,
    log_prob_fn: Callable,
    ref: GaussianReference,
    target_acceptance: float = 0.234,
    adaptation_rate: float = 0.1,
) -> ChainState:
    """Gaussian random walk with ensemble-covariance proposal."""
    key, prop_key, accept_key = jax.random.split(state.key, 3)
    n, d = state.x.shape
    s = state.step_size
    xi = jax.random.normal(prop_key, (n, d), dtype=state.x.dtype)
    x_prop = state.x + s * xi @ ref.chol.T
    lp_prop = log_prob_fn(x_prop)
    log_alpha = lp_prop - state.log_prob
    log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
    accept = jnp.log(jax.random.uniform(accept_key, (n,))) < log_alpha
    x_new = jnp.where(accept[:, None], x_prop, state.x)
    lp_new = jnp.where(accept, lp_prop, state.log_prob)
    acc_prob = jnp.mean(jnp.exp(jnp.minimum(log_alpha, 0.0)))
    s_new = _adapt_step_size(
        s, acc_prob, target_acceptance, adaptation_rate,
        max_log_step=2.3,
    )
    return ChainState(
        x=x_new,
        log_prob=lp_new,
        key=key,
        step_size=s_new,
        n_accept=state.n_accept + accept,
    )


# ---------------------------------------------------------------------------
# MALA
# ---------------------------------------------------------------------------


def mala_step(
    state: ChainState,
    log_prob_and_grad_fn: Callable,
    target_acceptance: float = 0.574,
    adaptation_rate: float = 0.1,
) -> ChainState:
    """Metropolis-adjusted Langevin; caches gradients in the state."""
    key, prop_key, accept_key = jax.random.split(state.key, 3)
    n, d = state.x.shape
    eps = state.step_size
    grad = state.grad
    xi = jax.random.normal(prop_key, (n, d), dtype=state.x.dtype)
    mean_fwd = state.x + 0.5 * eps**2 * grad
    x_prop = mean_fwd + eps * xi
    lp_prop, grad_prop = log_prob_and_grad_fn(x_prop)
    mean_rev = x_prop + 0.5 * eps**2 * grad_prop
    log_q_fwd = -jnp.sum((x_prop - mean_fwd) ** 2, axis=-1) / (2 * eps**2)
    log_q_rev = -jnp.sum((state.x - mean_rev) ** 2, axis=-1) / (2 * eps**2)
    log_alpha = lp_prop - state.log_prob + log_q_rev - log_q_fwd
    log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
    accept = jnp.log(jax.random.uniform(accept_key, (n,))) < log_alpha
    x_new = jnp.where(accept[:, None], x_prop, state.x)
    lp_new = jnp.where(accept, lp_prop, state.log_prob)
    grad_new = jnp.where(accept[:, None], grad_prop, grad)
    acc_prob = jnp.mean(jnp.exp(jnp.minimum(log_alpha, 0.0)))
    eps_new = _adapt_step_size(
        eps, acc_prob, target_acceptance, adaptation_rate,
        max_log_step=2.3,
    )
    return ChainState(
        x=x_new,
        log_prob=lp_new,
        key=key,
        step_size=eps_new,
        n_accept=state.n_accept + accept,
        grad=grad_new,
    )


# ---------------------------------------------------------------------------
# HMC (fixed-length leapfrog; jittered length approximates NUTS behaviour)
# ---------------------------------------------------------------------------


def hmc_step(
    state: ChainState,
    log_prob_and_grad_fn: Callable,
    n_leapfrog: int = 10,
    target_acceptance: float = 0.651,
    adaptation_rate: float = 0.05,
    jitter_trajectory: bool = False,
) -> ChainState:
    """Hamiltonian step: ``n_leapfrog`` leapfrog integrations per proposal.

    With ``jitter_trajectory=True`` the trajectory length is randomized
    uniformly in [1, n_leapfrog] per step (shared across particles),
    the standard static-shape surrogate for NUTS-style path exploration
    on TPU (no data-dependent recursion; SURVEY.md §7 hard-parts note).
    """
    key, mom_key, len_key, accept_key = jax.random.split(state.key, 4)
    n, d = state.x.shape
    eps = state.step_size
    p0 = jax.random.normal(mom_key, (n, d), dtype=state.x.dtype)

    if jitter_trajectory:
        n_steps = jax.random.randint(len_key, (), 1, n_leapfrog + 1)
    else:
        n_steps = n_leapfrog

    def leapfrog_body(i, carry):
        x, p, grad = carry
        p_half = p + 0.5 * eps * grad
        x_new = x + eps * p_half
        _, grad_new = log_prob_and_grad_fn(x_new)
        p_new = p_half + 0.5 * eps * grad_new
        return (x_new, p_new, grad_new)

    x_prop, p_prop, grad_prop = jax.lax.fori_loop(
        0, n_steps, leapfrog_body, (state.x, p0, state.grad)
    )
    lp_prop, grad_prop = log_prob_and_grad_fn(x_prop)
    ke0 = 0.5 * jnp.sum(p0**2, axis=-1)
    ke1 = 0.5 * jnp.sum(p_prop**2, axis=-1)
    log_alpha = (lp_prop - ke1) - (state.log_prob - ke0)
    log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
    accept = jnp.log(jax.random.uniform(accept_key, (n,))) < log_alpha
    x_new = jnp.where(accept[:, None], x_prop, state.x)
    lp_new = jnp.where(accept, lp_prop, state.log_prob)
    grad_new = jnp.where(accept[:, None], grad_prop, state.grad)
    acc_prob = jnp.mean(jnp.exp(jnp.minimum(log_alpha, 0.0)))
    eps_new = _adapt_step_size(
        eps, acc_prob, target_acceptance, adaptation_rate,
        max_log_step=2.3,
    )
    return ChainState(
        x=x_new,
        log_prob=lp_new,
        key=key,
        step_size=eps_new,
        n_accept=state.n_accept + accept,
        grad=grad_new,
    )


# ---------------------------------------------------------------------------
# Affine-invariant ensemble (emcee stretch move)
# ---------------------------------------------------------------------------


def stretch_step(
    state: ChainState,
    log_prob_fn: Callable,
    a: float = 2.0,
) -> ChainState:
    """Goodman-Weare stretch move with red-black half updates.

    Each half of the ensemble proposes against a partner drawn from the
    *other* half, so both halves update as fully batched operations
    (emcee's parallel scheme; reference mcmc.py:217-234 wraps the serial
    library version).
    """
    n, d = state.x.shape
    half = n // 2
    key = state.key
    x = state.x
    lp = state.log_prob
    n_accept = state.n_accept

    # (move slice, partner slice); handles odd n via the uneven split.
    blocks = (
        ((0, half), (half, n)),
        ((half, n), (0, half)),
    )
    for (m0, m1), (o0, o1) in blocks:
        n_move = m1 - m0
        n_other = o1 - o0
        key, z_key, pick_key, accept_key = jax.random.split(key, 4)
        idx_move = jnp.arange(m0, m1)
        pick = jax.random.randint(pick_key, (n_move,), 0, n_other)
        partners = x[o0 + pick]
        # z ~ g(z) prop 1/sqrt(z) on [1/a, a]: inverse-CDF sampling.
        u = jax.random.uniform(z_key, (n_move,), dtype=x.dtype)
        z = (u * (jnp.sqrt(a) - jnp.sqrt(1 / a)) + jnp.sqrt(1 / a)) ** 2
        x_move = x[idx_move]
        x_prop = partners + z[:, None] * (x_move - partners)
        lp_prop = log_prob_fn(x_prop)
        log_alpha = (d - 1) * jnp.log(z) + lp_prop - lp[idx_move]
        log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
        accept = (
            jnp.log(jax.random.uniform(accept_key, (n_move,))) < log_alpha
        )
        x = x.at[idx_move].set(
            jnp.where(accept[:, None], x_prop, x_move)
        )
        lp = lp.at[idx_move].set(jnp.where(accept, lp_prop, lp[idx_move]))
        n_accept = n_accept.at[idx_move].add(accept)

    return ChainState(
        x=x,
        log_prob=lp,
        key=key,
        step_size=state.step_size,
        n_accept=n_accept,
        grad=state.grad,
    )


# ---------------------------------------------------------------------------
# Chain runner
# ---------------------------------------------------------------------------


def run_chain(
    step_fn: Callable[[ChainState], ChainState],
    state: ChainState,
    n_steps: int,
    store_chain: bool = False,
):
    """Run ``n_steps`` of ``step_fn`` under ``lax.scan``.

    Returns ``(final_state, chain)`` where ``chain`` is the stacked
    positions ``(n_steps, n, d)`` if ``store_chain`` else None.
    """

    def body(carry, _):
        new = step_fn(carry)
        out = new.x if store_chain else None
        return new, out

    final, chain = jax.lax.scan(body, state, None, length=n_steps)
    return final, chain
