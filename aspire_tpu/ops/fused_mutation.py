"""Pallas-fused MCMC mutation chains (TPU hot kernel, round 5).

The SMC mutation hot loop (reference call stack SURVEY.md §3.2:
smc/base.py:401-454 -> smc/minipcn.py:69-135) spends its time in
per-step work that round 4's floor profile (benchmarks/dev/
floor_profile.py) decomposed as: a ~1.6 ns/particle-step fixed cost per
flow *launch* (Pallas dispatch + transpose + XLA glue), ~0.4 ns of
threefry RNG, and ~0.6 ns of proposal/accept arithmetic — costs that do
not shrink with flow FLOPs, which is why throughput saturated at
~330M particle-steps/s no matter how small the flow.

This kernel removes those fixed costs structurally: ONE Pallas launch
runs the ENTIRE k-step Metropolis chain. The grid iterates over
particle tiles; each grid cell keeps its tile's chain state (positions,
densities, acceptance counts, online autocorrelation sums) in
VMEM/registers across a ``fori_loop`` over steps, so per step there is
no HBM traffic, no launch, and no host-visible intermediate at all:

- proposal noise comes from the on-core PRNG
  (``pltpu.prng_seed``/``prng_random_bits``; normals via Box–Muller,
  Gamma via the fixed-shape exponential construction of
  :func:`aspire_tpu.samplers.kernels.gamma_fixed_shape`),
- the flow density pass reuses the transposed-layout layer helpers of
  :mod:`.fused_coupling` (features on sublanes, particles on lanes),
- the tempered target — preconditioning inverse, data-transform
  forward, flow log-prob, user log-prior/log-likelihood — is evaluated
  in-kernel on the transposed tile,
- Metropolis accept/select, Robbins–Monro step adaptation, and the
  AR(1)/mixing statistics of :func:`kernels.run_chain` all stay in
  VMEM.

Semantics deltas vs the XLA chain (documented, statistically neutral):

1. **Per-tile step-size adaptation.** The XLA path adapts one global
   step size from the full-population mean acceptance probability; here
   each tile (>= 256 particles) adapts its own from the tile mean.
   Every per-step transition is still an exact MH kernel for the
   tempered target given the current step size, so detailed balance per
   step is untouched; only the adaptation trajectory differs (and
   concentrates to the same fixed point as tile size grows).
2. **RNG stream.** Proposals use the TPU on-core PRNG seeded per
   (mutation, tile) from the chain's JAX key — a different bitstream
   than threefry (like the documented ``prng_impl="rbg"`` opt-in, the
   bitstream is stable for a fixed compiler version but not across
   XLA releases). Checkpoint resume replays the same seeds, so a
   resumed run is bit-exact on the same software stack.
3. **Eval accounting**: the chain needs ``(n_steps + 1) * n`` target
   evaluations (the post-chain density refresh is free — the kernel
   carries log_q/log_prior/log_likelihood through accept/select
   instead of recomputing them), vs the XLA path's
   ``(n_steps + 2) * n``.

Like the density kernel, results feed evidence estimates, so the math
mirrors :mod:`aspire_tpu.samplers.kernels` exactly (same clip bounds,
same NaN -> -inf guards, same Gamma construction).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fused_coupling as FC

_DEF_TILE = int(os.environ.get("ASPIRE_TPU_FUSED_CHAIN_TILE", "4096"))


# ---------------------------------------------------------------------------
# Transposed-layout transforms ("TD programs")
#
# A TD program is a static description of an elementwise per-dimension
# transform stack plus a flat list of traced (d, 1) / (1, 1) parameter
# columns, so the composite/bounded/affine transforms of
# aspire_tpu.transforms can run on (d, T) tiles inside the kernel.
# ---------------------------------------------------------------------------


class TDProgram:
    """Static op list + traced parameter columns for one transform.

    ``ops`` is a tuple of ``(kind, has_mask)``; ``params`` the flat
    list of traced arrays consumed in order by :func:`td_apply` — a
    0/1 float mask column first when ``has_mask`` (masks ride as
    parameters because Pallas kernels cannot capture array constants),
    then the op's own parameter columns.
    """

    def __init__(self, ops, params, n_params_per_op):
        self.ops = tuple(ops)
        self.params = list(params)
        self.n_params_per_op = tuple(n_params_per_op)


def _col(v, d):
    a = jnp.asarray(v, dtype=jnp.float32).reshape(-1)
    if a.shape[0] == 1 and d > 1:
        a = jnp.broadcast_to(a, (d,))
    return a.reshape(d, 1)


def _expand_masked(values, mask, fill, d):
    """Scatter masked sub-transform params back to full-d columns."""
    out = np.full((d,), fill, dtype=np.float64)
    out = jnp.asarray(out, dtype=jnp.float32)
    idx = np.nonzero(mask)[0]
    return out.at[idx].set(
        jnp.asarray(values, jnp.float32).reshape(-1)
    ).reshape(d, 1)


def canonicalize_transform(t, dims: int) -> TDProgram | None:
    """Lower a fitted transform object to a TD program (None = can't)."""
    from .. import transforms as T

    if t is None:
        return TDProgram((), (), ())
    if isinstance(t, T.IdentityTransform):
        return TDProgram((), (), ())
    if isinstance(t, T.AffineTransform):
        if t._mean is None:
            return TDProgram((), (), ())
        mean = _col(t._mean, dims)
        std = _col(t._std, dims)
        return TDProgram(
            (("affine", False),), (mean, std), (2,)
        )
    if isinstance(t, (T.LogitTransform, T.ProbitTransform)):
        kind = (
            "logit" if isinstance(t, T.LogitTransform) else "probit"
        )
        lower = _col(t.lower, dims)
        upper = _col(t.upper, dims)
        return TDProgram(
            ((kind, False),),
            (lower, upper, jnp.full((1, 1), t.eps, jnp.float32)),
            (3,),
        )
    if isinstance(t, T.PeriodicTransform):
        lower = _col(t.lower, dims)
        upper = _col(t.upper, dims)
        return TDProgram(
            (("periodic", False),), (lower, upper), (2,)
        )
    if isinstance(t, T.CompositeTransform):
        ops, params, nper = [], [], []
        if t._periodic_transform is not None:
            mask = np.asarray(t._periodic_mask, dtype=bool)
            sub = t._periodic_transform
            lower = _expand_masked(sub.lower, mask, 0.0, dims)
            upper = _expand_masked(sub.upper, mask, 1.0, dims)
            ops.append(("periodic", True))
            params += [
                jnp.asarray(
                    mask.reshape(dims, 1).astype(np.float32)
                ),
                lower,
                upper,
            ]
            nper.append(3)
        if t._bounded_transform is not None:
            mask = np.asarray(t._bounded_mask, dtype=bool)
            sub = t._bounded_transform
            kind = (
                "logit"
                if isinstance(sub, T.LogitTransform)
                else "probit"
            )
            lower = _expand_masked(sub.lower, mask, 0.0, dims)
            upper = _expand_masked(sub.upper, mask, 1.0, dims)
            ops.append((kind, True))
            params += [
                jnp.asarray(
                    mask.reshape(dims, 1).astype(np.float32)
                ),
                lower,
                upper,
                jnp.full((1, 1), sub.eps, jnp.float32),
            ]
            nper.append(4)
        if t._affine_transform is not None:
            sub = t._affine_transform
            if sub._mean is None:
                return None
            ops.append(("affine", False))
            params += [_col(sub._mean, dims), _col(sub._std, dims)]
            nper.append(2)
        return TDProgram(ops, params, nper)
    return None


_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _masked_logj(mask, per_dim):
    """Sum per-dim (d, T) log-Jacobian rows over the (static) mask."""
    if mask is not None:
        per_dim = jnp.where(jnp.asarray(mask), per_dim, 0.0)
    return jnp.sum(per_dim, axis=0, keepdims=True)


def td_apply(prog: TDProgram, params, xt, inverse: bool):
    """Apply a TD program to a (d, T) tile -> (yt, log_j (1, T)).

    ``params`` are the traced parameter leaves (same order as
    ``prog.params``). Forward = data -> latent (matching
    ``CompositeTransform.forward``); inverse applies the ops reversed.
    """
    T_ = xt.shape[-1]
    log_j = jnp.zeros((1, T_), dtype=xt.dtype)
    order = list(range(len(prog.ops)))
    offs = np.concatenate([[0], np.cumsum(prog.n_params_per_op)])
    if inverse:
        order = order[::-1]
    x = xt
    for i in order:
        kind, has_mask = prog.ops[i]
        p = list(params[offs[i] : offs[i + 1]])
        mask = p.pop(0) > 0.5 if has_mask else None
        if kind == "affine":
            mean, std = p
            if not inverse:
                y = (x - mean) / std
                lj = -jnp.log(jnp.abs(std))
            else:
                y = x * std + mean
                lj = jnp.log(jnp.abs(std))
            x = y
            log_j = log_j + jnp.sum(lj, axis=0, keepdims=True)
        elif kind == "periodic":
            lower, upper = p
            width = upper - lower
            y = lower + jnp.mod(x - lower, width)
            x = jnp.where(mask, y, x) if mask is not None else y
        elif kind in ("logit", "probit"):
            lower, upper, eps = p
            eps = eps[0, 0]
            denom = upper - lower
            if not inverse:
                u = (x - lower) / denom
                u = jnp.clip(u, eps, 1.0 - eps)
                if kind == "logit":
                    y = jnp.log(u) - jnp.log1p(-u)
                    lj = -(jnp.log(u) + jnp.log1p(-u))
                else:
                    y = jax.scipy.special.erfinv(
                        2.0 * u - 1.0
                    ) * math.sqrt(2.0)
                    lj = 0.5 * math.log(2 * math.pi) + 0.5 * y**2
                lj = lj - jnp.log(denom)
            else:
                if kind == "logit":
                    u = jax.nn.sigmoid(x)
                    lj = jax.nn.log_sigmoid(x) + jax.nn.log_sigmoid(-x)
                else:
                    u = 0.5 * (
                        1.0 + jax.lax.erf(x / math.sqrt(2.0))
                    )
                    lj = -(
                        0.5 * math.log(2 * math.pi) + 0.5 * x**2
                    )
                y = denom * u + lower
                lj = lj + jnp.log(denom)
            x = jnp.where(mask, y, x) if mask is not None else y
            log_j = log_j + _masked_logj(mask, lj)
        else:  # pragma: no cover - canonicalize_transform gates kinds
            raise ValueError(kind)
    return x, log_j


# ---------------------------------------------------------------------------
# In-kernel RNG
# ---------------------------------------------------------------------------


def _uniform_rows(rows: int, T: int):
    """(rows, T) uniforms in [0, 1) from the on-core PRNG."""
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((rows, T)), jnp.uint32
    )
    f = pltpu.bitcast(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
    )
    return f - 1.0


def _box_muller(u1, u2):
    """Standard normal pairs from uniform pairs (rows stack)."""
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    th = (2.0 * math.pi) * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def _erfinv_normal(u):
    """Inverse-CDF standard normals, one per uniform.

    ``sqrt(2) erfinv(2u - 1)`` — the transform XLA's own
    ``jax.random.normal`` applies. Measured ~7% faster than Box-Muller
    for the whole chain kernel (one log + short polynomial per normal
    vs log+sqrt+cos+sin per pair; round-5 in-process A/B). The
    half-ulp shift moves u to bin midpoints so the argument never hits
    exactly -1 (erfinv(-1) = -inf); still exactly uniform on the grid.
    """
    return math.sqrt(2.0) * jax.scipy.special.erfinv(
        2.0 * (u + 2.0 ** -24) - 1.0
    )


def _normals(cfg, u1, u2):
    """Normal pairs from uniform pairs (legacy/box-muller mode).

    ``cfg.cheap_normals`` is a PROFILING-ONLY knob that swaps in a
    scaled-uniform pair (wrong distribution — never enabled in
    shipping paths) to price the transcendentals.
    """
    if getattr(cfg, "cheap_normals", False):
        s = math.sqrt(12.0)
        return s * (u1 - 0.5), s * (u2 - 0.5)
    return _box_muller(u1, u2)


# ---------------------------------------------------------------------------
# The chain kernel
# ---------------------------------------------------------------------------


class ChainConfig:
    """Static configuration for one fused chain compilation."""

    def __init__(
        self,
        arch,
        kernel: str,  # "tpcn" | "pcn" | "rwmh"
        n_steps: int,
        nu: float,
        target_acceptance: float,
        adaptation_rate: float,
        beta_is_static: bool = False,
        dt_prog: TDProgram | None = None,
        pc_prog: TDProgram | None = None,
        gamma_m: int = 0,
        gamma_odd: int = 0,
        track_stats: bool = True,
        box_muller: bool = False,
    ):
        self.arch = arch
        self.kernel = kernel
        self.n_steps = n_steps
        self.nu = nu
        self.target_acceptance = target_acceptance
        self.adaptation_rate = adaptation_rate
        self.dt_prog = dt_prog if dt_prog is not None else TDProgram((), (), ())
        self.pc_prog = pc_prog if pc_prog is not None else TDProgram((), (), ())
        self.gamma_m = gamma_m
        self.gamma_odd = gamma_odd
        self.track_stats = track_stats
        self.box_muller = box_muller
        self.max_log_step = 2.3 if kernel == "rwmh" else 0.0

    @property
    def noise_rows(self) -> int:
        """Random rows consumed per step (single PRNG draw per step)."""
        d = self.arch.dims
        if self.box_muller:
            hd = (d + 1) // 2
            rows = 2 * hd  # proposal normals (Box-Muller pairs)
            if self.kernel == "tpcn":
                rows += self.gamma_m  # exponential uniforms
                if self.gamma_odd:
                    rows += 2  # a Box-Muller pair for the half-chi2
            rows += 1  # accept uniform
            return rows
        rows = d  # one inverse-CDF normal per uniform row
        if self.kernel == "tpcn":
            rows += self.gamma_m + (1 if self.gamma_odd else 0)
        rows += 1  # accept uniform
        return rows


# Per-tile stats column layout: [step_size, rho_sum (d), within_sum
# (d), walker_mean_sum (d), walker_mean_m2 (d)] — a (4d + 1, 1) column
# written as one vector store (scalar stores to VMEM don't lower).
def _stats_rows(d: int) -> int:
    return 4 * d + 1


def _flow_logq_td(arch, w_vals, n_dense, xt):
    """Flow density pass on a (d, T) tile: data -> latent, N(0,1) base."""
    x = xt
    ld = jnp.zeros((1, xt.shape[-1]), dtype=xt.dtype)
    for layer in range(arch.n_layers):
        h = FC._layer_matmuls(arch, w_vals, n_dense, layer, x, x.dtype)
        x, e = FC._layer_transform(arch, layer, x, h, density_pass=True)
        ld = ld + e
    base = -0.5 * jnp.sum(x * x, axis=0, keepdims=True) - (
        arch.dims * _HALF_LOG_2PI
    )
    return base + ld


def _chain_kernel(
    cfg: ChainConfig,
    n_dense: int,
    target_td,  # converted: (xt, *consts) -> ((1,T) lpi, (1,T) ll)
    n_dt: int,
    n_pc: int,
    n_tc: int,
    inject_noise: bool,
    *refs,
):
    """One particle tile through the whole k-step MH chain, VMEM-resident.

    Ref layout: [seed, beta, step0, mean, chol, ichol, xt,
    w_0, b_0, ..., dt_params..., pc_params..., target_consts...,
    (noise,)?, z_out, lq_out, lpi_out, ll_out, nacc_out, stats_out].
    """
    arch = cfg.arch
    d = arch.dims
    it = iter(range(len(refs)))
    seed_ref = refs[next(it)]
    beta_ref = refs[next(it)]
    step0_ref = refs[next(it)]
    mean_ref = refs[next(it)]
    chol_ref = refs[next(it)]
    ichol_ref = refs[next(it)]
    xt_ref = refs[next(it)]
    w_refs = [refs[next(it)] for _ in range(2 * n_dense)]
    dt_params = [refs[next(it)][:] for _ in range(n_dt)]
    pc_params = [refs[next(it)][:] for _ in range(n_pc)]
    t_consts = [refs[next(it)][:] for _ in range(n_tc)]
    noise_ref = refs[next(it)] if inject_noise else None
    z_out = refs[next(it)]
    lq_out = refs[next(it)]
    lpi_out = refs[next(it)]
    ll_out = refs[next(it)]
    nacc_out = refs[next(it)]
    stats_out = refs[next(it)]

    if not inject_noise:
        # Independent stream per (mutation seed, tile): Mosaic accepts
        # at most two seed words, so the tile id is mixed into the
        # first with a golden-ratio odd constant (the second word
        # carries the mutation's 32 random key bits).
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(0) * jnp.int32(-1640531527),  # 0x9E3779B9
            seed_ref[0, 1],
        )

    beta = beta_ref[0, 0]
    mean = mean_ref[:]  # (d, 1)
    chol = chol_ref[:]  # (d, d)
    ichol = ichol_ref[:]  # (d, d)

    x0 = xt_ref[:]  # (d, T)
    T_ = x0.shape[-1]
    dtype = x0.dtype

    w_vals = [r[:] for r in w_refs]

    # ---- per-half phase helpers (two-lane-half MXU/VPU pipeline) ----
    # The whole step body runs twice per tile on lane-halves A/B,
    # software-pipelined one flow layer apart (as in
    # fused_coupling._coupling_kernel, measured +9% there): half B's
    # conditioner matmuls (MXU) are issued while half A's
    # spline/RNG/proposal/target math (VPU) runs, so the chain's large
    # VPU share hides under the MXU phases.
    H = T_ // 2
    alpha_g = 0.5 * (cfg.nu + d)
    hd = (d + 1) // 2
    needs_r2 = cfg.kernel in ("pcn", "tpcn")
    L = arch.n_layers

    def mm(layer, x):
        return FC._layer_matmuls(arch, w_vals, n_dense, layer, x, dtype)

    def tf(layer, x, h):
        return FC._layer_transform(arch, layer, x, h, density_pass=True)

    def pre_flow(zt):
        """pc inverse + dt forward -> (x_data, x_flow, pc_lj, dt_lj)."""
        n = zt.shape[-1]
        if cfg.pc_prog.ops:
            xt, pc_lj = td_apply(cfg.pc_prog, pc_params, zt, inverse=True)
        else:
            xt, pc_lj = zt, jnp.zeros((1, n), dtype)
        if cfg.dt_prog.ops:
            x_f, dt_lj = td_apply(
                cfg.dt_prog, dt_params, xt, inverse=False
            )
        else:
            x_f, dt_lj = xt, jnp.zeros((1, n), dtype)
        return xt, x_f, pc_lj, dt_lj

    def target_part(xt):
        lpi, ll = target_td(xt, *t_consts)
        lpi = jnp.where(jnp.isnan(lpi), -jnp.inf, lpi).astype(dtype)
        ll = jnp.where(jnp.isnan(ll), -jnp.inf, ll).astype(dtype)
        return lpi, ll

    def mahal2(zt):
        y = jnp.dot(
            ichol, zt - mean, preferred_element_type=jnp.float32
        ).astype(dtype)
        return jnp.sum(y * y, axis=0, keepdims=True)

    def density_tail(z_lat, ld, dt_lj):
        base = -0.5 * jnp.sum(
            z_lat * z_lat, axis=0, keepdims=True
        ) - (d * _HALF_LOG_2PI)
        return (base + ld + dt_lj).astype(dtype)

    skip_flow = getattr(cfg, "skip_flow", False)  # profiling-only

    def tempered_half(zt):
        """Serial density+target evaluation (chain init only)."""
        xt, x_f, pc_lj, dt_lj = pre_flow(zt)
        z, ld = x_f, jnp.zeros((1, zt.shape[-1]), dtype)
        if not skip_flow:
            for layer in range(L):
                z, e = tf(layer, z, mm(layer, z))
                ld = ld + e
        lq = density_tail(z, ld, dt_lj)
        lpi, ll = target_part(xt)
        lp = (1.0 - beta) * lq + beta * (ll + lpi) + pc_lj
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp).astype(dtype)
        return lp, lq, lpi, ll

    def half_bundle(rng_h):
        """State-independent RNG transforms for one half's next step.

        Everything here (Box-Muller normals, the Gamma construction,
        and even ``chol @ xi``) depends only on the random stream, so
        the bundle for step t+1 is built DURING step t's flow layer
        loop — the expensive VPU transcendentals hide under the MXU
        matmul phases instead of sitting on the serial critical path
        before the first conditioner matmul can issue.
        """
        if cfg.box_muller:
            za, zb = _normals(cfg, rng_h[0:hd], rng_h[hd : 2 * hd])
            xi = jnp.concatenate([za, zb], axis=0)[:d]
            row = 2 * hd
        else:
            xi = _erfinv_normal(rng_h[0:d])
            row = d
        lxi = jnp.dot(
            chol, xi, preferred_element_type=jnp.float32
        ).astype(dtype)
        w_raw = None
        if cfg.kernel == "tpcn":
            # w ~ Gamma(alpha_g) / (0.5 (nu + r2)): fixed-shape
            # construction (kernels.gamma_fixed_shape), with the
            # exponential sum taken as logs of pair-products (same
            # distribution, half the log evaluations; pair grouping
            # keeps the product above f32 underflow).
            w_raw = jnp.zeros((1, rng_h.shape[-1]), dtype)
            if cfg.gamma_m > 0:
                u = rng_h[row : row + cfg.gamma_m]
                row += cfg.gamma_m
                for j in range(0, cfg.gamma_m - 1, 2):
                    pair = (1.0 - u[j : j + 1]) * (
                        1.0 - u[j + 1 : j + 2]
                    )
                    w_raw = w_raw - jnp.log(pair)
                if cfg.gamma_m % 2:
                    w_raw = w_raw - jnp.log(
                        1.0 - u[cfg.gamma_m - 1 : cfg.gamma_m]
                    )
            if cfg.gamma_odd:
                if cfg.box_muller:
                    gza, _ = _normals(
                        cfg,
                        rng_h[row : row + 1],
                        rng_h[row + 1 : row + 2],
                    )
                    row += 2
                else:
                    gza = _erfinv_normal(rng_h[row : row + 1])
                    row += 1
                w_raw = w_raw + 0.5 * gza * gza
        else:
            w_raw = jnp.zeros((1, rng_h.shape[-1]), dtype)
        u_acc = rng_h[cfg.noise_rows - 1 : cfg.noise_rows]
        return (lxi, w_raw, u_acc)

    def gen_bundles(t):
        """(half A, half B) noise bundles for step ``t``."""
        if inject_noise:
            rng = noise_ref[jnp.minimum(t, cfg.n_steps - 1)]
        else:
            rng = _uniform_rows(cfg.noise_rows, T_)
        return half_bundle(rng[:, :H]), half_bundle(rng[:, H:])

    def propose(x, r2, s, bundle):
        """State-dependent proposal tail (cheap VPU ops only).

        ``r2`` is the carried reference Mahalanobis distance of the
        CURRENT state — exact, since accept/select keeps it in sync
        with x — saving one (d, d) solve per step vs the XLA chain's
        recompute.
        """
        lxi, w_raw, _ = bundle
        if cfg.kernel == "rwmh":
            return x + s * lxi
        s_c = jnp.minimum(s, 1.0)
        rot = jnp.sqrt(jnp.maximum(1.0 - s_c * s_c, 0.0))
        if cfg.kernel == "pcn":
            return mean + rot * (x - mean) + s_c * lxi
        w = w_raw / (0.5 * (cfg.nu + r2))
        return mean + rot * (x - mean) + (s_c / jnp.sqrt(w)) * lxi

    def alpha_corr(x_prop, r2):
        """(r2_new, proposal-asymmetry correction) for one half."""
        if cfg.kernel == "rwmh":
            return r2, jnp.zeros((1, x_prop.shape[-1]), dtype)
        r2n = mahal2(x_prop)
        if cfg.kernel == "pcn":
            return r2n, 0.5 * (r2n - r2)
        return r2n, alpha_g * jnp.log((cfg.nu + r2n) / (cfg.nu + r2))

    def finish(hs, x_prop, z_lat, ld, lj, lpi_p, ll_p, r2n, corr, u_acc):
        """Metropolis select for one half; returns (new half, acc_sum)."""
        (x, lp, lq, lpi, ll, r2, nacc, prev_d, s1, s2, c1, x0h) = hs
        pc_lj, dt_lj = lj
        lq_p = density_tail(z_lat, ld, dt_lj)
        lp_p = (1.0 - beta) * lq_p + beta * (ll_p + lpi_p) + pc_lj
        lp_p = jnp.where(jnp.isnan(lp_p), -jnp.inf, lp_p).astype(dtype)
        log_alpha = lp_p - lp + corr
        log_alpha = jnp.where(
            jnp.isnan(log_alpha), -jnp.inf, log_alpha
        )
        # P(u < e^min(la,0)) = P(log u < la); reuses the acceptance
        # probability the step-size adaptation needs anyway (saves a
        # log per step).
        acc_p = jnp.exp(jnp.minimum(log_alpha, 0.0))
        accept = u_acc < acc_p
        x_new = jnp.where(accept, x_prop, x)
        if cfg.track_stats:
            delta = x_new - x0h
            s1n, s2n, c1n = (
                s1 + delta,
                s2 + delta * delta,
                c1 + delta * prev_d,
            )
            prev_n = delta
        else:
            s1n, s2n, c1n, prev_n = s1, s2, c1, prev_d
        new = (
            x_new,
            jnp.where(accept, lp_p, lp),
            jnp.where(accept, lq_p, lq),
            jnp.where(accept, lpi_p, lpi),
            jnp.where(accept, ll_p, ll),
            jnp.where(accept, r2n, r2) if needs_r2 else r2,
            nacc + accept.astype(dtype),
            prev_n,
            s1n,
            s2n,
            c1n,
            x0h,
        )
        return new, jnp.sum(acc_p)

    def init_half(x0h):
        lp0, lq0, lpi0, ll0 = tempered_half(x0h)
        r2_0 = mahal2(x0h) if needs_r2 else jnp.zeros((1, H), dtype)
        zd = jnp.zeros((d, H), dtype)
        z1 = jnp.zeros((1, H), dtype)
        return (x0h, lp0, lq0, lpi0, ll0, r2_0, z1, zd, zd, zd, zd, x0h)

    def step(t, carry):
        ha, hb, s = carry
        # In-step bundle generation measured FASTER than carrying
        # next-step bundles through the fori loop (the carry's VMEM
        # round-trips cost more than the extra overlap buys).
        bn_a, bn_b = gen_bundles(t)

        # Half A: cheap state-dependent proposal tail, then issue its
        # first matmul as early as possible.
        xp_a = propose(ha[0], ha[5], s, bn_a)
        xt_a, xf_a, pclj_a, dtlj_a = pre_flow(xp_a)
        if not skip_flow:
            h_a = mm(0, xf_a)  # MXU
        # VPU work overlapping half A's first matmul:
        xp_b = propose(hb[0], hb[5], s, bn_b)
        xt_b, xf_b, pclj_b, dtlj_b = pre_flow(xp_b)
        r2n_a, corr_a = alpha_corr(xp_a, ha[5])
        lpi_pa, ll_pa = target_part(xt_a)

        z_a, ld_a = xf_a, jnp.zeros((1, H), dtype)
        z_b, ld_b = xf_b, jnp.zeros((1, H), dtype)
        if skip_flow:
            r2n_b, corr_b = alpha_corr(xp_b, hb[5])
            lpi_pb, ll_pb = target_part(xt_b)
        for idx in range(L if not skip_flow else 0):
            h_b = mm(idx, z_b)  # MXU
            if idx == 0:
                # VPU fill under half B's first matmul.
                r2n_b, corr_b = alpha_corr(xp_b, hb[5])
                lpi_pb, ll_pb = target_part(xt_b)
            z_a, e_a = tf(idx, z_a, h_a)  # VPU
            ld_a = ld_a + e_a
            if idx + 1 < L:
                h_a = mm(idx + 1, z_a)  # MXU
            z_b, e_b = tf(idx, z_b, h_b)  # VPU
            ld_b = ld_b + e_b

        ha_new, acc_a = finish(
            ha, xp_a, z_a, ld_a, (pclj_a, dtlj_a),
            lpi_pa, ll_pa, r2n_a, corr_a, bn_a[2],
        )
        hb_new, acc_b = finish(
            hb, xp_b, z_b, ld_b, (pclj_b, dtlj_b),
            lpi_pb, ll_pb, r2n_b, corr_b, bn_b[2],
        )
        acc_prob = (acc_a + acc_b) / T_
        s_new = jnp.exp(
            jnp.clip(
                jnp.log(s)
                + cfg.adaptation_rate
                * (acc_prob - cfg.target_acceptance),
                -10.0,
                cfg.max_log_step,
            )
        ).astype(dtype)
        return ha_new, hb_new, s_new

    init = (
        init_half(x0[:, :H]),
        init_half(x0[:, H:]),
        step0_ref[0, pl.program_id(0)],
    )
    ha, hb, s = jax.lax.fori_loop(0, cfg.n_steps, step, init)

    z_out[:, :H] = ha[0]
    z_out[:, H:] = hb[0]
    lq_out[:, :H] = ha[2]
    lq_out[:, H:] = hb[2]
    lpi_out[:, :H] = ha[3]
    lpi_out[:, H:] = hb[3]
    ll_out[:, :H] = ha[4]
    ll_out[:, H:] = hb[4]
    nacc_out[:, :H] = ha[6]
    nacc_out[:, H:] = hb[6]

    # Per-tile stats column (combined host-free in XLA afterwards).
    if cfg.track_stats:
        m = cfg.n_steps + 1

        def half_sums(h):
            x0h, s1, s2, c1 = h[11], h[8], h[9], h[10]
            dev_mean = s1 / m  # (d, H)
            var = s2 / m - dev_mean * dev_mean
            cov1 = c1 / cfg.n_steps - dev_mean * dev_mean
            rho = jnp.where(
                var > 1e-12, cov1 / jnp.maximum(var, 1e-12), 1.0
            )
            wm = x0h + dev_mean
            return (
                jnp.sum(rho, axis=1, keepdims=True),
                jnp.sum(var, axis=1, keepdims=True),
                jnp.sum(wm, axis=1, keepdims=True),
                wm,
            )

        rho_a, wi_a, wms_a, wm_a = half_sums(ha)
        rho_b, wi_b, wms_b, wm_b = half_sums(hb)
        rho_sum = rho_a + rho_b
        within_sum = wi_a + wi_b
        wm_sum = wms_a + wms_b
        wm_mean = wm_sum / T_
        wm_m2 = jnp.sum(
            (wm_a - wm_mean) ** 2, axis=1, keepdims=True
        ) + jnp.sum((wm_b - wm_mean) ** 2, axis=1, keepdims=True)
    else:
        rho_sum = within_sum = wm_sum = wm_m2 = jnp.zeros((d, 1), dtype)
    col = jnp.concatenate(
        [
            jnp.broadcast_to(s, (1, 1)).astype(dtype),
            rho_sum,
            within_sum,
            wm_sum,
            wm_m2,
        ],
        axis=0,
    )
    stats_out[:] = col.reshape(1, _stats_rows(d), 1)


def combine_tile_stats(stats, d: int, tile: int):
    """Reduce per-tile stats columns -> (tau, mixing), parity with
    :func:`kernels.lag1_autocorr_time` / :func:`kernels.chain_mixing_ratio`.

    ``stats``: (n_tiles, 4 d + 1) rows in the :func:`_stats_rows`
    layout; ``tile`` the static per-tile walker count.
    """
    n = stats.shape[0] * tile
    rho_dim = jnp.sum(stats[:, 1 : 1 + d], axis=0) / n
    rho_dim = jnp.clip(rho_dim, -0.9999, 0.9999)
    tau_dim = (1.0 + rho_dim) / (1.0 - rho_dim)
    tau = jnp.mean(jnp.maximum(tau_dim, 1.0))

    within = jnp.sum(stats[:, 1 + d : 1 + 2 * d], axis=0) / n
    wm_sum = stats[:, 1 + 2 * d : 1 + 3 * d]
    wm_m2 = stats[:, 1 + 3 * d : 1 + 4 * d]
    grand = jnp.sum(wm_sum, axis=0) / n
    tile_mean = wm_sum / tile
    between = (
        jnp.sum(wm_m2, axis=0)
        + tile
        * jnp.sum((tile_mean - grand[None, :]) ** 2, axis=0)
    ) / n
    pooled = within + between
    ratio = jnp.where(
        pooled > 1e-12, within / jnp.maximum(pooled, 1e-12), 1.0
    )
    mixing = jnp.clip(jnp.min(ratio), 0.0, 1.0)
    return tau, mixing


# ---------------------------------------------------------------------------
# Host-side entry
# ---------------------------------------------------------------------------


def _hoist_target(target_td, d: int, tile: int):
    """Hoist the target closure's array constants to explicit args.

    Pallas kernels cannot capture array constants, and
    ``jax.closure_convert`` only hoists *perturbable* ones — so trace
    the td target to a jaxpr and replay it in-kernel with its concrete
    consts passed as kernel inputs. Returns
    ``(fn(xt, *consts2d) -> (lpi, ll), consts2d, orig_shapes)`` with
    every const reshaped to >=2-D for VMEM; raises ``ValueError`` for
    non-float consts (the dispatcher falls back to the XLA path).
    """
    from jax._src.core import eval_jaxpr

    closed = jax.make_jaxpr(target_td)(
        jax.ShapeDtypeStruct((d, tile), jnp.float32)
    )
    consts = [jnp.asarray(c) for c in closed.consts]
    for c in consts:
        if not jnp.issubdtype(c.dtype, jnp.floating):
            raise ValueError(
                "fused chain target closes over a non-float array "
                f"constant {c.shape} {c.dtype}; not fusable"
            )
    shapes = tuple(c.shape for c in consts)
    consts2d = [
        c if c.ndim >= 2 else c.reshape((c.size, 1)) for c in consts
    ]
    jaxpr = closed.jaxpr

    def fn(xt, *cs):
        vals = [
            c.reshape(s) if c.shape != s else c
            for c, s in zip(cs, shapes)
        ]
        lpi, ll = eval_jaxpr(jaxpr, vals, xt)
        return lpi, ll

    return fn, consts2d, shapes


def _pick_tile(n: int, d: int, arch) -> int | None:
    """Largest supported tile dividing n (None = no fused dispatch)."""
    rows = max(((d + 1) // 2) * FC._group_size(arch), 1)
    budget = max(256, (98_304 // rows) // 128 * 128)
    for tile in (8192, 4096, 2048, 1024, 512, 256):
        if tile <= min(_DEF_TILE, budget) and n % tile == 0:
            return tile
    return None


def fused_mh_chain(
    cfg: ChainConfig,
    params: dict,
    z0,
    beta,
    seed,
    step0,
    ref_mean,
    ref_chol,
    ref_ichol,
    noise=None,
    tile: int | None = None,
    interpret: bool | None = None,
    target_td=None,
):
    """Run the full fused chain. All arrays f32.

    Parameters
    ----------
    z0 : (n, d) start positions (preconditioned space)
    beta : scalar inverse temperature
    seed : (2,) uint32/int32 per-mutation seed (ignored when ``noise``)
    step0 : scalar or (n_tiles,) initial step size (per-tile carry)
    noise : optional (n_steps, rows, n) injected noise (test mode)
    target_td : ``(d, T) -> (log_prior (1,T), log_likelihood (1,T))``

    Returns ``(z (n,d), lq, lpi, ll, n_accept (n,), step_sizes
    (n_tiles,), stats (n_tiles, W))``.
    """
    n, d = z0.shape
    arch = cfg.arch
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile is None:
        tile = _pick_tile(n, d, arch)
    if tile is None:
        raise ValueError(f"no fused tile for n={n}")
    n_tiles = n // tile

    if interpret and noise is None:
        # The HLO interpreter has no on-core PRNG (``prng_seed`` only
        # lowers on TPU): synthesize the per-step uniform rows from the
        # seed instead — CPU/test path only; the materialized noise is
        # (n_steps, rows, n), fine at test scale.
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(-1)
        k = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(0x5EED), seed_arr[0]),
            seed_arr[1],
        )
        noise = jax.random.uniform(
            k, (cfg.n_steps, cfg.noise_rows, n), jnp.float32
        )

    prepared = FC.prepare_params(arch, params)
    n_dense = len(prepared) // 2
    dt_params = list(cfg.dt_prog.params)
    pc_params = list(cfg.pc_prog.params)
    dt_params = [jnp.asarray(p, jnp.float32).reshape(
        (d, 1) if np.ndim(p) >= 1 and np.size(p) == d else (1, 1)
    ) for p in dt_params]
    pc_params = [jnp.asarray(p, jnp.float32).reshape(
        (d, 1) if np.ndim(p) >= 1 and np.size(p) == d else (1, 1)
    ) for p in pc_params]

    # The kernel evaluates targets per lane-half (MXU/VPU pipeline).
    target_conv, t_consts, t_shapes = _hoist_target(
        target_td, d, tile // 2
    )

    kernel = functools.partial(
        _chain_kernel,
        cfg,
        n_dense,
        target_conv,
        len(dt_params),
        len(pc_params),
        len(t_consts),
        noise is not None,
    )

    def full(shape):
        return pl.BlockSpec(
            shape, lambda i, nd=len(shape): (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    step0 = jnp.asarray(step0, jnp.float32).reshape(-1)
    if step0.shape[0] == 1:
        step0 = jnp.broadcast_to(step0, (n_tiles,))
    elif step0.shape[0] != n_tiles:
        # Tile count changed (population resize): restart adaptation
        # from the mean of the carried per-tile sizes.
        step0 = jnp.broadcast_to(jnp.mean(step0), (n_tiles,))

    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, n_tiles), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        full((d, 1)),
        full((d, d)),
        full((d, d)),
        pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    in_specs += [full(s.shape) for s in prepared]
    in_specs += [full(p.shape) for p in dt_params]
    in_specs += [full(p.shape) for p in pc_params]
    in_specs += [full(c.shape) for c in t_consts]
    args = [
        jnp.asarray(seed, jnp.int32).reshape(1, 2),
        jnp.asarray(beta, jnp.float32).reshape(1, 1),
        step0.reshape(1, n_tiles),
        jnp.asarray(ref_mean, jnp.float32).reshape(d, 1),
        jnp.asarray(ref_chol, jnp.float32),
        jnp.asarray(ref_ichol, jnp.float32),
        z0.T,
        *prepared,
        *dt_params,
        *pc_params,
        *t_consts,
    ]
    if noise is not None:
        rows = cfg.noise_rows
        in_specs.append(
            pl.BlockSpec(
                (cfg.n_steps, rows, tile),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(jnp.asarray(noise, jnp.float32))

    out_shape = (
        jax.ShapeDtypeStruct((d, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct(
            (n_tiles, _stats_rows(d), 1), jnp.float32
        ),
    )
    out_specs = (
        pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, _stats_rows(d), 1),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    zt, lq, lpi, ll, nacc, stats = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    stats = stats[:, :, 0]
    return (
        zt.T,
        lq[0],
        lpi[0],
        ll[0],
        nacc[0],
        stats[:, 0],
        stats,
    )
