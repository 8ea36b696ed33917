"""Phase breakdown + spline-variant A/B for the fused coupling kernel.

Interleaved in ONE process (tunnel RTT phase-skews cross-process
comparisons): per-variant 500-step in-jit chains, value-fetch sync,
medians. Variants:

  full       current kernel (softmax widths/heights, softplus derivs,
             3-log log_det)
  mm-only    spline replaced by passthrough -> isolates MXU matmul time
  1log       log_det via a single fused log (same math, fewer
             transcendentals)
  fastspline bent-identity normalization for widths/heights/derivs
             (1 sqrt each vs softmax exp / softplus exp+log) + 1log
  step       the real bench tpCN step (flow eval + target + RNG +
             accept) for overhead accounting
"""
import os, sys, time, functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from aspire_tpu.flows.architectures import Coupling
from aspire_tpu.ops import fused_coupling as fc

n, d, STEPS = 131072, 4, 500
x0 = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
arch = Coupling(dims=d, n_layers=4, n_hidden=(64, 64), transformer="rqs")
params = jax.tree.map(
    lambda p: p + 0.1 * jax.random.normal(jax.random.key(1), p.shape, p.dtype),
    arch.init(jax.random.key(0)))
prepared = fc.prepare_params(arch, params)


def med(run, reps=5):
    float(jnp.sum(run(x0)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(jnp.sum(run(x0)))
        ts.append(time.perf_counter() - t0)
    ts.sort(); return ts[len(ts) // 2] / STEPS * 1e3


def scan_of(body):
    @jax.jit
    def run(x):
        def step(c, _):
            return jnp.clip(body(c), -3, 3), None
        out, _ = jax.lax.scan(step, x, None, length=STEPS)
        return out
    return run


def passthrough_rows(v, hg, num_bins, tail_bound, inverse):
    # consume hg cheaply so the matmuls are not dead-code-eliminated
    return v + 1e-30 * hg[:, 0, :], jnp.zeros_like(v)


def rqs_1log(v, hg, num_bins, tail_bound, inverse):
    """Current spline but log_det collapsed into one log."""
    K, tb = num_bins, tail_bound
    w_raw = hg[:, :K, :]; h_raw = hg[:, K:2 * K, :]; d_raw = hg[:, 2 * K:3 * K, :]

    def bin_softmax(r):
        e = jnp.exp(r - jnp.max(r, axis=1, keepdims=True))
        return e / jnp.sum(e, axis=1, keepdims=True)

    widths = fc.DEFAULT_MIN_BIN_WIDTH + (1 - fc.DEFAULT_MIN_BIN_WIDTH * K) * bin_softmax(w_raw)
    heights = fc.DEFAULT_MIN_BIN_HEIGHT + (1 - fc.DEFAULT_MIN_BIN_HEIGHT * K) * bin_softmax(h_raw)
    return _rqs_tail(v, widths, heights, d_raw, K, tb, inverse,
                     deriv=lambda r: fc.DEFAULT_MIN_DERIVATIVE + jax.nn.softplus(r))


def bent(r):
    return 0.5 * (r + jnp.sqrt(r * r + 4.0))


def rqs_fast(v, hg, num_bins, tail_bound, inverse):
    """Bent-identity parametrization: g(r)=(r+sqrt(r^2+4))/2 normalized
    for widths/heights, g for derivatives; single-log log_det."""
    K, tb = num_bins, tail_bound
    g = bent(hg[:, :3 * K, :])
    w_g = g[:, :K, :]; h_g = g[:, K:2 * K, :]; d_g = g[:, 2 * K:3 * K, :]
    widths = fc.DEFAULT_MIN_BIN_WIDTH + (1 - fc.DEFAULT_MIN_BIN_WIDTH * K) * (
        w_g / jnp.sum(w_g, axis=1, keepdims=True))
    heights = fc.DEFAULT_MIN_BIN_HEIGHT + (1 - fc.DEFAULT_MIN_BIN_HEIGHT * K) * (
        h_g / jnp.sum(h_g, axis=1, keepdims=True))
    return _rqs_tail(v, widths, heights, d_g, K, tb, inverse,
                     deriv=lambda r: fc.DEFAULT_MIN_DERIVATIVE + r)


def _rqs_tail(v, widths, heights, d_pre, K, tb, inverse, deriv):
    w_scaled = widths * (2 * tb); h_scaled = heights * (2 * tb)
    x_hi = fc._cumsum_rows(w_scaled, K) - tb
    x_lo = x_hi - w_scaled
    y_hi = fc._cumsum_rows(h_scaled, K) - tb
    y_lo = y_hi - h_scaled
    row_k = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
    dp = deriv(d_pre)
    d_right_rows = jnp.where(row_k == K - 1, jnp.ones_like(dp), dp)
    d_left_rows = pltpu.roll(d_right_rows, 1, 1)
    inside = (v > -tb) & (v < tb)
    safe = jnp.clip(v, -tb, tb)[:, None, :]
    lo = y_lo if inverse else x_lo
    k = jnp.sum((safe >= lo).astype(jnp.int32), axis=1, keepdims=True) - 1
    k = jnp.clip(k, 0, K - 1)
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
    onehot = (k == bins).astype(v.dtype)

    def take(a):
        return jnp.sum(a * onehot, axis=1)

    x_k = take(x_lo); y_k = take(y_lo); w = take(w_scaled); h = take(h_scaled)
    d_k = take(d_left_rows); d_k1 = take(d_right_rows)
    s = h / w
    sv = safe[:, 0, :]
    if not inverse:
        xi = jnp.clip((sv - x_k) / w, 0.0, 1.0)
        xi_1m = 1 - xi
        num = h * (s * xi ** 2 + d_k * xi * xi_1m)
        den = s + (d_k1 + d_k - 2 * s) * xi * xi_1m
        outputs = y_k + num / den
    else:
        y_rel = sv - y_k
        a = h * (s - d_k) + y_rel * (d_k1 + d_k - 2 * s)
        b = h * d_k - y_rel * (d_k1 + d_k - 2 * s)
        c = -s * y_rel
        disc = jnp.maximum(b ** 2 - 4 * a * c, 0.0)
        xi = jnp.clip((2 * c) / (-b - jnp.sqrt(disc)), 0.0, 1.0)
        xi_1m = 1 - xi
        outputs = xi * w + x_k
        den = s + (d_k1 + d_k - 2 * s) * xi * xi_1m
    t = s / den
    val = t * t * (d_k1 * xi ** 2 + 2 * s * xi * xi_1m + d_k * xi_1m ** 2)
    log_det = jnp.log(val)
    if inverse:
        log_det = -log_det
    outputs = jnp.where(inside, outputs, v)
    log_det = jnp.where(inside, log_det, 0.0)
    return outputs, log_det


def kernel_body():
    return lambda x: fc._pallas_apply(arch, "forward", prepared, x, interpret=False)[0]


results = {}
orig = fc._rqs_rows
for name, impl in [
    ("full", orig),
    ("mm-only", passthrough_rows),
    ("1log", rqs_1log),
    ("fastspline", rqs_fast),
    ("full2", orig),  # re-measure to catch drift
]:
    fc._rqs_rows = impl
    results[name] = med(scan_of(kernel_body()))
    print(f"{name:11s}: {results[name]:7.3f} ms/eval", flush=True)
fc._rqs_rows = orig

# real bench step for overhead accounting
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import bench

mutate, bparams, bx, bbeta, bkey, _ = bench.build_workload(n, n_steps=STEPS)
float(jnp.sum(mutate(bparams, bx, bbeta, bkey, n_steps=STEPS)[0]))
ts = []
for i in range(5):
    bkey = jax.random.fold_in(bkey, i)
    t0 = time.perf_counter()
    out = mutate(bparams, bx, bbeta, bkey, n_steps=STEPS)
    float(jnp.sum(out[0]))
    ts.append(time.perf_counter() - t0)
ts.sort()
step_ms = ts[len(ts) // 2] / STEPS * 1e3
print(f"{'tpcn-step':11s}: {step_ms:7.3f} ms/step "
      f"({n / (step_ms / 1e3):.3e} particle-steps/s)")
print(f"spline share (full - mm_only): {results['full'] - results['mm-only']:.3f} ms")
print(f"non-flow overhead (step - full): {step_ms - results['full']:.3f} ms")
