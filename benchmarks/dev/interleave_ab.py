"""A/B: interleaved two-half kernel (MXU/VPU overlap) vs current.

The measured phase breakdown (phase_ab.py) is exactly additive:
matmul 0.182 + spline 0.356 = 0.539 ms measured -> the MXU sits idle
during the spline phase and vice versa. This prototype splits each
particle tile into two lane-halves and orders the work so half B's
conditioner matmuls (MXU) are issued before half A's spline math (VPU),
giving the scheduler a chance to overlap the units. Ceiling if overlap
is perfect: max(0.182, 0.356) ~= 0.36 ms.
"""
import os, sys, time, functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
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


def _mm(w_refs, n_dense, layer, cond, x, dtype):
    h = jnp.where(cond, x, jnp.zeros_like(x))
    for j in range(n_dense):
        w = w_refs[2 * j][layer]
        b = w_refs[2 * j + 1][layer]
        h = fc._conditioner_dot(w, h, dtype) + b
        if j < n_dense - 1:
            h = jax.nn.relu(h)
    return h


def _spline(arch, act, a, G, x, h, d):
    hg = h.reshape(a, G, h.shape[-1])
    v_rows = [x[i:i + 1, :] for i in act]
    if len(act) < a:
        v_rows.append(jnp.zeros_like(x[:1, :]))
    v = jnp.concatenate(v_rows, axis=0) if a > 1 else v_rows[0]
    y, eld = fc._rqs_rows(v, hg, arch.num_bins, arch.tail_bound, inverse=True)
    pos = {i: idx for idx, i in enumerate(act)}
    rows = [y[pos[i]:pos[i] + 1, :] if i in pos else x[i:i + 1, :]
            for i in range(d)]
    x = jnp.concatenate(rows, axis=0) if d > 1 else rows[0]
    return x, jnp.sum(eld[:len(act)], axis=0, keepdims=True)


def _interleaved_kernel(arch, n_dense, xt_ref, *refs):
    """Forward (density) pass only; two lane-halves, phases interleaved."""
    w_refs = refs[:2 * n_dense]
    zt_ref, ld_ref = refs[2 * n_dense], refs[2 * n_dense + 1]
    d = arch.dims
    G = fc._group_size(arch)
    a = (d + 1) // 2
    T = xt_ref.shape[-1]
    H = T // 2

    xA = xt_ref[:, :H]
    xB = xt_ref[:, H:]
    dtype = xA.dtype
    ldA = jnp.zeros((1, H), dtype=dtype)
    ldB = jnp.zeros((1, H), dtype=dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    # Software pipeline: issue the NEXT half's matmuls before the
    # current half's VPU spline so the units can overlap.
    cond0 = ((row % 2) + 0) % 2 == 1
    hA = _mm(w_refs, n_dense, 0, cond0, xA, dtype)
    for layer in range(arch.n_layers):
        cond = ((row % 2) + layer) % 2 == 1
        act = fc._active_dims(d, layer)
        hB = _mm(w_refs, n_dense, layer, cond, xB, dtype)   # MXU
        xA, eA = _spline(arch, act, a, G, xA, hA, d)        # VPU
        ldA += eA
        if layer + 1 < arch.n_layers:
            cond_n = ((row % 2) + layer + 1) % 2 == 1
            hA = _mm(w_refs, n_dense, layer + 1, cond_n, xA, dtype)  # MXU
        xB, eB = _spline(arch, act, a, G, xB, hB, d)        # VPU
        ldB += eB

    zt_ref[:, :H] = xA
    zt_ref[:, H:] = xB
    ld_ref[:, :H] = ldA
    ld_ref[:, H:] = ldB


def interleaved_apply(tile):
    def body(x):
        nn, dd = x.shape
        grid = (pl.cdiv(nn, tile),)
        kernel = functools.partial(_interleaved_kernel, arch, len(prepared) // 2)
        weight_specs = [
            pl.BlockSpec(s.shape, lambda i, nd=s.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for s in prepared
        ]
        zt, ld = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((dd, nn), x.dtype),
                       jax.ShapeDtypeStruct((1, nn), x.dtype)),
            grid=grid,
            in_specs=[pl.BlockSpec((dd, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)] + weight_specs,
            out_specs=(pl.BlockSpec((dd, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
        )(x.T, *prepared)
        return zt.T
    return body


current = lambda x: fc._pallas_apply(arch, "forward", prepared, x, interpret=False)[0]
print(f"current          : {med(scan_of(current)):7.3f} ms/eval", flush=True)
for tile in (2048, 4096):
    try:
        t = med(scan_of(interleaved_apply(tile)))
        print(f"interleaved@{tile}: {t:7.3f} ms/eval", flush=True)
    except Exception as e:
        print(f"interleaved@{tile}: FAILED {type(e).__name__}: {e}")
print(f"current again    : {med(scan_of(current)):7.3f} ms/eval", flush=True)

# correctness
ref = fc._pallas_apply(arch, "forward", prepared, x0, interpret=False)[0]
got = interleaved_apply(2048)(x0)
import numpy as np
print("max abs diff:", float(jnp.max(jnp.abs(ref - got))))
