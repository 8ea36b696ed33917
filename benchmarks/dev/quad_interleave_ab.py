"""A/B: Q-way lane-slice software pipelining of the coupling kernel.

The shipped 2-way pipeline leaves the VPU idle ~28% of the time
(0.497 ms vs the 0.36 ms spline-bound ceiling). With Q slices offset
one layer apart, Q-1 slices' spline work is available while one
slice's matmuls are in flight — more independent work for Mosaic's
scheduler at every point.
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
L = arch.n_layers
n_dense = len(prepared) // 2


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


def _q_kernel(Q, xt_ref, *refs):
    """Q lane-slices, slice q runs layer (stage - q); density pass."""
    w_refs = refs[:2 * n_dense]
    zt_ref, ld_ref = refs[2 * n_dense], refs[2 * n_dense + 1]
    T = xt_ref.shape[-1]
    H = T // Q
    xs = [xt_ref[:, q * H:(q + 1) * H] for q in range(Q)]
    dtype = xs[0].dtype
    lds = [jnp.zeros((1, H), dtype=dtype) for _ in range(Q)]
    hs = [None] * Q

    for stage in range(L + Q - 1):
        # issue matmuls for every slice whose layer starts this stage
        for q in range(Q):
            layer = stage - q
            if 0 <= layer < L and hs[q] is None:
                hs[q] = fc._layer_matmuls(
                    arch, w_refs, n_dense, layer, xs[q], dtype
                )
        # then run the spline (VPU) for each active slice; issue the
        # NEXT layer's matmuls for a slice right after its spline so
        # the following slices' splines can overlap them
        for q in range(Q):
            layer = stage - q
            if 0 <= layer < L:
                xs[q], e = fc._layer_transform(
                    arch, layer, xs[q], hs[q], True
                )
                lds[q] = lds[q] + e
                hs[q] = None
                if layer + 1 < L:
                    hs[q] = fc._layer_matmuls(
                        arch, w_refs, n_dense, layer + 1, xs[q], dtype
                    )
    zt_ref[:] = jnp.concatenate(xs, axis=1)
    ld_ref[:] = jnp.concatenate(lds, axis=1)


def q_apply(Q, tile):
    def body(x):
        nn, dd = x.shape
        grid = (pl.cdiv(nn, tile),)
        kernel = functools.partial(_q_kernel, Q)
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
print(f"shipped 2-way      : {med(scan_of(current)):7.3f} ms/eval", flush=True)
for Q, tile in [(2, 4096), (4, 4096), (4, 8192), (8, 8192), (3, 6144)]:
    try:
        t = med(scan_of(q_apply(Q, tile)))
        print(f"Q={Q} tile={tile:5d}    : {t:7.3f} ms/eval", flush=True)
    except Exception as e:
        print(f"Q={Q} tile={tile}: FAILED {type(e).__name__}: {str(e)[:90]}")
print(f"shipped again      : {med(scan_of(current)):7.3f} ms/eval", flush=True)
ref = current(x0)
got = q_apply(4, 4096)(x0)
print("Q=4 max abs diff:", float(jnp.max(jnp.abs(ref - got))))
