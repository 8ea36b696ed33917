"""Cost of narrow transposes + fused kernel without transposes."""
import time
import jax, jax.numpy as jnp
from aspire_tpu.flows.architectures import Coupling
from aspire_tpu.ops.fused_coupling import prepare_params, _pallas_apply
import aspire_tpu.ops.fused_coupling as fc
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools, jax.numpy as jnp

n, d, STEPS = 131072, 4, 500
x0 = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
arch = Coupling(dims=d, n_layers=4, n_hidden=(64,64), transformer="rqs")
params = jax.tree.map(
    lambda p: p + 0.1*jax.random.normal(jax.random.key(1), p.shape, p.dtype),
    arch.init(jax.random.key(0)))
prepared = prepare_params(arch, params)

def scan_of(body):
    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), None
        out, _ = jax.lax.scan(step, x, None, length=STEPS)
        return out
    return run

def med(run, x, reps=5):
    float(jnp.sum(run(x)))
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); float(jnp.sum(run(x)))
        ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]/STEPS*1e3

# 1. transpose round trip cost
print(f"transpose RT : {med(scan_of(lambda x: (x.T*1.0001).T), x0):7.3f} ms/step")
print(f"elementwise  : {med(scan_of(lambda x: x*1.0001), x0):7.3f} ms/step")

# 2. fused kernel, state kept transposed across steps (no XLA transposes)
def pallas_transposed(xt):
    n_dense = len(prepared)//2
    tile = 1024
    kernel = functools.partial(fc._coupling_kernel, arch, "forward", n_dense)
    weight_specs = [
        pl.BlockSpec(s.shape, lambda i, nd=s.ndim: (0,)*nd, memory_space=pltpu.VMEM)
        for s in prepared]
    zt, ld = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((d, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.float32)),
        grid=(pl.cdiv(n, tile),),
        in_specs=[pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM)]
                 + weight_specs,
        out_specs=(pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)),
        interpret=False)(xt, *prepared)
    return zt, ld

xt0 = jnp.asarray(x0.T)
body_t = lambda xt: jnp.clip(pallas_transposed(xt)[0], -3, 3)
print(f"fusedT (d,n) : {med(scan_of(body_t), xt0):7.3f} ms/step")
body_n = lambda x: jnp.clip(_pallas_apply(arch, "forward", prepared, x, interpret=False)[0], -3, 3)
print(f"fused (n,d)  : {med(scan_of(body_n), x0):7.3f} ms/step")
xla_body = lambda x: jnp.clip(arch._forward_xla(params, x)[0], -3, 3)
print(f"xla (n,d)    : {med(scan_of(xla_body), x0):7.3f} ms/step")
