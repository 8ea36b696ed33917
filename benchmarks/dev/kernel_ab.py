"""A/B: roll-based vs matmul-based in-kernel cumsum, on TPU."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
from aspire_tpu.flows.architectures import Coupling
from aspire_tpu.ops import fused_coupling as fc

n, d, STEPS = 131072, 4, 500
x0 = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
arch = Coupling(dims=d, n_layers=4, n_hidden=(64,64), transformer="rqs")
params = jax.tree.map(
    lambda p: p + 0.1*jax.random.normal(jax.random.key(1), p.shape, p.dtype),
    arch.init(jax.random.key(0)))
prepared = fc.prepare_params(arch, params)

def med(run, reps=5):
    float(jnp.sum(run(x0)))
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); float(jnp.sum(run(x0)))
        ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]/STEPS*1e3

def scan_of(body):
    @jax.jit
    def run(x):
        def step(c, _):
            return jnp.clip(body(c), -3, 3), None
        out, _ = jax.lax.scan(step, x, None, length=STEPS)
        return out
    return run

def cumsum_matmul(a, K):
    dd, _, T = a.shape
    a2 = a.reshape(dd*K, T)
    r = jax.lax.broadcasted_iota(jnp.int32, (dd*K, dd*K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (dd*K, dd*K), 1)
    M = ((r // K == c // K) & (c % K <= r % K)).astype(a.dtype)
    out = jnp.dot(M, a2, preferred_element_type=jnp.float32).astype(a.dtype)
    return out.reshape(dd, K, T)

orig = fc._cumsum_rows
body = lambda x: fc._pallas_apply(arch, "forward", prepared, x, interpret=False)[0]
print(f"roll   : {med(scan_of(body)):7.3f} ms/step")
fc._cumsum_rows = cumsum_matmul
body2 = lambda x: fc._pallas_apply(arch, "forward", prepared, x, interpret=False)[0]
print(f"matmul : {med(scan_of(body2)):7.3f} ms/step")
fc._cumsum_rows = orig
