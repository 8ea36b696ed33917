"""A/B: MAF-RQS density pass, XLA vs fused, in-scan on TPU."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
from aspire_tpu.flows.architectures import MAF
from aspire_tpu.ops.fused_coupling import fused_maf_forward

n, d, STEPS = 131072, 4, 500
x0 = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
arch = MAF(dims=d, n_layers=4, n_hidden=(64,64), transformer="rqs")
params = jax.tree.map(
    lambda p: p + 0.1*jax.random.normal(jax.random.key(1), p.shape, p.dtype),
    arch.init(jax.random.key(0)))

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
            z, ld = body(c)
            return jnp.clip(z, -3, 3) + 1e-6*ld[:, None], None
        out, _ = jax.lax.scan(step, x, None, length=STEPS)
        return out
    return run

z1, l1 = arch._forward_xla(params, x0)
z2, l2 = fused_maf_forward(arch, params, x0)
print(f"max |dz|={float(jnp.max(jnp.abs(z1-z2))):.2e} "
      f"|dld|={float(jnp.max(jnp.abs(l1-l2))):.2e}")
print(f"xla   : {med(scan_of(lambda x: arch._forward_xla(params, x))):7.3f} ms/step")
print(f"fused : {med(scan_of(lambda x: fused_maf_forward(arch, params, x))):7.3f} ms/step")
