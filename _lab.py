"""Amortized in-scan A/B lab: flow fwd variants, RTT-robust."""
import time
import jax, jax.numpy as jnp
from aspire_tpu.flows.architectures import Coupling
from aspire_tpu.ops.fused_coupling import fused_coupling_apply

n, d, STEPS = 131072, 4, 500
x0 = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)

def make_scan(fwd_fn):
    @jax.jit
    def run(x):
        def body(c, _):
            z, ld = fwd_fn(c)
            return jnp.clip(z, -3, 3) + 1e-6*ld[:, None], None
        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return out
    return run

def med(run, reps=5):
    float(jnp.sum(run(x0)))
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); float(jnp.sum(run(x0)))
        ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]/STEPS*1e3

variants = []
for hidden in [(8,8), (64,64), (128,128)]:
    for trans in ["affine", "rqs"]:
        arch = Coupling(dims=d, n_layers=4, n_hidden=hidden, transformer=trans)
        params = jax.tree.map(
            lambda p: p + 0.1*jax.random.normal(jax.random.key(1), p.shape, p.dtype),
            arch.init(jax.random.key(0)))
        variants.append((f"xla-{trans}-h{hidden[0]}", make_scan(
            lambda x, a=arch, p=params: a._forward_xla(p, x))))
        variants.append((f"fused-{trans}-h{hidden[0]}", make_scan(
            lambda x, a=arch, p=params: fused_coupling_apply(a, "forward", p, x))))
for name, run in variants:
    print(f"{name:22s} {med(run):7.3f} ms/step", flush=True)
