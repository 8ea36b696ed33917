"""A/B the bf16 conditioner path: rate + density perturbation."""
import sys, os
sys.path.insert(0, "/root/repo")
from bench import measure_rate, build_workload
import numpy as np

mode = "bf16" if os.environ.get("ASPIRE_TPU_BF16") == "1" else "f32"
rate = measure_rate(131072, n_steps=200, reps=5)
print(f"{mode}: {rate:.4e} particle-steps/s", flush=True)

# Density perturbation probe
import jax, jax.numpy as jnp
from aspire_tpu.flows import Flow
flow = Flow(dims=4, architecture="nsf", key=0, n_layers=4, n_hidden=(64, 64))
flow.params = jax.tree.map(
    lambda p: p + 0.1 * jax.random.normal(jax.random.key(7), p.shape, p.dtype),
    flow.params)
x = jnp.asarray(np.random.default_rng(0).normal(size=(8192, 4)), jnp.float32)
lq = np.asarray(flow.log_prob(x))
np.save(f"/tmp/lq_{mode}.npy", lq)
if mode == "bf16" and os.path.exists("/tmp/lq_f32.npy"):
    ref = np.load("/tmp/lq_f32.npy")
    d = np.abs(lq - ref)
    print(f"log_q perturbation: max={d.max():.2e} mean={d.mean():.2e}", flush=True)
