"""A/B: ring vs bucketed-all_to_all sharded resampling schedules.

On this environment only the 8-device virtual CPU mesh is available, so
wall numbers are structural; the real difference is the bytes moved:
ring = n*cols per device regardless of weights, all_to_all = S*cap*cols
per device (cap ~ 4*chunk/S by default) -> ~S/4x less traffic at pod
scale. Run: JAX_PLATFORMS=cpu python benchmarks/dev/resample_collective_ab.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from aspire_tpu.parallel.mesh import make_mesh
from aspire_tpu.ops import resampling as R

mesh = make_mesh(8)
n, d, REPS = 1 << 18, 8, 20
sh = NamedSharding(mesh, P("data"))
rng = np.random.default_rng(0)
key = jax.random.key(7)
lw = jax.device_put(jnp.asarray(rng.normal(size=n), jnp.float32), sh)
x = jax.device_put(jnp.asarray(rng.normal(size=(n, d)), jnp.float32), sh)

S = 8
chunk = n // S
variants = {
    "ring": lambda: R.ring_resample_matrix(key, lw, x, mesh),
    "alltoall(cap=4c/S)": lambda: R.alltoall_resample_matrix(key, lw, x, mesh),
}
for name, fn in variants.items():
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:20s}: {ms:7.2f} ms/resample @ n={n}")
# Bit-exactness reference: the REPLICATED single-device index order.
# (GSPMD's sharded f32 cumsum may reorder the prefix sum and flip
# ~1% of bin boundaries at this size; ring and all_to_all always agree
# with each other and with the replicated order.)
lw_rep = jnp.asarray(np.asarray(lw))
ref = jnp.asarray(np.asarray(x))[R.get_resampler("systematic")(key, lw_rep, n)]
a2a = R.alltoall_resample_matrix(key, lw, x, mesh)
ring = R.ring_resample_matrix(key, lw, x, mesh)
print("a2a == ring:", bool(jnp.all(a2a == ring)))
print("a2a == replicated ref:", bool(jnp.all(a2a == ref)))
cap = min(chunk, max(4 * chunk // S, 16))
print(f"bytes/device: ring = {n*d*4/1e6:.2f} MB, alltoall = {S*cap*d*4/1e6:.2f} MB")
