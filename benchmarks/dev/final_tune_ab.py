"""Final tuning A/B: tile size sweep, interleave, PRNG impl for the
bench tpCN step. All in one process, interleaved, 500-step chains."""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
from aspire_tpu.flows.architectures import Coupling
from aspire_tpu.ops import fused_coupling as fc

n, d, STEPS = 131072, 4, 500
x0 = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
arch = Coupling(dims=d, n_layers=4, n_hidden=(64, 64), transformer="rqs")
params = jax.tree.map(
    lambda p: p + 0.1 * jax.random.normal(jax.random.key(1), p.shape, p.dtype),
    arch.init(jax.random.key(0)))
prepared = fc.prepare_params(arch, params)


def med(run, x=x0, reps=5):
    float(jnp.sum(run(x)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(jnp.sum(run(x)))
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


import benchmarks.dev.interleave_ab as iab  # reuse the interleaved kernel

cur = lambda x: fc._pallas_apply(arch, "forward", prepared, x, interpret=False)[0]
for tile in (1024, 2048, 4096, 8192):
    fc._TILE = tile
    print(f"current@{tile:5d}     : {med(scan_of(cur)):7.3f} ms/eval", flush=True)
fc._TILE = 2048
for tile in (4096, 8192):
    try:
        print(f"interleaved@{tile:5d} : {med(scan_of(iab.interleaved_apply(tile))):7.3f} ms/eval", flush=True)
    except Exception as e:
        print(f"interleaved@{tile}: FAILED {e}")

# PRNG impl A/B on the real bench step
import bench
mutate, bparams, bx, bbeta, k_fry, _ = bench.build_workload(n, n_steps=STEPS)

def step_rate(key):
    float(jnp.sum(mutate(bparams, bx, bbeta, key, n_steps=STEPS)[0]))
    ts = []
    for i in range(5):
        key2 = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = mutate(bparams, bx, bbeta, key2, n_steps=STEPS)
        float(jnp.sum(out[0]))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / STEPS * 1e3

ms_fry = step_rate(jax.random.key(1))
print(f"tpcn step threefry : {ms_fry:7.3f} ms ({n/(ms_fry/1e3):.3e} ps/s)", flush=True)
ms_rbg = step_rate(jax.random.key(1, impl="rbg"))
print(f"tpcn step rbg      : {ms_rbg:7.3f} ms ({n/(ms_rbg/1e3):.3e} ps/s)", flush=True)
ms_fry2 = step_rate(jax.random.key(3))
print(f"tpcn step threefry2: {ms_fry2:7.3f} ms", flush=True)
