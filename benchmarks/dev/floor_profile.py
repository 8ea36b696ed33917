"""Decompose the mutation-step floor: flow vs proposal vs RNG.

The round-4 Pareto sweep saturates at ~330M particle-steps/s for tiny
flows — implying a non-flow floor that even the nsf-tpu preset's rate
partially hides. Variants isolate the components (each measured with
bench.measure_rate's 500-step in-jit methodology, same process):

- preset:       the shipping nsf-tpu flow
- tiny:         L2-H32x2-B4 (flow nearly free)
- noflow:       log_q = cheap quadratic (no flow at all) -> the floor
- noflow-lite:  floor minus the Gaussian-reference Mahalanobis terms
                (plain pCN accept on the quadratic target)

Run twice: JAX_DEFAULT_PRNG_IMPL unset (threefry) and =rbg, to price
the RNG inside the floor.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import bench


def measure(mutate, params, x, beta, key, n_steps=500, reps=3):
    import jax

    out = mutate(params, x, beta, key, n_steps=n_steps)
    np.asarray(out[0][0, 0])
    times = []
    for i in range(reps):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = mutate(params, out[0], beta, key, n_steps=n_steps)
        np.asarray(out[0][0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return x.shape[0] * n_steps / times[len(times) // 2]


def noflow_workload(n_particles, dims=4, lite=False):
    import jax
    import jax.numpy as jnp

    from aspire_tpu.samplers import kernels as K

    def log_prob_fn(z):
        return -0.5 * jnp.sum(z * z, axis=-1)

    @partial(jax.jit, static_argnames=("n_steps",))
    def mutate(params, x, beta, key, n_steps):
        del params, beta
        ref = K.fit_gaussian_reference(x)
        if lite:
            # Identity reference: keeps the tpCN control flow but
            # removes the Mahalanobis/solve terms from the hot loop.
            ref = type(ref)(
                mean=jnp.zeros_like(ref.mean),
                chol=jnp.eye(x.shape[1], dtype=x.dtype),
                inv_chol=jnp.eye(x.shape[1], dtype=x.dtype),
            )
        step = partial(K.tpcn_step, log_prob_fn=log_prob_fn, ref=ref)
        state = K.ChainState(
            x=x,
            log_prob=log_prob_fn(x),
            key=key,
            step_size=jnp.asarray(0.5, dtype=x.dtype),
            n_accept=jnp.zeros(x.shape[0], dtype=x.dtype),
        )
        final, _ = K.run_chain(step, state, n_steps)
        return final.x, final.log_prob

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(n_particles, dims)), dtype=jnp.float32
    )
    return mutate, None, x, jnp.asarray(0.5, jnp.float32), jax.random.key(1)


def main():
    n = 131072
    impl = os.environ.get("JAX_DEFAULT_PRNG_IMPL", "threefry")
    rows = {}
    rows["preset"] = bench.measure_rate(
        n, n_steps=500, reps=3,
        flow_kwargs={"architecture": "nsf-tpu", "key": 0},
    )
    rows["tiny"] = bench.measure_rate(
        n, n_steps=500, reps=3,
        flow_kwargs={
            "architecture": "nsf", "key": 0, "n_layers": 2,
            "n_hidden": (32, 32), "num_bins": 4,
        },
    )
    for name, lite in (("noflow", False), ("noflow-lite", True)):
        args = noflow_workload(n, lite=lite)
        rows[name] = measure(*args)
    for name, rate in rows.items():
        print(
            json.dumps(
                {
                    "prng": impl,
                    "variant": name,
                    "rate": rate,
                    "ns_per_ps": round(1e9 / rate, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
