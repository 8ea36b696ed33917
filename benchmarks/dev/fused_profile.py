"""Decompose the fused-chain kernel's per-step cost by variant.

Variants (all 131072 particles x 500 steps, nsf-tpu flow unless noted):
- tpcn:        the full kernel (A/B headline)
- tpcn-nostats: stats accumulation off (prices the AR(1)/mixing sums)
- pcn:         no gamma construction (prices the Gamma RNG)
- rwmh:        no gamma, no Mahalanobis (prices both)
- tpcn-cheapn: Box-Muller replaced by a sum-of-uniforms normal
               approximation (prices log/cos/sin transcendentals)
- tpcn-noflow: flow replaced by a quadratic (prices the flow pass)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import bench
from benchmarks.dev.fused_chain_ab import build_fused, measure_fused


def main():
    import jax

    n = 131072
    n_steps = 500
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    from functools import partial

    import jax.numpy as jnp

    from aspire_tpu.flows import Flow
    from aspire_tpu.models import GaussianMixtureProblem
    from aspire_tpu.ops import fused_mutation as FM
    from aspire_tpu.samplers import kernels as K

    problem = GaussianMixtureProblem(dims=4)
    flow = Flow(dims=4, **bench.BENCH_FLOW_KWARGS)
    arch = flow.architecture
    flow.params = jax.tree.map(
        lambda p: p
        + 0.1 * jax.random.normal(jax.random.key(7), p.shape, p.dtype),
        flow.params,
    )

    def target_td(xt):
        return problem.log_prior_td(xt), problem.log_likelihood_td(xt)

    def make_mutate(
        kernel="tpcn",
        track_stats=True,
        cheap_normals=False,
        skip_flow=False,
        tile=None,
    ):
        k2 = 9

        @partial(jax.jit, static_argnames=("n_steps",))
        def mutate(params, x, beta, seed, n_steps):
            cfg = FM.ChainConfig(
                arch, kernel, n_steps, nu=5.0,
                target_acceptance=0.234, adaptation_rate=0.1,
                gamma_m=k2 // 2, gamma_odd=k2 % 2,
                track_stats=track_stats,
            )
            cfg.cheap_normals = cheap_normals
            cfg.skip_flow = skip_flow
            gref = K.fit_gaussian_reference(x)
            out = FM.fused_mh_chain(
                cfg, params, x, beta, seed=seed, step0=0.5,
                ref_mean=gref.mean, ref_chol=gref.chol,
                ref_ichol=gref.inv_chol,
                target_td=target_td, interpret=False, tile=tile,
            )
            return out[0], out[4], out[5]

        return mutate

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    beta = jnp.asarray(0.5, jnp.float32)

    variants = [
        ("tpcn", {}),
        ("tpcn-t1024", {"tile": 1024}),
        ("tpcn-t4096", {"tile": 4096}),
        ("tpcn-noflow", {"skip_flow": True}),
        ("scaffold-min", {
            "kernel": "rwmh", "cheap_normals": True,
            "track_stats": False, "skip_flow": True,
        }),
        ("flow+min", {
            "kernel": "rwmh", "cheap_normals": True,
            "track_stats": False,
        }),
    ]
    if len(sys.argv) > 1:
        only = set(sys.argv[1].split(","))
        variants = [v for v in variants if v[0] in only]
    for name, kw in variants:
        mutate = make_mutate(**kw)
        rate, _ = measure_fused(mutate, flow.params, x, beta, n_steps, 3)
        print(
            json.dumps(
                {"variant": name, "rate": rate, "ns": 1e9 / rate}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
