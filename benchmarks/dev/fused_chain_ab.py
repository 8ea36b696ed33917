"""A/B: fused whole-chain mutation kernel vs the shipped per-step path.

Same workload as bench.py's headline (nsf-tpu flow, 4-d Gaussian
mixture tempered target, tpCN): measures particle-steps/s for
 A: the shipped XLA chain (lax.scan of tpcn_step, fused flow kernel)
 B: the fused chain kernel (ops/fused_mutation: one Pallas launch for
    the whole chain, in-kernel PRNG)
interleaved in one process (tunnel RTT swings; see bench.py notes),
plus a statistical sanity block: acceptance rates and the first two
moments of the mutated population must agree between paths.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import bench


def build_fused(n_particles, dims=4, flow_kwargs=None):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from aspire_tpu.flows import Flow
    from aspire_tpu.models import GaussianMixtureProblem
    from aspire_tpu.ops import fused_mutation as FM
    from aspire_tpu.samplers import kernels as K

    problem = GaussianMixtureProblem(dims=dims)
    flow = Flow(dims=dims, **(flow_kwargs or bench.BENCH_FLOW_KWARGS))
    arch = flow.architecture
    flow.params = jax.tree.map(
        lambda p: p
        + 0.1 * jax.random.normal(jax.random.key(7), p.shape, p.dtype),
        flow.params,
    )

    def target_td(xt):
        return problem.log_prior_td(xt), problem.log_likelihood_td(xt)

    nu = 5.0
    k2 = int(round(nu + dims))

    def make_cfg(n_steps):
        return FM.ChainConfig(
            arch, "tpcn", n_steps, nu=nu,
            target_acceptance=0.234, adaptation_rate=0.1,
            gamma_m=k2 // 2, gamma_odd=k2 % 2,
        )

    @partial(jax.jit, static_argnames=("n_steps",))
    def mutate(params, x, beta, seed, n_steps):
        cfg = make_cfg(n_steps)
        gref = K.fit_gaussian_reference(x)
        z, lq, lpi, ll, nacc, steps, stats = FM.fused_mh_chain(
            cfg, params, x, beta,
            seed=seed, step0=0.5,
            ref_mean=gref.mean, ref_chol=gref.chol,
            ref_ichol=gref.inv_chol,
            target_td=target_td, interpret=False,
        )
        return z, nacc, steps

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_particles, dims)), jnp.float32)
    beta = jnp.asarray(0.5, jnp.float32)
    return mutate, flow.params, x, beta


def measure_fused(mutate, params, x, beta, n_steps, reps):
    import jax.numpy as jnp

    seed = jnp.asarray([1, 0], jnp.int32)
    out = mutate(params, x, beta, seed, n_steps=n_steps)
    np.asarray(out[0][0, 0])
    times = []
    for i in range(reps):
        seed = jnp.asarray([1, i + 1], jnp.int32)
        t0 = time.perf_counter()
        out = mutate(params, out[0], beta, seed, n_steps=n_steps)
        np.asarray(out[0][0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return x.shape[0] * n_steps / times[len(times) // 2], out


def main():
    import jax

    n = 131072
    n_steps = 500
    reps = 5
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    # Build both paths up front.
    xla = bench.build_workload(n, n_steps=n_steps)
    fused = build_fused(n)

    # Warm both, then interleave timed calls.
    mutate_x, params_x, x_x, beta_x, key_x, _ = xla
    mutate_f, params_f, x_f, beta_f = fused

    rate_x = bench.measure_rate(n, n_steps=n_steps, reps=reps)
    rate_f, out_f = measure_fused(
        mutate_f, params_f, x_f, beta_f, n_steps, reps
    )
    print(
        json.dumps(
            {
                "xla_rate": rate_x,
                "fused_rate": rate_f,
                "speedup": rate_f / rate_x,
                "ns_per_ps_xla": 1e9 / rate_x,
                "ns_per_ps_fused": 1e9 / rate_f,
            }
        ),
        flush=True,
    )

    # Statistical sanity: both chains target the same tempered density;
    # run a moderate chain from the same start and compare moments.
    import jax.numpy as jnp

    k_steps = 200
    out_x = mutate_x(
        params_x, x_x, beta_x, jax.random.key(5), n_steps=k_steps
    )
    x_a = np.asarray(out_x[0])
    _, out_fs = measure_fused(
        mutate_f, params_f, x_f, beta_f, k_steps, 1
    )
    x_b = np.asarray(out_fs[0])
    nacc = np.asarray(out_fs[1])
    acc_fused = float(nacc.mean() / k_steps)
    print(
        json.dumps(
            {
                "moment_check": {
                    "mean_xla": x_a.mean(0).tolist(),
                    "mean_fused": x_b.mean(0).tolist(),
                    "std_xla": x_a.std(0).tolist(),
                    "std_fused": x_b.std(0).tolist(),
                },
                "acceptance_fused": acc_fused,
                "step_sizes_fused_minmax": [
                    float(np.asarray(out_fs[2]).min()),
                    float(np.asarray(out_fs[2]).max()),
                ],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
