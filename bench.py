"""Benchmark: tempered-SMC mutation throughput on the available device.

Prints ONE JSON line:
  {"metric": "smc_particle_steps_per_s", "value": N, "unit":
   "particle-steps/s", "vs_baseline": R}

The workload is the SMC hot loop named in BASELINE.json: tpCN mutation
chains over an HBM-resident (n, d) particle array, each step evaluating
the fused flow-log-prob + tempered-target kernel. ``vs_baseline``
compares against a host-CPU run of the identical jitted workload
(the reference implementation is CPU-orchestrated numpy/torch, so the
CPU rate is the honest stand-in for its ceiling; the reference repo
publishes no numbers — BASELINE.md).

Also runs a small end-to-end SMC for a logZ correctness anchor
(two-Gaussian mixture; analytic evidence), reported on stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _log(*args):
    print(*args, file=sys.stderr, flush=True)


_PIPELINE_S = None  # set by correctness_anchor


# The benchmarked flow configuration: the TPU-tuned preset promoted by
# the round-4 Pareto sweep (benchmarks/dev/flow_pareto.py +
# flow_pareto_refit.py; table in benchmarks/RESULTS.md). The CPU
# baseline subprocess uses the same config, so vs_baseline stays an
# identical-workload comparison.
BENCH_FLOW_KWARGS = {"architecture": "nsf-tpu", "key": 0}


def build_workload(
    n_particles: int,
    dims: int = 4,
    n_steps: int = 20,
    flow_kwargs: dict | None = None,
    prng_impl: str | None = None,
    fused_chain: bool = False,
):
    import jax
    import jax.numpy as jnp

    from aspire_tpu.flows import Flow
    from aspire_tpu.models import GaussianMixtureProblem
    from aspire_tpu.samplers import kernels as K
    from aspire_tpu.flows.bijectors import standard_normal_log_prob

    problem = GaussianMixtureProblem(dims=dims)
    flow = Flow(dims=dims, **(flow_kwargs or BENCH_FLOW_KWARGS))
    arch = flow.architecture
    data_transform = flow.data_transform
    # Perturb away from the zero-init identity so the benchmark exercises
    # a realistic trained flow (identity-flow timings are unrepresentative).
    flow.params = jax.tree.map(
        lambda p: p
        + 0.1 * jax.random.normal(jax.random.key(7), p.shape, p.dtype),
        flow.params,
    )

    class _View:
        __slots__ = ("x",)

    def tempered(params, x, beta):
        x_t, log_j = data_transform.forward(x)
        z, log_det = arch.forward(params, x_t)
        log_q = standard_normal_log_prob(z) + log_det + log_j
        view = _View()
        view.x = x
        log_l = problem.log_likelihood(view)
        log_pi = problem.log_prior(view)
        log_p = (1 - beta) * log_q + beta * (log_l + log_pi)
        return jnp.where(jnp.isnan(log_p), -jnp.inf, log_p)

    from functools import partial

    if fused_chain:
        # The shipped device hot path: ONE Pallas launch per whole
        # chain (ops/fused_mutation) — the same kernel the SMC
        # dispatches to (smc._mutate_on_device_fused / device ladder).
        from aspire_tpu.ops import fused_mutation as FM

        def target_td(xt):
            return (
                problem.log_prior_td(xt),
                problem.log_likelihood_td(xt),
            )

        k2 = int(round(5.0 + dims))

        @partial(jax.jit, static_argnames=("n_steps",))
        def mutate(params, x, beta, key, n_steps):
            cfg = FM.ChainConfig(
                arch, "tpcn", n_steps, nu=5.0,
                target_acceptance=0.234, adaptation_rate=0.1,
                dt_prog=FM.canonicalize_transform(
                    data_transform, dims
                ),
                gamma_m=k2 // 2, gamma_odd=k2 % 2,
                # The bench workload has always measured the bare
                # chain (the XLA variant runs run_chain without
                # track_autocorr); keep the comparison symmetric.
                track_stats=False,
            )
            gref = K.fit_gaussian_reference(x)
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(key, (2,), jnp.uint32), jnp.int32
            )
            out = FM.fused_mh_chain(
                cfg, params, x, beta, seed, 0.5,
                gref.mean, gref.chol, gref.inv_chol,
                target_td=target_td, interpret=False,
            )
            return out[0], out[1]

    else:

        @partial(jax.jit, static_argnames=("n_steps",))
        def mutate(params, x, beta, key, n_steps):
            log_prob_fn = lambda z: tempered(  # noqa: E731
                params, z, beta
            )
            ref = K.fit_gaussian_reference(x)
            step = partial(
                K.tpcn_step, log_prob_fn=log_prob_fn, ref=ref
            )
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
    x = jnp.asarray(rng.normal(size=(n_particles, dims)), dtype=jnp.float32)
    key = (
        jax.random.key(1)
        if prng_impl is None
        else jax.random.key(1, impl=prng_impl)
    )
    beta = jnp.asarray(0.5, dtype=jnp.float32)
    return mutate, flow.params, x, beta, key, n_steps


def measure_rate(
    n_particles: int,
    n_steps: int = 200,
    reps: int = 5,
    flow_kwargs: dict | None = None,
    prng_impl: str | None = None,
    fused_chain: bool = False,
) -> float:
    """Median mutation throughput in particle-steps/s.

    Methodology notes (hard-won on the tunneled TPU backend):
    - ``block_until_ready`` can report readiness before execution
      completes there — a host value fetch (np.asarray of a scalar) is
      the only trustworthy sync.
    - Per-call round-trip latency swings 0.05-30 ms by the minute, so
      each timed call runs a long (``n_steps``-step) chain inside one
      jit to amortize it, and the median over ``reps`` calls is
      reported.
    """
    import jax

    mutate, params, x, beta, key, n_steps = build_workload(
        n_particles,
        n_steps=n_steps,
        flow_kwargs=flow_kwargs,
        prng_impl=prng_impl,
        fused_chain=fused_chain,
    )
    out = mutate(params, x, beta, key, n_steps=n_steps)
    np.asarray(out[0][0, 0])  # warmup/compile + hard sync
    times = []
    for i in range(reps):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = mutate(params, out[0], beta, key, n_steps=n_steps)
        np.asarray(out[0][0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return n_particles * n_steps / times[len(times) // 2]


# Published TPU v5e (v5 lite) per-chip ceilings.
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def roofline_model(
    n_particles: int, dims: int = 4, flow_kwargs: dict | None = None
) -> dict:
    """Analytic bytes/FLOPs per particle-step for the mutation kernel.

    XLA's ``cost_analysis`` does not multiply through scan bodies on
    this backend (it reports ~92 flops/particle-step for a kernel with
    three 64-wide matmuls), so the count is built from the actual flow
    parameter shapes: every weight matrix ``(a, b)`` contributes
    ``2ab`` FLOPs per particle per density evaluation, one evaluation
    per tpCN step, plus small-term estimates for the spline search,
    the tpCN proposal (Mahalanobis distances, gamma construction), and
    the target density.

    HBM bytes per particle-step: the chain state (positions + density
    + RNG-derived proposal buffers) is read and written once per step;
    activations of the 64-wide MLP stay in VMEM after fusion; the flow
    parameters are re-read once per STEP, amortized over the particle
    batch.
    """
    from aspire_tpu.flows import Flow

    flow = Flow(dims=dims, **(flow_kwargs or BENCH_FLOW_KWARGS))
    import jax

    matmul_flops = 0
    param_bytes = 0
    for leaf in jax.tree_util.tree_leaves(flow.params):
        param_bytes += leaf.size * leaf.dtype.itemsize
        if leaf.ndim == 2:
            matmul_flops += 2 * leaf.shape[0] * leaf.shape[1]
    spline_flops = dims * (3 * 8 + 30)  # bin search + RQ evaluation
    proposal_flops = 4 * dims * dims + 16 * dims + 60  # tpCN + target
    flops_per_ps = matmul_flops + spline_flops + proposal_flops

    state_bytes = 2 * 4 * (2 * dims + 4)  # r/w: x, proposal, densities
    bytes_per_ps = state_bytes + param_bytes / n_particles
    return {
        "flops_per_particle_step": float(flops_per_ps),
        "bytes_per_particle_step": float(bytes_per_ps),
    }


def roofline_report(rate: float, model: dict) -> dict:
    """Achieved fraction of the v5e compute / bandwidth ceilings."""
    tflops = rate * model["flops_per_particle_step"] / 1e12
    gbs = rate * model["bytes_per_particle_step"] / 1e9
    pct_compute = tflops / V5E_PEAK_BF16_TFLOPS
    pct_hbm = gbs / V5E_PEAK_HBM_GBS
    return {
        "achieved_tflops_f32": tflops,
        "achieved_hbm_gbs": gbs,
        # f32 math measured against the published bf16 MXU peak: a
        # LOWER bound on MXU utilization (f32 throughput is a fraction
        # of bf16's), so the compute ceiling binds even harder than
        # this number suggests.
        "pct_of_bf16_compute_peak": pct_compute,
        "pct_of_hbm_peak": pct_hbm,
        "binding_ceiling": (
            "compute (MXU)" if pct_compute >= pct_hbm else "HBM"
        ),
        "model_pct_of_roofline": max(pct_compute, pct_hbm),
    }


def correctness_anchor() -> dict:
    """Small end-to-end SMC on the mixture; logZ vs analytic. Also
    times the repeat-call 131072-particle pipeline (compiled programs
    are cached across sample_posterior calls; the default path
    auto-compiles the whole adaptive ladder into one dispatch)."""
    import jax

    from aspire_tpu import Aspire, Samples
    from aspire_tpu.models import GaussianMixtureProblem

    p = GaussianMixtureProblem(dims=4)
    rng = np.random.default_rng(42)
    init = Samples(p.draw_initial_samples(rng, 4000))
    asp = Aspire(
        log_likelihood=p.log_likelihood,
        log_prior=p.log_prior,
        dims=4,
        parameters=p.parameters,
        flow_backend="nsf",
        architecture="nsf-tpu",
        seed=1,
    )
    asp.fit(init, n_epochs=20, batch_size=512, learning_rate=3e-3)
    samples = asp.sample_posterior(
        sampler="smc", n_samples=8192, sampler_kwargs=dict(n_steps=20)
    )

    pipeline = dict(
        sampler="smc",
        n_samples=131072,
        store_sample_history=False,
        sampler_kwargs=dict(n_steps=20),
    )
    asp.sample_posterior(**pipeline)  # compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        asp.sample_posterior(**pipeline)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    _log(
        f"default 131072-particle pipeline (compiled, median of 3): "
        f"{walls[1]:.3f}s"
    )
    global _PIPELINE_S
    _PIPELINE_S = walls[1]
    # Analytic: Z = 0.5 N(mu1; 0, (0.5+1) I) + 0.5 N(mu2; 0, (1+1) I).
    d = 4
    def gauss_at_zero(mu, var):
        return float(
            np.exp(-0.5 * np.sum(mu**2) / var)
            / (2 * np.pi * var) ** (d / 2)
        )
    true = np.log(
        0.5 * gauss_at_zero(p.mu1, 1.5) + 0.5 * gauss_at_zero(p.mu2, 2.0)
    )
    return {
        "log_z": float(samples.log_evidence),
        "log_z_err": float(samples.log_evidence_error),
        "true_log_z": float(true),
    }


def _cpu_env() -> dict:
    """Environment for a guaranteed-CPU child process.

    The axon sitecustomize hook (gated on PALLAS_AXON_POOL_IPS) can
    block EVERY jax backend init when the tunnel relay is wedged —
    including ``jax_platforms=cpu`` set in-process. Dropping the gate
    variable and pinning JAX_PLATFORMS is the only reliable CPU path.
    """
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _backend_alive(timeout_s: float = 120.0) -> bool:
    """Probe device-backend init in a bounded subprocess.

    ``jax.devices()`` hangs forever (not errors) when the tunnel is
    wedged, so the probe must be a killable child, never an in-process
    call — a hung C-level backend init cannot be interrupted by any
    in-process watchdog. Healthy runs pay one duplicate backend init
    (tens of seconds) for this; accepted, since the alternative is an
    unbounded hang of the whole benchmark when the tunnel is down.
    """
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True,
            timeout=timeout_s,
        )
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception as err:  # noqa: BLE001
        _log(f"backend probe failed oddly: {err}")
        return False


def main():
    if "--cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        rate = measure_rate(n_particles=8192, n_steps=20, reps=3)
        print(json.dumps({"cpu_rate": rate}))
        return

    if "--degraded-cpu" not in sys.argv:
        # Fail fast instead of hanging the whole round when the device
        # backend cannot initialize: retry for a bounded window, then
        # hand off to a CPU child that reports an explicitly flagged
        # degraded number (missing data beats silence, a flag beats
        # a silently wrong number).
        wait_s = float(os.environ.get("ASPIRE_BENCH_TUNNEL_WAIT_S", 900))
        deadline = time.monotonic() + wait_s
        alive = _backend_alive()
        while not alive and time.monotonic() < deadline:
            _log(
                "device backend unreachable; retrying probe "
                f"(up to {max(deadline - time.monotonic(), 0):.0f}s left)"
            )
            time.sleep(60)
            alive = _backend_alive()
        if not alive:
            _log(
                "device backend still unreachable after "
                f"{wait_s:.0f}s — falling back to a degraded CPU run."
            )
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--degraded-cpu",
                ],
                env=_cpu_env(),
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            sys.exit(out.returncode)

    import jax

    if "--degraded-cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    _log(f"bench device: {jax.devices()[0]} (platform={platform})")

    # 500 in-jit steps per timed call: the tunneled backend's
    # per-dispatch RTT still shows at 200 steps (measured ~13% low).
    # Headline = the SHIPPED device hot path: the fused whole-chain
    # Pallas kernel the SMC dispatches to on TPU (round 5).
    n_particles = 131072 if platform != "cpu" else 16384
    n_steps = 500 if platform != "cpu" else 20
    rate = measure_rate(
        n_particles=n_particles,
        n_steps=n_steps,
        reps=5,
        fused_chain=platform != "cpu",
    )
    _log(f"mutation rate: {rate:.3e} particle-steps/s @ n={n_particles}")

    # Auxiliaries: the XLA per-step chain (threefry) — the pre-round-5
    # path and the multi-chip/fallback path — and the same with rbg
    # keys (documented opt-in PRNG, performance.md knob 3).
    rate_xla = None
    rate_rbg = None
    if platform != "cpu":
        try:
            rate_xla = measure_rate(
                n_particles=n_particles, n_steps=n_steps, reps=3
            )
            _log(f"xla-chain rate: {rate_xla:.3e} particle-steps/s")
        except Exception as err:  # noqa: BLE001
            _log(f"xla-chain measurement failed: {err}")
        try:
            rate_rbg = measure_rate(
                n_particles=n_particles,
                n_steps=n_steps,
                reps=3,
                prng_impl="rbg",
            )
            _log(f"rbg opt-in rate: {rate_rbg:.3e} particle-steps/s")
        except Exception as err:  # noqa: BLE001
            _log(f"rbg measurement failed: {err}")

    model = roofline_model(n_particles)
    roofline = roofline_report(rate, model)
    _log(
        "roofline: {flops:.0f} FLOPs + {bts:.1f} B per particle-step -> "
        "{tf:.2f} TFLOP/s ({pc:.1%} of bf16 peak), {gb:.1f} GB/s "
        "({ph:.2%} of HBM peak); binding ceiling: {bind}".format(
            flops=model["flops_per_particle_step"],
            bts=model["bytes_per_particle_step"],
            tf=roofline["achieved_tflops_f32"],
            pc=roofline["pct_of_bf16_compute_peak"],
            gb=roofline["achieved_hbm_gbs"],
            ph=roofline["pct_of_hbm_peak"],
            bind=roofline["binding_ceiling"],
        )
    )

    # CPU baseline via subprocess (honest stand-in for the reference's
    # CPU orchestration; the reference publishes no numbers).
    cpu_rate = None
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True,
            text=True,
            timeout=900,
            env=_cpu_env(),
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            try:
                cpu_rate = json.loads(line)["cpu_rate"]
                break
            except (json.JSONDecodeError, KeyError):
                continue
    except Exception as err:  # noqa: BLE001
        _log(f"cpu baseline failed: {err}")
    vs_baseline = rate / cpu_rate if cpu_rate else 1.0
    _log(f"cpu baseline rate: {cpu_rate}")

    # Anchor verdict: None only when the anchor legitimately did not run
    # (degraded CPU mode); False on a raise or a >5-sigma logZ miss. The
    # perf headline is only a win when the in-run statistics are right,
    # so the driver can (and should) check this field.
    anchor_ok = None
    if "--degraded-cpu" in sys.argv:
        # The 131072-particle pipeline timing inside the anchor takes
        # many minutes on one CPU core and measures nothing about the
        # device path — the CPU suite already anchors correctness.
        _log("degraded mode: skipping the correctness anchor/pipeline")
    else:
        try:
            anchor = correctness_anchor()
            _log(f"correctness anchor: {anchor}")
            tol = max(5.0 * anchor["log_z_err"], 0.02)
            anchor_ok = bool(
                abs(anchor["log_z"] - anchor["true_log_z"]) < tol
            )
            if not anchor_ok:
                _log(
                    "ANCHOR FAILED: |logZ - truth| = "
                    f"{abs(anchor['log_z'] - anchor['true_log_z']):.4f} "
                    f"> tol {tol:.4f}"
                )
        except Exception as err:  # noqa: BLE001
            _log(f"correctness anchor failed: {err}")
            anchor_ok = False

    record = {
        "metric": "smc_particle_steps_per_s",
        "value": rate,
        "unit": "particle-steps/s",
        "vs_baseline": vs_baseline,
        "model_pct_of_roofline": roofline["model_pct_of_roofline"],
        "roofline_binding_ceiling": roofline["binding_ceiling"],
        "flops_per_particle_step": model["flops_per_particle_step"],
        "bytes_per_particle_step": model["bytes_per_particle_step"],
        "pipeline_131072_s": _PIPELINE_S,
        "xla_chain_rate": rate_xla,
        "rbg_opt_in_rate": rate_rbg,
        "anchor_ok": anchor_ok,
    }
    if "--degraded-cpu" in sys.argv:
        # The device backend was unreachable for the whole wait window:
        # this number is the identical workload on host CPU and says
        # nothing about TPU throughput. Keep the flag machine-readable
        # so downstream tooling never mistakes it for a regression.
        record["degraded"] = "device-backend-unreachable; CPU fallback"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
