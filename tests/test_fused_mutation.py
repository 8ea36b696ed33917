"""Fused mutation-chain kernel: math parity with the XLA path.

The kernel runs in interpret mode on CPU with *injected* noise, so the
whole k-step chain is bit-comparable against a pure-JAX reference that
replays the same noise through the same update equations (the reference
below mirrors kernels.tpcn_step/_mh_update arithmetic with per-tile
step adaptation, using the flow's ``_forward_xla`` density).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.flows.architectures import nsf
from aspire_tpu.models import (
    FunnelProblem,
    GaussianMixtureProblem,
    GaussianProblem,
    HierarchicalProblem,
    RosenbrockProblem,
)
from aspire_tpu.ops import fused_mutation as FM
from aspire_tpu import transforms as T


def _flow(dims=4, key=0):
    arch = nsf(dims=dims, n_layers=2, n_hidden=(16, 16), num_bins=4)
    params = arch.init(jax.random.key(key))
    params = jax.tree.map(
        lambda p: p
        + 0.05 * jax.random.normal(jax.random.key(7), p.shape, p.dtype),
        params,
    )
    return arch, params


def _erfinv_normal_ref(u):
    return math.sqrt(2.0) * jax.scipy.special.erfinv(
        2.0 * (u + 2.0 ** -24) - 1.0
    )


def reference_chain(
    cfg,
    arch,
    params,
    problem,
    x0,
    beta,
    noise,
    step0,
    ref_mean,
    ref_chol,
    ref_ichol,
    dt=None,
    pc=None,
):
    """Replay the kernel's math in standard layout (single tile)."""
    d = arch.dims
    hd = (d + 1) // 2

    class _V:
        __slots__ = ("x",)

    def tempered(z):
        if pc is not None:
            x, pc_lj = pc.inverse(z)
        else:
            x, pc_lj = z, jnp.zeros(z.shape[0], z.dtype)
        if dt is not None:
            x_t, dt_lj = dt.forward(x)
        else:
            x_t, dt_lj = x, jnp.zeros(z.shape[0], z.dtype)
        zz, log_det = arch._forward_xla(params, x_t)
        lq = (
            -0.5 * jnp.sum(zz**2, axis=-1)
            - 0.5 * d * jnp.log(2 * jnp.pi)
            + log_det
            + dt_lj
        )
        v = _V()
        v.x = x
        lpi = jnp.where(
            jnp.isnan(problem.log_prior(v)), -jnp.inf, problem.log_prior(v)
        )
        ll = jnp.where(
            jnp.isnan(problem.log_likelihood(v)),
            -jnp.inf,
            problem.log_likelihood(v),
        )
        lp = (1 - beta) * lq + beta * (ll + lpi) + pc_lj
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp), lq, lpi, ll

    def mahal2(z):
        y = (z - ref_mean) @ ref_ichol.T
        return jnp.sum(y**2, axis=-1)

    lp, lq, lpi, ll = tempered(x0)
    x = x0
    s = jnp.asarray(step0, jnp.float32)
    nacc = jnp.zeros(x.shape[0], jnp.float32)
    alpha_g = 0.5 * (cfg.nu + d)
    zeros = jnp.zeros_like(x0)
    prev_d, s1, s2, c1 = zeros, zeros, zeros, zeros
    for t in range(cfg.n_steps):
        rng = noise[t]  # (rows, n)
        xi = _erfinv_normal_ref(rng[:d]).T  # (n, d)
        row = d
        s_c = jnp.minimum(s, 1.0)
        rot = jnp.sqrt(jnp.maximum(1 - s_c**2, 0.0))
        if cfg.kernel == "rwmh":
            x_prop = x + s * xi @ ref_chol.T
        elif cfg.kernel == "pcn":
            x_prop = ref_mean + rot * (x - ref_mean) + s_c * xi @ ref_chol.T
        else:
            r2_old = mahal2(x)
            w_raw = jnp.zeros(x.shape[0], jnp.float32)
            if cfg.gamma_m:
                u = rng[row : row + cfg.gamma_m]
                row += cfg.gamma_m
                for j in range(0, cfg.gamma_m - 1, 2):
                    w_raw = w_raw - jnp.log((1 - u[j]) * (1 - u[j + 1]))
                if cfg.gamma_m % 2:
                    w_raw = w_raw - jnp.log(1 - u[cfg.gamma_m - 1])
            if cfg.gamma_odd:
                gza = _erfinv_normal_ref(rng[row : row + 1])
                row += 1
                w_raw = w_raw + 0.5 * gza[0] ** 2
            w = w_raw / (0.5 * (cfg.nu + r2_old))
            x_prop = (
                ref_mean
                + rot * (x - ref_mean)
                + (s_c / jnp.sqrt(w))[:, None] * (xi @ ref_chol.T)
            )
        lp_p, lq_p, lpi_p, ll_p = tempered(x_prop)
        if cfg.kernel == "rwmh":
            log_alpha = lp_p - lp
        elif cfg.kernel == "pcn":
            log_alpha = lp_p - lp + 0.5 * (mahal2(x_prop) - mahal2(x))
        else:
            log_alpha = lp_p - lp + alpha_g * jnp.log(
                (cfg.nu + mahal2(x_prop)) / (cfg.nu + mahal2(x))
            )
        log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
        acc_p = jnp.exp(jnp.minimum(log_alpha, 0.0))
        accept = rng[-1] < acc_p
        x = jnp.where(accept[:, None], x_prop, x)
        lp = jnp.where(accept, lp_p, lp)
        lq = jnp.where(accept, lq_p, lq)
        lpi = jnp.where(accept, lpi_p, lpi)
        ll = jnp.where(accept, ll_p, ll)
        # The kernel accumulates acceptance per lane-half; mirror its
        # summation grouping for bit-level step-size parity.
        nh = acc_p.shape[0] // 2
        acc_prob = (
            jnp.sum(acc_p[:nh]) + jnp.sum(acc_p[nh:])
        ) / acc_p.shape[0]
        s = jnp.exp(
            jnp.clip(
                jnp.log(s)
                + cfg.adaptation_rate * (acc_prob - cfg.target_acceptance),
                -10.0,
                cfg.max_log_step,
            )
        )
        nacc = nacc + accept
        delta = x - x0
        s1 = s1 + delta
        s2 = s2 + delta**2
        c1 = c1 + delta * prev_d
        prev_d = delta
    return x, lq, lpi, ll, nacc, s, (s1, s2, c1)


def _setup(kernel="tpcn", n=256, dims=4, n_steps=3, seed=3):
    arch, params = _flow(dims=dims)
    problem = GaussianMixtureProblem(dims=dims)
    nu = 5.0
    k2 = int(round(nu + dims))
    cfg = FM.ChainConfig(
        arch,
        kernel,
        n_steps,
        nu=nu,
        target_acceptance=0.234,
        adaptation_rate=0.1,
        gamma_m=k2 // 2,
        gamma_odd=k2 % 2,
    )
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(n, dims)), jnp.float32)
    noise = jnp.asarray(
        rng.uniform(size=(n_steps, cfg.noise_rows, n)).astype(np.float32)
    )
    # Keep noise away from 0/1 edges so accept decisions can't flip
    # between the two float orderings.
    noise = jnp.clip(noise, 1e-4, 1.0 - 1e-4)
    from aspire_tpu.samplers import kernels as K

    gref = K.fit_gaussian_reference(x0)
    return cfg, arch, params, problem, x0, noise, gref


@pytest.mark.parametrize("kernel", ["tpcn", "pcn", "rwmh"])
def test_fused_chain_matches_reference(kernel):
    cfg, arch, params, problem, x0, noise, gref = _setup(kernel=kernel)
    beta = 0.7

    def target_td(xt):
        return problem.log_prior_td(xt), problem.log_likelihood_td(xt)

    z, lq, lpi, ll, nacc, steps, stats = FM.fused_mh_chain(
        cfg,
        params,
        x0,
        beta,
        seed=jnp.zeros(2, jnp.int32),
        step0=0.5,
        ref_mean=gref.mean,
        ref_chol=gref.chol,
        ref_ichol=gref.inv_chol,
        noise=noise,
        tile=x0.shape[0],
        interpret=True,
        target_td=target_td,
    )
    xr, lqr, lpir, llr, naccr, sr, _ = reference_chain(
        cfg, arch, params, problem, x0, beta, noise, 0.5,
        gref.mean, gref.chol, gref.inv_chol,
    )
    np.testing.assert_array_equal(
        np.asarray(nacc), np.asarray(naccr)
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(xr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lqr), atol=2e-3)
    np.testing.assert_allclose(np.asarray(lpi), np.asarray(lpir), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(llr), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(steps[0]), np.asarray(sr), rtol=1e-5
    )


def test_fused_chain_multi_tile_stats():
    """Two tiles: per-tile adaptation + stats combine to run_chain parity."""
    cfg, arch, params, problem, x0, noise, gref = _setup(
        kernel="tpcn", n=512, n_steps=4
    )
    beta = 0.5

    def target_td(xt):
        return problem.log_prior_td(xt), problem.log_likelihood_td(xt)

    tile = 256
    z, lq, lpi, ll, nacc, steps, stats = FM.fused_mh_chain(
        cfg, params, x0, beta,
        seed=jnp.zeros(2, jnp.int32), step0=0.5,
        ref_mean=gref.mean, ref_chol=gref.chol, ref_ichol=gref.inv_chol,
        noise=noise, tile=tile, interpret=True, target_td=target_td,
    )
    # Per-tile reference (independent adaptation per tile).
    from aspire_tpu.samplers import kernels as K

    parts = []
    for i in range(2):
        sl = slice(i * tile, (i + 1) * tile)
        parts.append(
            reference_chain(
                cfg, arch, params, problem, x0[sl], beta,
                noise[:, :, sl], 0.5,
                gref.mean, gref.chol, gref.inv_chol,
            )
        )
    xr = jnp.concatenate([p[0] for p in parts])
    np.testing.assert_allclose(np.asarray(z), np.asarray(xr), atol=2e-4)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(steps[i]), np.asarray(parts[i][5]), rtol=1e-5
        )
    # Stats parity: the reference chains accumulate the same deviation
    # sums; concatenating tiles reproduces the full-population
    # tau/mixing the XLA path would report for these chains.
    tau, mixing = FM.combine_tile_stats(stats, arch.dims, tile)
    s1 = jnp.concatenate([p[6][0] for p in parts])
    s2 = jnp.concatenate([p[6][1] for p in parts])
    c1 = jnp.concatenate([p[6][2] for p in parts])
    tau_ref = K.lag1_autocorr_time(s1, s2, c1, cfg.n_steps)
    mix_ref = K.chain_mixing_ratio(x0, s1, s2, cfg.n_steps)
    np.testing.assert_allclose(float(tau), float(tau_ref), rtol=1e-3)
    np.testing.assert_allclose(float(mixing), float(mix_ref), rtol=1e-3)


@pytest.mark.parametrize(
    "problem",
    [
        GaussianProblem(dims=4),
        GaussianMixtureProblem(dims=4),
        RosenbrockProblem(dims=4),
        FunnelProblem(dims=5),
        HierarchicalProblem(dims=8),
    ],
    ids=lambda p: type(p).__name__,
)
def test_td_targets_match_standard(problem):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(64, problem.dims)).astype(np.float32)
    )

    class _V:
        __slots__ = ("x",)

    v = _V()
    v.x = x
    np.testing.assert_allclose(
        np.asarray(problem.log_likelihood_td(x.T)[0]),
        np.asarray(problem.log_likelihood(v)),
        rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(problem.log_prior_td(x.T)[0]),
        np.asarray(problem.log_prior(v)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_td_apply_matches_transforms():
    rng = np.random.default_rng(1)
    d = 4
    x = jnp.asarray(rng.uniform(-4, 4, size=(32, d)).astype(np.float32))

    affine = T.AffineTransform()
    affine.fit(x)
    comp = T.CompositeTransform(
        parameters=[f"x_{i}" for i in range(d)],
        prior_bounds={f"x_{i}": [-5.0, 5.0] for i in range(d)},
        bounded_to_unbounded=True,
        bounded_transform="logit",
        affine_transform=True,
    )
    comp.fit(x)
    probit = T.ProbitTransform(
        lower=-5.0 * np.ones(d), upper=5.0 * np.ones(d)
    )

    for t in (affine, comp, probit, T.IdentityTransform()):
        prog = FM.canonicalize_transform(t, d)
        assert prog is not None
        y_ref, lj_ref = t.forward(x)
        yt, lj = FM.td_apply(prog, prog.params, x.T, inverse=False)
        np.testing.assert_allclose(
            np.asarray(yt.T), np.asarray(y_ref), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(lj[0]),
            np.asarray(lj_ref) * np.ones(x.shape[0]),
            rtol=2e-4,
            atol=2e-4,
        )
        # Inverse round-trip through the TD program.
        xt_back, lj_inv = FM.td_apply(prog, prog.params, yt, inverse=True)
        x_ref_back, lj_inv_ref = t.inverse(y_ref)
        np.testing.assert_allclose(
            np.asarray(xt_back.T),
            np.asarray(x_ref_back),
            rtol=2e-4,
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(lj_inv[0]),
            np.asarray(lj_inv_ref) * np.ones(x.shape[0]),
            rtol=2e-4,
            atol=2e-4,
        )


def test_fused_chain_smc_end_to_end():
    """SMC with the fused chain forced (interpret mode on CPU).

    Asserts the dispatch path actually engages (``_fused_chain_state``)
    and the posterior/evidence remain sane on the 2-d mixture.
    """
    from aspire_tpu import Aspire, Samples

    p = GaussianMixtureProblem(dims=2)
    rng = np.random.default_rng(0)
    init = Samples(p.draw_initial_samples(rng, 512))
    asp = Aspire(
        log_likelihood=p.log_likelihood,
        log_prior=p.log_prior,
        dims=2,
        parameters=p.parameters,
        flow_backend="nsf",
        n_layers=2,
        n_hidden=(16, 16),
        num_bins=4,
        seed=2,
    )
    asp.fit(init, n_epochs=5, batch_size=128)
    samples = asp.sample_posterior(
        sampler="smc",
        n_samples=256,
        device_ladder=False,
        sampler_kwargs=dict(
            n_steps=2, fused_chain=True, max_n_steps=6
        ),
    )
    sampler = asp._sampler
    assert sampler._fused_chain_state is True
    assert np.isfinite(float(samples.log_evidence))
    assert np.isfinite(np.asarray(samples.x)).all()
    # Acceptance/tau diagnostics recorded through the fused path.
    assert len(sampler.history.mcmc_acceptance) >= 1
    assert all(
        0.0 <= a <= 1.0 for a in sampler.history.mcmc_acceptance
    )

    # Same run through the compiled device ladder (fused leg inside
    # the while_loop).
    samples2 = asp.sample_posterior(
        sampler="smc",
        n_samples=256,
        device_ladder=True,
        preconditioning="none",
        sampler_kwargs=dict(
            n_steps=2, fused_chain=True, max_n_steps=6
        ),
    )
    sampler2 = asp._sampler
    assert getattr(sampler2, "_ladder_has_fused", False)
    assert np.isfinite(float(samples2.log_evidence))
    assert np.isfinite(np.asarray(samples2.x)).all()


def test_fused_chain_with_transforms():
    """Affine data transform + composite preconditioning round-trip."""
    dims = 4
    arch, params = _flow(dims=dims)
    problem = GaussianProblem(dims=dims)
    rng = np.random.default_rng(5)
    x_fit = jnp.asarray(
        rng.uniform(-4, 4, size=(128, dims)).astype(np.float32)
    )
    dt = T.AffineTransform()
    dt.fit(x_fit)
    pc = T.CompositeTransform(
        parameters=problem.parameters,
        prior_bounds=problem.prior_bounds,
        bounded_to_unbounded=False,
        affine_transform=True,
    )
    z_fit = pc.fit(x_fit)

    nu, n, n_steps = 5.0, 256, 3
    k2 = int(round(nu + dims))
    cfg = FM.ChainConfig(
        arch, "tpcn", n_steps, nu=nu,
        target_acceptance=0.234, adaptation_rate=0.1,
        dt_prog=FM.canonicalize_transform(dt, dims),
        pc_prog=FM.canonicalize_transform(pc, dims),
        gamma_m=k2 // 2, gamma_odd=k2 % 2,
    )
    z0 = jnp.asarray(rng.normal(size=(n, dims)).astype(np.float32))
    noise = jnp.clip(
        jnp.asarray(
            rng.uniform(size=(n_steps, cfg.noise_rows, n)).astype(
                np.float32
            )
        ),
        1e-4,
        1 - 1e-4,
    )
    from aspire_tpu.samplers import kernels as K

    gref = K.fit_gaussian_reference(z0)

    def target_td(xt):
        return problem.log_prior_td(xt), problem.log_likelihood_td(xt)

    z, lq, lpi, ll, nacc, steps, stats = FM.fused_mh_chain(
        cfg, params, z0, 0.6,
        seed=jnp.zeros(2, jnp.int32), step0=0.5,
        ref_mean=gref.mean, ref_chol=gref.chol, ref_ichol=gref.inv_chol,
        noise=noise, tile=n, interpret=True, target_td=target_td,
    )
    xr, lqr, lpir, llr, naccr, sr, _ = reference_chain(
        cfg, arch, params, problem, z0, 0.6, noise, 0.5,
        gref.mean, gref.chol, gref.inv_chol, dt=dt, pc=pc,
    )
    np.testing.assert_array_equal(np.asarray(nacc), np.asarray(naccr))
    np.testing.assert_allclose(np.asarray(z), np.asarray(xr), atol=3e-4)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lqr), atol=3e-3)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(llr), atol=3e-3)
