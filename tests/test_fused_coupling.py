"""Fused Pallas coupling kernel vs. the XLA reference path.

Runs the kernel in interpreter mode on CPU (the dispatch predicate only
selects the compiled kernel on a real TPU backend) and checks exact
semantic parity with ``Coupling._forward_xla`` / ``_inverse_xla``,
including gradients through the custom_vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.flows.architectures import Coupling
from aspire_tpu.ops.fused_coupling import (
    _pallas_apply,
    fused_coupling_apply,
    should_fuse,
    prepare_params,
)


@pytest.fixture(params=["affine", "rqs"])
def arch(request):
    return Coupling(
        dims=4, n_layers=3, n_hidden=(32, 32), transformer=request.param
    )


@pytest.fixture
def params(arch, key):
    params = arch.init(key)
    # Perturb away from the identity so the transform is non-trivial.
    return jax.tree.map(
        lambda p: p
        + 0.1 * jax.random.normal(jax.random.key(1), p.shape, p.dtype),
        params,
    )


@pytest.mark.parametrize("mode", ["forward", "inverse"])
@pytest.mark.parametrize("n", [64, 1000, 2500])
def test_fused_matches_xla(arch, params, mode, n):
    x = jax.random.normal(
        jax.random.key(2), (n, arch.dims), dtype=jnp.float32
    )
    ref_fn = arch._forward_xla if mode == "forward" else arch._inverse_xla
    y_ref, ld_ref = ref_fn(params, x)
    stacked = prepare_params(arch, params)
    y, ld = _pallas_apply(arch, mode, stacked, x, interpret=True)
    # f32 accumulation-order noise: the kernel computes prefix sums as
    # triangular matmuls where the XLA path uses cumsum.
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ld, ld_ref, rtol=1e-3, atol=1e-4)


def test_fused_round_trip(arch, params):
    x = jax.random.normal(jax.random.key(3), (256, arch.dims), jnp.float32)
    stacked = prepare_params(arch, params)
    z, ld_f = _pallas_apply(arch, "forward", stacked, x, interpret=True)
    x_back, ld_i = _pallas_apply(arch, "inverse", stacked, z, interpret=True)
    np.testing.assert_allclose(x_back, x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ld_f, -ld_i, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["forward", "inverse"])
def test_fused_gradients_match_xla(arch, params, mode):
    x = jax.random.normal(jax.random.key(4), (128, arch.dims), jnp.float32)
    ref_fn = arch._forward_xla if mode == "forward" else arch._inverse_xla

    def loss_fused(p, x):
        y, ld = fused_coupling_apply(arch, mode, p, x)
        return jnp.sum(y**2) + jnp.sum(ld)

    def loss_ref(p, x):
        y, ld = ref_fn(p, x)
        return jnp.sum(y**2) + jnp.sum(ld)

    # Primal parity (fused kernel in interpret mode on CPU).
    np.testing.assert_allclose(
        loss_fused(params, x), loss_ref(params, x), rtol=1e-4
    )
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        g_fused,
        g_ref,
    )


def test_should_fuse_respects_backend_and_shape(arch):
    x32 = jnp.zeros((10, arch.dims), jnp.float32)
    # CPU backend in tests: never fuse (the compiled kernel is TPU-only).
    assert not should_fuse(arch, x32)
    assert not should_fuse(arch, jnp.zeros((10, arch.dims), jnp.float64))
    big = Coupling(dims=32, n_layers=2)
    assert not should_fuse(big, jnp.zeros((10, 32), jnp.float32))


def test_fused_kernel_in_jit_and_scan(arch, params):
    """The fused apply composes with jit/scan like the hot SMC loop."""
    x = jax.random.normal(jax.random.key(5), (64, arch.dims), jnp.float32)

    @jax.jit
    def step(x):
        y, ld = fused_coupling_apply(arch, "forward", params, x)
        return y * 0.5, ld

    def body(carry, _):
        y, ld = step(carry)
        return y, jnp.sum(ld)

    out, lds = jax.lax.scan(body, x, None, length=3)
    assert out.shape == x.shape
    assert lds.shape == (3,)
    assert np.isfinite(np.asarray(lds)).all()


@pytest.mark.parametrize("mode", ["forward", "inverse"])
def test_fused_extreme_params_and_boundary_inputs(mode):
    """Adversarial check: saturated raw params + inputs at/over the
    spline tails must match the XLA path and stay finite."""
    arch = Coupling(dims=4, n_layers=2, n_hidden=(16, 16), transformer="rqs")
    params = arch.init(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p
        + 3.0 * jax.random.normal(jax.random.key(9), p.shape, p.dtype),
        params,
    )
    tb = arch.tail_bound
    x = jnp.concatenate(
        [
            jax.random.normal(jax.random.key(10), (64, 4), jnp.float32),
            jnp.full((8, 4), tb, jnp.float32),     # exactly at the tail
            jnp.full((8, 4), -tb, jnp.float32),
            jnp.full((8, 4), 3 * tb, jnp.float32),  # far outside (identity)
            jnp.full((8, 4), -3 * tb, jnp.float32),
            jnp.zeros((8, 4), jnp.float32),
        ]
    )
    ref_fn = arch._forward_xla if mode == "forward" else arch._inverse_xla
    y_ref, ld_ref = ref_fn(params, x)
    y, ld = _pallas_apply(
        arch, mode, prepare_params(arch, params), x, interpret=True
    )
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(ld)).all()
    np.testing.assert_allclose(y, y_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(ld, ld_ref, rtol=5e-3, atol=5e-3)


def test_fused_large_dims_tile_scaling():
    """d=32 (the VMEM-OOM regression case) stays correct with the
    dims-scaled tile."""
    arch = Coupling(dims=32, n_layers=2, n_hidden=(32, 32))
    params = arch.init(jax.random.key(1))
    params = jax.tree.map(
        lambda p: p
        + 0.1 * jax.random.normal(jax.random.key(2), p.shape, p.dtype),
        params,
    )
    x = jax.random.normal(jax.random.key(3), (512, 32), jnp.float32)
    y_ref, ld_ref = arch._forward_xla(params, x)
    y, ld = _pallas_apply(
        arch, "forward", prepare_params(arch, params), x, interpret=True
    )
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ld, ld_ref, rtol=1e-3, atol=1e-4)


class TestFusedMAF:
    @pytest.fixture
    def maf_arch(self):
        from aspire_tpu.flows.architectures import MAF

        return MAF(
            dims=4, n_layers=3, n_hidden=(32, 32), transformer="rqs"
        )

    @pytest.fixture
    def maf_params(self, maf_arch, key):
        params = maf_arch.init(key)
        return jax.tree.map(
            lambda p: p
            + 0.1 * jax.random.normal(jax.random.key(5), p.shape, p.dtype),
            params,
        )

    @pytest.mark.parametrize("n", [64, 1000])
    def test_matches_xla(self, maf_arch, maf_params, n):
        from aspire_tpu.ops.fused_coupling import (
            _pallas_maf_forward,
            prepare_maf_params,
        )

        x = jax.random.normal(jax.random.key(6), (n, 4), jnp.float32)
        z_ref, ld_ref = maf_arch._forward_xla(maf_params, x)
        prepared = prepare_maf_params(maf_arch, maf_params)
        z, ld = _pallas_maf_forward(maf_arch, prepared, x, interpret=True)
        np.testing.assert_allclose(z, z_ref, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(ld, ld_ref, rtol=1e-3, atol=1e-4)

    def test_gradients_match_xla(self, maf_arch, maf_params):
        from aspire_tpu.ops.fused_coupling import fused_maf_forward

        x = jax.random.normal(jax.random.key(7), (128, 4), jnp.float32)

        def loss_fused(p, x):
            z, ld = fused_maf_forward(maf_arch, p, x)
            return jnp.sum(z**2) + jnp.sum(ld)

        def loss_ref(p, x):
            z, ld = maf_arch._forward_xla(p, x)
            return jnp.sum(z**2) + jnp.sum(ld)

        np.testing.assert_allclose(
            loss_fused(maf_params, x), loss_ref(maf_params, x), rtol=1e-4
        )
        g1 = jax.grad(loss_fused, argnums=(0, 1))(maf_params, x)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(maf_params, x)
        # The cotangent is built on the fused primal, which differs from
        # the XLA primal by f32 accumulation-order noise.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=1e-3
            ),
            g1,
            g2,
        )

    def test_affine_maf_never_fuses(self):
        from aspire_tpu.flows.architectures import MAF
        from aspire_tpu.ops.fused_coupling import should_fuse_maf

        arch = MAF(dims=4, n_layers=2, transformer="affine")
        assert not should_fuse_maf(
            arch, jnp.zeros((10_000, 4), jnp.float32)
        )
