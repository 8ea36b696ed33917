"""Transform tests (model: reference tests/test_transforms.py)."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.transforms import (
    AffineTransform,
    BaseTransform,
    CompositeTransform,
    FlowTransform,
    IdentityTransform,
    LogitTransform,
    PeriodicTransform,
    ProbitTransform,
)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.uniform(-0.9, 0.9, size=(64, 3)))


def check_roundtrip(transform, x, atol=1e-8):
    y, log_j = transform.forward(x)
    x2, log_j_inv = transform.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(
        np.asarray(log_j + log_j_inv), 0.0, atol=atol
    )
    return y, log_j


def check_jacobian_vs_autodiff(transform, x, atol=1e-6):
    """log|det J| must match autodiff exactly."""

    def f(xi):
        y, _ = transform.forward(xi[None])
        return y[0]

    _, log_j = transform.forward(x)
    for i in range(min(4, x.shape[0])):
        jac = jax.jacfwd(f)(x[i])
        _, expected = np.linalg.slogdet(np.asarray(jac))
        assert float(log_j[i]) == pytest.approx(float(expected), abs=atol)


class TestIdentity:
    def test_roundtrip(self, x):
        check_roundtrip(IdentityTransform(), x)


class TestPeriodic:
    def test_wraps(self):
        t = PeriodicTransform(lower=[0.0], upper=[1.0])
        y, log_j = t.forward(jnp.asarray([[1.5], [-0.25], [0.5]]))
        np.testing.assert_allclose(
            np.asarray(y[:, 0]), [0.5, 0.75, 0.5], atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(log_j), 0.0)

    def test_save_load(self, tmp_path):
        t = PeriodicTransform(lower=[0.0, -1.0], upper=[1.0, 1.0])
        with h5py.File(tmp_path / "t.h5", "w") as f:
            t.save(f)
        with h5py.File(tmp_path / "t.h5", "r") as f:
            t2 = BaseTransform.load(f)
        assert isinstance(t2, PeriodicTransform)
        np.testing.assert_allclose(np.asarray(t2.lower), [0.0, -1.0])


@pytest.mark.parametrize("cls", [LogitTransform, ProbitTransform])
class TestBounded:
    def test_roundtrip(self, cls, x):
        t = cls(lower=[-1.0] * 3, upper=[1.0] * 3)
        check_roundtrip(t, x, atol=1e-7)

    def test_jacobian(self, cls, x):
        t = cls(lower=[-1.0] * 3, upper=[1.0] * 3)
        check_jacobian_vs_autodiff(t, x)

    def test_unbounds(self, cls, rng):
        t = cls(lower=[0.0], upper=[1.0])
        x = jnp.asarray(rng.uniform(0.01, 0.99, size=(100, 1)))
        y, _ = t.forward(x)
        assert np.asarray(y).std() > np.asarray(x).std()

    def test_interval_too_small_raises(self, cls):
        with pytest.raises(ValueError, match="precision"):
            cls(lower=[0.0], upper=[0.0])

    def test_save_load(self, cls, tmp_path, x):
        t = cls(lower=[-1.0] * 3, upper=[1.0] * 3, eps=1e-5)
        with h5py.File(tmp_path / "t.h5", "w") as f:
            t.save(f)
        with h5py.File(tmp_path / "t.h5", "r") as f:
            t2 = BaseTransform.load(f)
        assert type(t2) is cls
        assert t2.eps == 1e-5
        y1, j1 = t.forward(x)
        y2, j2 = t2.forward(x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


class TestAffine:
    def test_fit_whitens(self, rng):
        t = AffineTransform()
        x = jnp.asarray(rng.normal(3.0, 2.5, size=(5000, 2)))
        y = t.fit(x)
        np.testing.assert_allclose(np.asarray(y).mean(0), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y).std(0), 1.0, atol=1e-6)

    def test_roundtrip_and_jacobian(self, rng, x):
        t = AffineTransform()
        t.fit(jnp.asarray(rng.normal(1.0, 2.0, size=(100, 3))))
        check_roundtrip(t, x)
        check_jacobian_vs_autodiff(t, x)

    def test_save_load_state(self, tmp_path, rng, x):
        t = AffineTransform()
        t.fit(jnp.asarray(rng.normal(1.0, 2.0, size=(100, 3))))
        with h5py.File(tmp_path / "t.h5", "w") as f:
            t.save(f)
        with h5py.File(tmp_path / "t.h5", "r") as f:
            t2 = BaseTransform.load(f)
        y1, _ = t.forward(x)
        y2, _ = t2.forward(x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


class TestComposite:
    @pytest.fixture
    def transform(self):
        return CompositeTransform(
            parameters=["a", "b", "c"],
            periodic_parameters=["a"],
            prior_bounds={
                "a": [0.0, 1.0],
                "b": [-1.0, 1.0],
                "c": [-np.inf, np.inf],
            },
            bounded_transform="logit",
        )

    def test_masks(self, transform):
        assert transform.periodic_parameters == ["a"]
        assert transform.bounded_parameters == ["b"]
        np.testing.assert_array_equal(
            np.asarray(transform.periodic_mask), [True, False, False]
        )
        np.testing.assert_array_equal(
            np.asarray(transform.bounded_mask), [False, True, False]
        )

    def test_fit_roundtrip(self, transform, rng):
        x = jnp.asarray(
            np.stack(
                [
                    rng.uniform(0, 1, 200),
                    rng.uniform(-0.9, 0.9, 200),
                    rng.normal(0, 2, 200),
                ],
                axis=1,
            )
        )
        transform.fit(x)
        check_roundtrip(transform, x, atol=1e-6)

    def test_jacobian(self, transform, rng):
        x = jnp.asarray(
            np.stack(
                [
                    rng.uniform(0.1, 0.9, 50),
                    rng.uniform(-0.8, 0.8, 50),
                    rng.normal(0, 2, 50),
                ],
                axis=1,
            )
        )
        transform.fit(x)
        check_jacobian_vs_autodiff(transform, x)

    def test_periodic_requires_bounds(self):
        with pytest.raises(ValueError, match="prior bounds"):
            CompositeTransform(
                parameters=["a"], periodic_parameters=["a"]
            )

    def test_unknown_bounded_transform(self):
        with pytest.raises(ValueError, match="Unknown bounded"):
            CompositeTransform(
                parameters=["a"],
                prior_bounds={"a": [0, 1]},
                bounded_transform="nope",
            )

    def test_save_load(self, transform, rng, tmp_path):
        x = jnp.asarray(
            np.stack(
                [
                    rng.uniform(0, 1, 100),
                    rng.uniform(-0.9, 0.9, 100),
                    rng.normal(0, 2, 100),
                ],
                axis=1,
            )
        )
        transform.fit(x)
        with h5py.File(tmp_path / "t.h5", "w") as f:
            transform.save(f)
        with h5py.File(tmp_path / "t.h5", "r") as f:
            t2 = BaseTransform.load(f)
        y1, j1 = transform.forward(x)
        y2, j2 = t2.forward(x)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y2), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(j1), np.asarray(j2), atol=1e-10
        )

    def test_pytree_roundtrip(self, transform, rng):
        """Transforms cross jit boundaries as pytree arguments."""
        x = jnp.asarray(rng.uniform(0.1, 0.9, size=(20, 3)))
        transform.fit(x)

        @jax.jit
        def apply(t, x):
            return t.forward(x)[0]

        y = apply(transform, x)
        expected, _ = transform.forward(x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(expected), atol=1e-10
        )

    def test_refit_no_recompile(self, rng):
        """Refitting the affine part must not retrigger compilation."""
        t = CompositeTransform(
            parameters=["a", "b"],
            prior_bounds={"a": [-5, 5], "b": [-5, 5]},
            bounded_to_unbounded=False,
            affine_transform=True,
        )
        x1 = jnp.asarray(rng.normal(0, 1, size=(50, 2)))
        x2 = jnp.asarray(rng.normal(5, 3, size=(50, 2)))

        traces = []

        @jax.jit
        def apply(t, x):
            traces.append(1)
            return t.forward(x)[0]

        t.fit(x1)
        apply(t, x1)
        t.fit(x2)
        apply(t, x2)
        assert len(traces) == 1


class TestFlowTransform:
    def test_no_periodic(self):
        t = FlowTransform(
            parameters=["a", "b"],
            prior_bounds={"a": [0, 1], "b": [0, 1]},
        )
        assert t.periodic_parameters == []
        assert "periodic_parameters" not in t.config_dict()

    def test_roundtrip(self, rng):
        t = FlowTransform(
            parameters=["a", "b"],
            prior_bounds={"a": [0, 1], "b": [0, 1]},
            bounded_transform="probit",
        )
        x = jnp.asarray(rng.uniform(0.05, 0.95, size=(100, 2)))
        t.fit(x)
        check_roundtrip(t, x, atol=1e-6)
