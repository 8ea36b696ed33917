"""Statistical correctness of the on-device resampling schemes.

The reference only exercises multinomial resampling (via host numpy
rng.choice); here every scheme is checked for (a) index validity,
(b) unbiasedness — expected offspring counts proportional to the
normalized weights — and (c) the variance ordering that motivates the
systematic default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.ops.resampling import get_resampler

METHODS = ["systematic", "stratified", "multinomial", "residual"]


@pytest.mark.parametrize("method", METHODS)
def test_indices_valid_and_shape(method):
    log_w = jnp.log(jnp.asarray([0.1, 0.4, 0.2, 0.3]))
    idx = get_resampler(method)(jax.random.key(0), log_w, 1000)
    idx = np.asarray(idx)
    assert idx.shape == (1000,)
    assert idx.min() >= 0 and idx.max() <= 3


@pytest.mark.parametrize("method", METHODS)
def test_offspring_counts_proportional_to_weights(method):
    n = 64
    rng = np.random.default_rng(3)
    w = rng.gamma(2.0, size=n)
    w /= w.sum()
    log_w = jnp.log(jnp.asarray(w))
    n_out = 200_000
    idx = np.asarray(get_resampler(method)(jax.random.key(1), log_w, n_out))
    counts = np.bincount(idx, minlength=n) / n_out
    # Multinomial MC error ~ sqrt(w/n_out) <~ 5e-4; 6-sigma bound.
    np.testing.assert_allclose(counts, w, atol=3e-3)


def test_systematic_lower_variance_than_multinomial():
    n = 256
    rng = np.random.default_rng(5)
    w = rng.gamma(1.0, size=n)
    w /= w.sum()
    log_w = jnp.log(jnp.asarray(w))

    def count_var(method, reps=50):
        vs = []
        for r in range(reps):
            idx = np.asarray(
                get_resampler(method)(jax.random.key(r), log_w, n)
            )
            counts = np.bincount(idx, minlength=n)
            vs.append(counts)
        vs = np.stack(vs)
        return vs.var(axis=0).mean()

    assert count_var("systematic") < 0.5 * count_var("multinomial")


@pytest.mark.parametrize("method", METHODS)
def test_degenerate_single_weight(method):
    """All mass on one particle -> every offspring is that particle."""
    log_w = jnp.asarray([-jnp.inf, 0.0, -jnp.inf, -jnp.inf])
    idx = np.asarray(get_resampler(method)(jax.random.key(2), log_w, 64))
    assert (idx == 1).all()
