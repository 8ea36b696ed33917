"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (mirrors how the reference parametrizes one
suite over backends; SURVEY.md §4). x64 is enabled for tight statistical
parity checks (the reference relies on float64 for logZ parity).
"""

import jax

# Force CPU with 8 virtual devices. NB: env vars (JAX_PLATFORMS/XLA_FLAGS)
# are too late here — a site .pth imports jax at interpreter startup — so
# the config API is used instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.key(42)


@pytest.fixture(params=["float32", "float64", None])
def dtype(request):
    return request.param
