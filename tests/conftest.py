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

# NO persistent compilation cache. Two distinct jaxlib crashes were
# observed with one enabled on this stack (round 4): (a) XLA:CPU AOT
# executables are machine-feature-specialized, so a cache written by a
# different host SIGSEGVs in get_executable_and_time on load; (b) the
# explicit-collective resamplers' 8-device executables intermittently
# SIGSEGV in put_executable_and_time while SERIALIZING — and the cache
# cannot be disabled per-module once initialized (jax latches it at
# first use). Determinism beats repeat-run compile savings here.

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
