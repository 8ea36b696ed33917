"""Numerical primitives: stable reductions, resampling, special functions."""

from .special import (  # noqa: F401
    effective_sample_size,
    logit,
    logsumexp,
    sigmoid,
)
from .resampling import (  # noqa: F401
    multinomial_resample,
    residual_resample,
    stratified_resample,
    systematic_resample,
)
