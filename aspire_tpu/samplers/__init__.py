"""Samplers: importance, MCMC, and adaptive-tempered SMC.

Registry parity with the reference's string -> class dispatch
(aspire.py:272-305), including reference sampler names as aliases and
entry-point lookup under ``aspire_tpu.samplers``.
"""

from __future__ import annotations

from .base import Sampler  # noqa: F401
from .importance import ImportanceSampler  # noqa: F401
from .mcmc import (  # noqa: F401
    EnsembleSampler,
    MCMCSampler,
    ParallelTemperedSampler,
    PCNSampler,
)
from .smc import (  # noqa: F401
    BetaScheduleError,
    EnsembleSMC,
    GradientSMC,
    HMCSMC,
    MALASMC,
    NUTSSMC,
    PCNSMC,
    RWMHSMC,
    SMCSampler,
)

SAMPLER_REGISTRY: dict[str, type] = {
    "importance": ImportanceSampler,
    # Standalone MCMC.
    "mcmc": PCNSampler,
    "pcn": PCNSampler,
    "minipcn": PCNSampler,
    "ensemble": EnsembleSampler,
    "emcee": EnsembleSampler,
    "ptmcmc": ParallelTemperedSampler,
    "parallel_tempered": ParallelTemperedSampler,
    # SMC variants.
    "smc": PCNSMC,
    "pcn_smc": PCNSMC,
    "minipcn_smc": PCNSMC,
    "ensemble_smc": EnsembleSMC,
    "emcee_smc": EnsembleSMC,
    "blackjax_smc": HMCSMC,
    "hmc_smc": HMCSMC,
    "nuts_smc": NUTSSMC,
    "mala_smc": MALASMC,
    "rwmh_smc": RWMHSMC,
}


def get_sampler_class(name: str) -> type:
    """Resolve a sampler class by name (built-ins, then entry points)."""
    key = name.lower()
    if key in SAMPLER_REGISTRY:
        return SAMPLER_REGISTRY[key]
    from importlib.metadata import entry_points

    eps = entry_points(group="aspire_tpu.samplers")
    for ep in eps:
        if ep.name == key:
            return ep.load()
    raise ValueError(
        f"Unknown sampler '{name}'. Known samplers: "
        f"{sorted(SAMPLER_REGISTRY)} plus entry points "
        f"{sorted(ep.name for ep in eps)}"
    )
