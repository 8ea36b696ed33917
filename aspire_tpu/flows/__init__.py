"""Normalizing flows: architectures, training, factory.

Factory parity with the reference's ``get_flow_wrapper``
(flows/__init__.py:7-68): string names resolve to flow classes, with
entry-point lookup under the group ``aspire_tpu.flows`` for plugins.
"""

from __future__ import annotations

from .architectures import ARCHITECTURES, get_architecture  # noqa: F401
from .base import Flow  # noqa: F401
from .matching import FlowMatching  # noqa: F401
from .train import TrainConfig, fit_flow  # noqa: F401

_KNOWN_BACKENDS = {
    "maf": Flow,
    "nsf": Flow,
    "realnvp": Flow,
    "maf-rqs": Flow,
    "coupling": Flow,
    # Aliases for reference-style backend names ("zuko" is the
    # reference default whose default architecture is MAF,
    # flows/torch/flows.py:155-158 — same density family natively).
    "jax": Flow,
    "flowjax": Flow,
    "native": Flow,
    "zuko": Flow,
    "torch": Flow,
    "flow_matching": FlowMatching,
    "cnf": FlowMatching,
}


def get_flow_class(
    backend: str = "maf", flow_matching: bool = False
) -> type:
    """Resolve a flow class from a backend/architecture name.

    Checks built-ins first, then ``aspire_tpu.flows`` entry points
    (reference flows/__init__.py:48-68).
    """
    if flow_matching:
        return FlowMatching
    name = (backend or "maf").lower()
    if name in _KNOWN_BACKENDS:
        return _KNOWN_BACKENDS[name]
    from importlib.metadata import entry_points

    eps = entry_points(group="aspire_tpu.flows")
    for ep in eps:
        if ep.name == name:
            return ep.load()
    raise ValueError(
        f"Unknown flow backend '{backend}'. Known backends: "
        f"{sorted(_KNOWN_BACKENDS)} plus entry points "
        f"{sorted(ep.name for ep in eps)}"
    )


def default_architecture_for_backend(backend: str) -> str:
    """Map a backend name to the architecture string for :class:`Flow`."""
    name = (backend or "maf").lower()
    if name in ("jax", "flowjax", "native", "zuko", "torch"):
        return "maf"
    if name in ARCHITECTURES:
        return name
    return "maf"
