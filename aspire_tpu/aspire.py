"""Orchestrator facade (placeholder; full implementation follows)."""


class Aspire:  # pragma: no cover - placeholder
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("Aspire orchestrator not yet implemented")
