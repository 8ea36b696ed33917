"""Benchmark target distributions (jittable)."""

from .targets import (  # noqa: F401
    GaussianProblem,
    GaussianMixtureProblem,
    FunnelProblem,
    HierarchicalProblem,
    RosenbrockProblem,
    get_problem,
)
