"""Comparison plotting (parity: reference plot.py:12-91)."""

from __future__ import annotations

import copy
from typing import Any


def plot_comparison(
    *samples,
    parameters: list[str] | None = None,
    per_samples_kwargs: list[dict[str, Any]] | None = None,
    labels: list[str] | None = None,
    **kwargs,
):
    """Overlayed corner plots of multiple Samples objects."""
    import matplotlib.pyplot as plt

    default_kwargs = dict(
        density=True,
        bins=30,
        color="C0",
        smooth=1.0,
        plot_datapoints=True,
        plot_density=False,
        hist_kwargs=dict(density=True, color="C0"),
    )
    default_kwargs.update(kwargs)

    if per_samples_kwargs is None:
        per_samples_kwargs = [{} for _ in samples]
    elif len(per_samples_kwargs) != len(samples):
        raise ValueError(
            "per_samples_kwargs must have the same length as samples"
        )

    fig = None
    for i, sample in enumerate(samples):
        kwds = copy.deepcopy(default_kwargs)
        sample_kwargs = copy.deepcopy(per_samples_kwargs[i])
        color = sample_kwargs.pop("color", f"C{i}")
        kwds["color"] = color
        kwds["hist_kwargs"]["color"] = color
        kwds.update(sample_kwargs)
        previous_fig = fig
        fig = sample.plot_corner(fig=fig, parameters=parameters, **kwds)
        if previous_fig is not None and fig is not previous_fig:
            plt.close(previous_fig)

    if labels:
        fig.legend(
            labels=labels,
            loc="upper right",
            bbox_to_anchor=(0.9, 0.9),
            bbox_transform=fig.transFigure,
        )
    return fig


def plot_history_comparison(*histories):
    if not all(isinstance(h, type(histories[0])) for h in histories):
        raise ValueError("All histories must be of the same type")
    fig = histories[0].plot()
    for history in histories[1:]:
        fig = history.plot(fig=fig)
    return fig
