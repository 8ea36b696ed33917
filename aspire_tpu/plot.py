"""Corner and comparison plotting (parity: reference plot.py:12-91).

Includes a native matplotlib corner-plot implementation (the reference
depends on the external ``corner`` package; internalized here per
SURVEY.md §2.3, with the same call surface used by the framework:
``labels``, ``weights``, ``bins``, ``color``, ``hist_kwargs``, ``fig``
reuse for overlays).
"""

from __future__ import annotations

import copy
from typing import Any

import numpy as np


def corner_plot(
    x,
    fig=None,
    labels: list[str] | None = None,
    weights=None,
    bins: int = 30,
    color: str = "C0",
    hist_kwargs: dict | None = None,
    plot_datapoints: bool = True,
    density: bool = True,
    levels: tuple = (0.393, 0.865),
    **kwargs: Any,
):
    """d x d corner plot: histograms on the diagonal, 2-D density below.

    Returns the figure; pass ``fig`` to overlay another set of samples on
    the same axes (the overlay contract the comparison plots rely on).
    Unknown kwargs are accepted and ignored for reference-API
    compatibility.
    """
    import matplotlib.pyplot as plt

    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    d = x.shape[1]
    if fig is None:
        fig, axes = plt.subplots(
            d, d, figsize=(2.2 * d, 2.2 * d), squeeze=False
        )
        for i in range(d):
            for j in range(d):
                if j > i:
                    axes[i][j].set_visible(False)
        new_fig = True
    else:
        grid = np.asarray(fig.axes).reshape(d, d)
        axes = grid
        new_fig = False

    hist_kwargs = dict(hist_kwargs or {})
    hist_kwargs.setdefault("color", color)
    hist_kwargs.setdefault("density", density)

    for i in range(d):
        ax = axes[i][i]
        ax.hist(
            x[:, i],
            bins=bins,
            weights=weights,
            histtype="step",
            **hist_kwargs,
        )
        ax.set_yticks([])
        for j in range(i):
            ax2 = axes[i][j]
            if plot_datapoints:
                ax2.scatter(
                    x[:, j], x[:, i], s=2, alpha=0.3, color=color,
                    linewidths=0,
                )
            # 2-D histogram contours at the given mass levels.
            h, xe, ye = np.histogram2d(
                x[:, j], x[:, i], bins=bins, weights=weights
            )
            if h.sum() > 0:
                hs = np.sort(h.ravel())[::-1]
                cum = np.cumsum(hs) / hs.sum()
                cuts = [
                    hs[np.searchsorted(cum, lv)]
                    for lv in sorted(levels)[::-1]
                    if np.searchsorted(cum, lv) < len(hs)
                ]
                cuts = sorted(set(float(c) for c in cuts if c > 0))
                if cuts:
                    xc = 0.5 * (xe[:-1] + xe[1:])
                    yc = 0.5 * (ye[:-1] + ye[1:])
                    ax2.contour(
                        xc, yc, h.T, levels=cuts, colors=color,
                        linewidths=1.0,
                    )
    if labels is not None and new_fig:
        for j in range(d):
            axes[d - 1][j].set_xlabel(labels[j])
        for i in range(1, d):
            axes[i][0].set_ylabel(labels[i])
    return fig


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
