"""Render every plotting surface from one real SMC run into
docs/figures/ — the committed artifact behind docs/plot_parity.md.

Mirrors the reference's smc_example figure set (reference
examples/smc_example.py + history.py:151-427 + plot.py:12-91): corner
comparison of initial/posterior samples, the combined history panel,
sample-history scatter, quantile bands, flow-loss curve, and the
lineage-fraction diagnostic (no reference counterpart).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem
from aspire_tpu.plot import plot_comparison

OUT = os.path.join(
    os.path.dirname(__file__), "..", "..", "docs", "figures"
)
os.makedirs(OUT, exist_ok=True)
configure_logger("WARNING")

problem = GaussianMixtureProblem(dims=4)
rng = np.random.default_rng(42)
initial = Samples(
    problem.draw_initial_samples(rng, 4000),
    parameters=problem.parameters,
)
asp = Aspire(
    log_likelihood=problem.log_likelihood,
    log_prior=problem.log_prior,
    dims=4,
    parameters=problem.parameters,
    flow_backend="nsf",
    seed=2,
)
flow_history = asp.fit(initial, n_epochs=25, batch_size=512)
posterior, history = asp.sample_posterior(
    sampler="smc",
    n_samples=2000,
    n_final_samples=4000,
    sampler_kwargs={"n_steps": 20},
    store_sample_history=True,
    return_history=True,
)


def save(fig, name):
    fig.savefig(os.path.join(OUT, name), dpi=110, bbox_inches="tight")
    plt.close(fig)
    print("wrote", name)


save(
    plot_comparison(
        initial,
        posterior,
        labels=["Initial samples", "SMC posterior"],
    ),
    "corner_comparison.png",
)
save(history.plot(), "smc_history_panels.png")
save(history.plot_sample_history(n_samples=300), "sample_history.png")
save(history.plot_quantile_bands(), "quantile_bands.png")
save(history.plot_lineage_fraction(), "lineage_fraction.png")
save(flow_history.plot_loss(), "flow_loss.png")
print(
    f"logZ = {float(posterior.log_evidence):.3f} "
    f"+- {float(posterior.log_evidence_error):.3f}"
)
