"""Pareto follow-up: judge candidate flow presets under the refit bar.

Single-seed funnel margins are dominated by flow-fit seed variation
(the round-3 A/B), so the preset decision uses the round-4 honest bar:
``replicated_evidence(3, refit_flow=True)`` on the funnel + mixture.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import FunnelProblem, GaussianMixtureProblem
from validate import analytic_log_z

configure_logger("WARNING")

CANDIDATES = {
    "L4-H64x2-B8 (default)": {
        "n_layers": 4, "n_hidden": (64, 64), "num_bins": 8,
    },
    "L3-H64x2-B8": {"n_layers": 3, "n_hidden": (64, 64), "num_bins": 8},
    "L3-H64x2-B4": {"n_layers": 3, "n_hidden": (64, 64), "num_bins": 4},
    "L2-H64x2-B4": {"n_layers": 2, "n_hidden": (64, 64), "num_bins": 4},
    "L2-H32x2-B4": {"n_layers": 2, "n_hidden": (32, 32), "num_bins": 4},
}

for problem, init_fn in [
    (
        GaussianMixtureProblem(dims=4),
        lambda rng: GaussianMixtureProblem(dims=4).draw_initial_samples(
            rng, 8192
        ),
    ),
    (
        FunnelProblem(dims=5),
        lambda rng: FunnelProblem(dims=5).draw_initial_samples(rng, 8192),
    ),
]:
    true = analytic_log_z(problem)
    for name, cfg in CANDIDATES.items():
        rng = np.random.default_rng(0)
        asp = Aspire(
            log_likelihood=problem.log_likelihood,
            log_prior=problem.log_prior,
            dims=problem.dims,
            prior_bounds=problem.prior_bounds,
            flow_backend="nsf",
            seed=1,
            **cfg,
        )
        asp.fit(Samples(init_fn(rng)), n_epochs=25, batch_size=512)
        post = asp.replicated_evidence(
            3,
            refit_flow=True,
            fit_kwargs={"n_epochs": 25, "batch_size": 512},
            sampler="smc",
            n_samples=16384,
            store_sample_history=False,
            sampler_kwargs={"n_steps": 20},
        )
        lz = float(post.log_evidence)
        err = float(post.log_evidence_error)
        print(
            json.dumps(
                {
                    "problem": type(problem).__name__,
                    "config": name,
                    "log_z": round(lz, 4),
                    "err": round(err, 4),
                    "abs_diff": round(abs(lz - true), 4),
                    "replicates": [
                        round(v, 4) for v in post.log_evidence_replicates
                    ],
                    "true": round(true, 4),
                }
            ),
            flush=True,
        )
