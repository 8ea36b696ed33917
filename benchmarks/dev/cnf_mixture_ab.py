"""A/B: can a better-trained CFM tighten the mixture importance gate?

The r4 CNF gate's mixture importance row is honest but weak
(-10.45 +- 0.76 vs truth -9.371): the transport map underfits the
bimodal target as an IS proposal. Candidates: longer training, wider
velocity net, more ODE steps.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem
from validate import analytic_log_z

configure_logger("WARNING")

problem = GaussianMixtureProblem(dims=4)
true = analytic_log_z(problem)

VARIANTS = {
    "r4-config (H128x3, 120ep, ode64)": dict(
        n_hidden=(128, 128, 128), n_steps=64, epochs=120
    ),
    "240ep": dict(n_hidden=(128, 128, 128), n_steps=64, epochs=240),
    "H256x3": dict(n_hidden=(256, 256, 256), n_steps=64, epochs=120),
    "H256x3+240ep": dict(
        n_hidden=(256, 256, 256), n_steps=64, epochs=240
    ),
    "ode128": dict(n_hidden=(128, 128, 128), n_steps=128, epochs=120),
}

for name, cfg in VARIANTS.items():
    cfg = dict(cfg)
    epochs = cfg.pop("epochs")
    rng = np.random.default_rng(0)
    asp = Aspire(
        log_likelihood=problem.log_likelihood,
        log_prior=problem.log_prior,
        dims=problem.dims,
        prior_bounds=problem.prior_bounds,
        flow_matching=True,
        seed=1,
        **cfg,
    )
    asp.fit(
        Samples(problem.draw_initial_samples(rng, 8192)),
        n_epochs=epochs,
        batch_size=512,
    )
    post = asp.sample_posterior(
        sampler="importance", n_samples=16384,
    )
    lz = float(post.log_evidence)
    err = float(post.log_evidence_error)
    print(
        json.dumps(
            {
                "variant": name,
                "log_z": round(lz, 4),
                "err": round(err, 4),
                "diff": round(lz - true, 4),
                "efficiency": round(float(post.efficiency), 5),
                "true": round(true, 4),
            }
        ),
        flush=True,
    )
