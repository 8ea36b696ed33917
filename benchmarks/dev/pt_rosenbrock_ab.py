"""A/B the Rosenbrock PT stepping-stone bias (+0.044 at the r4 config).

Candidates: more temperatures (finer ladder), longer chains (better
per-rung equilibration), more pilot iterations, and more walkers —
against the quadrature truth -5.8041.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import RosenbrockProblem
from validate import analytic_log_z

configure_logger("WARNING")

problem = RosenbrockProblem(dims=2)
true = analytic_log_z(problem)
rng = np.random.default_rng(0)
asp = Aspire(
    log_likelihood=problem.log_likelihood,
    log_prior=problem.log_prior,
    dims=problem.dims,
    prior_bounds=problem.prior_bounds,
    flow_backend="nsf",
    seed=1,
)
asp.fit(
    Samples(problem.draw_initial_samples(rng, 8192)),
    n_epochs=25,
    batch_size=512,
)

BASE = dict(
    betas="adaptive",
    swap_every=5,
    ladder_pilot_steps=40,
    ladder_pilot_iterations=2,
)
VARIANTS = {
    "r4-config (T12, 400 steps, n512)": dict(
        BASE, n_steps=400, n_temperatures=12, n_samples=512
    ),
    "T16": dict(BASE, n_steps=400, n_temperatures=16, n_samples=512),
    "T24": dict(BASE, n_steps=400, n_temperatures=24, n_samples=512),
    "steps800": dict(
        BASE, n_steps=800, n_temperatures=12, n_samples=512
    ),
    "T16+steps800": dict(
        BASE, n_steps=800, n_temperatures=16, n_samples=512
    ),
    "pilot4": dict(
        BASE,
        n_steps=400,
        n_temperatures=12,
        n_samples=512,
        ladder_pilot_iterations=4,
    ),
    "n2048": dict(BASE, n_steps=400, n_temperatures=12, n_samples=2048),
}

for name, kw in VARIANTS.items():
    kw = dict(kw)
    n_samples = kw.pop("n_samples")
    post = asp.sample_posterior(
        sampler="ptmcmc", n_samples=n_samples, **kw
    )
    lz, err = post.log_evidence_stepping_stone()
    print(
        json.dumps(
            {
                "variant": name,
                "log_z": round(lz, 4),
                "err": round(err, 4),
                "diff": round(lz - true, 4),
                "n_temperatures": len(post.betas),
                "true": round(true, 4),
            }
        ),
        flush=True,
    )
