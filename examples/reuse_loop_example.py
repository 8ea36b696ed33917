"""Multi-round reuse: refit the flow on each round's posterior.

The BASELINE.json "multimodal re-fit loop" config: a Rosenbrock target
whose posterior is poorly matched by the initial draws; each round the
flow is refit to the previous round's posterior samples, so the SMC
ladder shortens round over round. The checkpoint/resume path is
exercised via ``auto_checkpoint``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathlib import Path

import numpy as np

from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import RosenbrockProblem

configure_logger("INFO")

outdir = Path("outdir") / "reuse_loop_example"
outdir.mkdir(parents=True, exist_ok=True)

rng = np.random.default_rng(1)
problem = RosenbrockProblem(dims=4)

aspire = Aspire(
    log_likelihood=problem.log_likelihood,
    log_prior=problem.log_prior,
    dims=problem.dims,
    prior_bounds=problem.prior_bounds,
    flow_backend="nsf",
    seed=0,
)

# Round 0 trains on broad prior draws; later rounds reuse the posterior.
samples = Samples(
    rng.uniform(problem.lower, problem.upper, size=(4000, problem.dims))
)

for round_ in range(3):
    aspire.fit(samples, n_epochs=30, batch_size=512)
    ckpt = outdir / f"round_{round_}.h5"
    with aspire.auto_checkpoint(ckpt, every=5):
        posterior, history = aspire.sample_posterior(
            sampler="smc",
            n_samples=4000,
            sampler_kwargs=dict(n_steps=20),
            return_history=True,
        )
    n_temps = len(history.beta)
    print(
        f"round {round_}: logZ = {float(posterior.log_evidence):.3f} "
        f"+/- {float(posterior.log_evidence_error):.3f} "
        f"({n_temps} temperature steps, "
        f"{aspire.n_likelihood_evaluations} likelihood evals)"
    )
    samples = posterior

posterior.plot_corner().savefig(outdir / "posterior.png")
