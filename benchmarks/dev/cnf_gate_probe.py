"""Scratch probe: can the CNF (flow matching) pass the validate gates?

Fits a flow-matching proposal on the Gaussian and mixture targets and
prints logZ for importance + SMC at a few ODE step counts, on CPU.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem, GaussianProblem

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from validate import analytic_log_z  # noqa: E402

configure_logger("WARNING")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 60

for problem, init_fn in [
    (
        GaussianProblem(dims=4),
        lambda rng: rng.normal(1.0, 1.2, size=(8192, 4)),
    ),
    (
        GaussianMixtureProblem(dims=4),
        lambda rng: GaussianMixtureProblem(dims=4).draw_initial_samples(
            rng, 8192
        ),
    ),
]:
    true = analytic_log_z(problem)
    for n_steps in (32, 64):
        rng = np.random.default_rng(0)
        asp = Aspire(
            log_likelihood=problem.log_likelihood,
            log_prior=problem.log_prior,
            dims=problem.dims,
            prior_bounds=problem.prior_bounds,
            flow_matching=True,
            n_steps=n_steps,
            seed=1,
        )
        asp.fit(Samples(init_fn(rng)), n_epochs=EPOCHS, batch_size=512)
        for sampler, kw in [
            ("importance", {}),
            ("smc", {"sampler_kwargs": {"n_steps": 20}}),
        ]:
            post = asp.sample_posterior(
                sampler=sampler,
                n_samples=N,
                store_sample_history=False,
                **kw,
            )
            lz = float(post.log_evidence)
            err = float(post.log_evidence_error)
            print(
                f"{type(problem).__name__} ode_steps={n_steps} "
                f"{sampler}: logZ={lz:.4f} +- {err:.4f} true={true:.4f} "
                f"diff={lz - true:+.4f}",
                flush=True,
            )
