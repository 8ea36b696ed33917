"""One-off: does the lineage-inflated error cover mala_smc@10's bias
on the mixture (TODO.md 'Statistics' observable)?"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem
from benchmarks.validate import analytic_log_z

configure_logger("WARNING")
problem = GaussianMixtureProblem(dims=4)
rng = np.random.default_rng(0)
asp = Aspire(log_likelihood=problem.log_likelihood, log_prior=problem.log_prior,
             dims=4, prior_bounds=problem.prior_bounds, flow_backend="nsf", seed=1)
asp.fit(Samples(problem.draw_initial_samples(rng, 8192)), n_epochs=25, batch_size=512)
true = analytic_log_z(problem)
for n_steps in (10, 100):
    post = asp.sample_posterior(sampler="mala_smc", n_samples=16384,
                                store_sample_history=False,
                                sampler_kwargs={"n_steps": n_steps})
    lz, err = float(post.log_evidence), float(post.log_evidence_error)
    lin = asp.sampler.history.lineage_fraction
    print(f"n_steps={n_steps}: logZ={lz:.4f}+-{err:.4f} true={true:.4f} "
          f"bias={lz-true:+.4f} ({abs(lz-true)/err:.1f} sigma) "
          f"min lineage fraction={min(lin):.4f}", flush=True)
