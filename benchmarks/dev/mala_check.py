import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem

configure_logger("WARNING")
p = GaussianMixtureProblem(dims=4)
rng = np.random.default_rng(0)
asp = Aspire(log_likelihood=p.log_likelihood, log_prior=p.log_prior,
             dims=4, flow_backend="nsf", seed=1)
asp.fit(Samples(p.draw_initial_samples(rng, 8192)), n_epochs=25, batch_size=512)
true = -9.3709
for n_steps in [10, 30, 100]:
    post = asp.sample_posterior(sampler="mala_smc", n_samples=16384,
                                store_sample_history=False,
                                sampler_kwargs=dict(n_steps=n_steps))
    acc = asp.sampler.history.mcmc_acceptance
    print(f"mala n_steps={n_steps:4d}: logZ={float(post.log_evidence):.4f} "
          f"(true {true})  acc={np.round(acc,3)}")
