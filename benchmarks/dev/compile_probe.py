import os, sys, time, logging
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax
from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem

configure_logger("WARNING")
p = GaussianMixtureProblem(dims=4)
rng = np.random.default_rng(42)
asp = Aspire(log_likelihood=p.log_likelihood, log_prior=p.log_prior,
             dims=4, flow_backend="nsf", seed=1)
asp.fit(Samples(p.draw_initial_samples(rng, 8192)), n_epochs=10, batch_size=512)
n = 131072
asp.sample_posterior(sampler="smc", n_samples=n, preconditioning="none",
                     store_sample_history=False, sampler_kwargs=dict(n_steps=20))
jax.config.update("jax_log_compiles", True)
logging.getLogger("jax").setLevel(logging.WARNING)
t0=time.time()
asp.sample_posterior(sampler="smc", n_samples=n, preconditioning="none",
                     store_sample_history=False, sampler_kwargs=dict(n_steps=20))
print(f"second run wall: {time.time()-t0:.2f}s")
