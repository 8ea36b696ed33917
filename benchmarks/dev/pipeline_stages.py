"""Wall time per stage of sample_posterior at n=131072 (current phase)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax
from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem

configure_logger("WARNING")
p = GaussianMixtureProblem(dims=4)
rng = np.random.default_rng(42)
asp = Aspire(log_likelihood=p.log_likelihood, log_prior=p.log_prior,
             dims=4, flow_backend="nsf", seed=1)
asp.fit(Samples(p.draw_initial_samples(rng, 8192)), n_epochs=20, batch_size=512)

n = 131072
# warm everything once
post = asp.sample_posterior(sampler="smc", n_samples=n, preconditioning="none",
                            store_sample_history=False,
                            sampler_kwargs=dict(n_steps=20))

import aspire_tpu.samplers.smc as smc_mod
sampler = asp.sampler

t0=time.time(); init = sampler.draw_initial_samples(n); t1=time.time()
print(f"draw_initial_samples : {t1-t0:6.2f}s")

from aspire_tpu.samples import SMCSamples
s = SMCSamples.from_samples(init, beta=0.0, dtype=sampler.dtype)
t0=time.time()
import jax.numpy as jnp
for name in ("log_q", "log_prior", "log_likelihood"):
    bool(jnp.isnan(getattr(s, name)).any())
t1=time.time(); print(f"init NaN checks      : {t1-t0:6.2f}s")

t0=time.time()
post2 = asp.sample_posterior(sampler="smc", n_samples=n, preconditioning="none",
                             store_sample_history=False,
                             sampler_kwargs=dict(n_steps=20))
t1=time.time(); print(f"full sample_posterior: {t1-t0:6.2f}s")
prof = asp.sampler.profiler
for name, st in prof.phases.items():
    print(f"  {name:20s} {st.total_s:8.2f}s x{st.count}")

# Repeat warm pipelines to see call-to-call variance.
for rep in range(3):
    t0 = time.time()
    asp.sample_posterior(sampler="smc", n_samples=n, preconditioning="none",
                         store_sample_history=False,
                         sampler_kwargs=dict(n_steps=20))
    print(f"repeat pipeline {rep}  : {time.time()-t0:6.2f}s")
