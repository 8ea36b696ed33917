"""Full SMC pipeline at scale with phase profiling."""
import time
import numpy as np
from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem

configure_logger("WARNING")
p = GaussianMixtureProblem(dims=4)
rng = np.random.default_rng(42)
init = Samples(p.draw_initial_samples(rng, 8192))
asp = Aspire(log_likelihood=p.log_likelihood, log_prior=p.log_prior,
             dims=4, flow_backend="nsf", seed=1)
asp.fit(init, n_epochs=20, batch_size=512)
t0 = time.time()
post, hist = asp.sample_posterior(
    sampler="smc", n_samples=131072, sampler_kwargs=dict(n_steps=20),
    store_sample_history=False, return_history=True)
wall = time.time() - t0
print(f"wall {wall:.1f}s  logZ {float(post.log_evidence):.4f} "
      f"n_temps={len(hist.beta)}")
prof = asp.sampler.profiler
for name, st in prof.phases.items():
    print(f"  {name:ütze20s}" if False else f"  {name:20s} {st.total_s:8.2f}s  x{st.count}")

# Second run: compilation is cached, shows steady-state pipeline cost.
t0 = time.time()
post2, hist2 = asp.sample_posterior(
    sampler="smc", n_samples=131072, sampler_kwargs=dict(n_steps=20),
    store_sample_history=False, return_history=True)
print(f"second run wall {time.time()-t0:.1f}s  logZ {float(post2.log_evidence):.4f} "
      f"n_temps={len(hist2.beta)}")
prof2 = asp.sampler.profiler
for name, st in prof2.phases.items():
    print(f"  {name:20s} {st.total_s:8.2f}s  x{st.count}")
