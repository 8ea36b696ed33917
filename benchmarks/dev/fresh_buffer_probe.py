import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
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
sampler = asp.sampler
kwargs = dict(sampler.default_sampler_kwargs)
beta_arr = jnp.asarray(0.5, jnp.float32)
z0 = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)

# same buffer repeated
for rep in range(3):
    t0=time.time()
    out = sampler._mutate_on_device(asp.flow.params, None, z0, beta_arr,
                                    jax.random.key(rep), 20, kwargs)
    float(jnp.sum(out[0]))
    print(f"same-buffer  rep {rep}: {time.time()-t0:6.2f}s")

# fresh DEVICE-COMPUTED buffer each call (like the pipeline's resample output)
z = z0
for rep in range(3):
    z = jax.block_until_ready(z * 1.000001)   # new device buffer
    t0=time.time()
    out = sampler._mutate_on_device(asp.flow.params, None, z, beta_arr,
                                    jax.random.key(rep), 20, kwargs)
    float(jnp.sum(out[0]))
    print(f"fresh-buffer rep {rep}: {time.time()-t0:6.2f}s")
