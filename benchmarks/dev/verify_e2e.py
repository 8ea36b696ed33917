"""End-to-end drive: Aspire facade, NSF flow, tempered SMC on TPU."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import os, sys, time
import numpy as np
import jax

print("devices:", jax.devices(), "fused flag:", os.environ.get("ASPIRE_TPU_FUSED", "1"))

from aspire_tpu import Aspire, Samples
from aspire_tpu.models import GaussianMixtureProblem

rng = np.random.default_rng(42)
dims = 4
problem = GaussianMixtureProblem(dims=dims)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000  # odd-ish size probe

initial = Samples(problem.draw_initial_samples(rng, 4000))
asp = Aspire(
    log_likelihood=problem.log_likelihood,
    log_prior=problem.log_prior,
    dims=dims,
    architecture="nsf",
    n_layers=4,
    n_hidden=(64, 64),
)
hist = asp.fit(initial, n_epochs=20, batch_size=512)
t0 = time.time()
post = asp.sample_posterior(sampler="smc", n_samples=n, n_steps=20, seed=7)
wall = time.time() - t0
lz = float(post.log_evidence); lze = float(post.log_evidence_error)
# analytic: mixture of Gaussian likelihoods x N(0,I) prior
import numpy as _np
def _comp(mu, var):
    d = len(mu)
    return (-0.5*d*_np.log(2*_np.pi*(1+var))
            - 0.5*_np.dot(mu, mu)/(1+var))
l1 = _comp(problem.mu1, problem.var1); l2 = _comp(problem.mu2, problem.var2)
true_lz = float(_np.logaddexp(l1, l2) - _np.log(2.0))
mean = np.asarray(post.x).mean(0)
print(f"n={n} logZ={lz:.4f} +- {lze:.4f}  true={true_lz:.4f}  "
      f"diff={abs(lz-true_lz):.4f}  wall={wall:.1f}s")
print("posterior mean:", np.round(mean, 3), " (true:", problem.true_mean if hasattr(problem,'true_mean') else "~0", ")")
ok = abs(lz - true_lz) < max(5*lze, 0.35)
print("ANCHOR", "OK" if ok else "FAIL")
