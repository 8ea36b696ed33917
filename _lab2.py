"""Amortized in-scan cost of tpcn_step components."""
import time, functools
import jax, jax.numpy as jnp
from aspire_tpu.flows import Flow
from aspire_tpu.models import GaussianMixtureProblem
from aspire_tpu.samplers import kernels as K
from aspire_tpu.flows.bijectors import standard_normal_log_prob

n, d, STEPS = 131072, 4, 500
problem = GaussianMixtureProblem(dims=d)
flow = Flow(dims=d, architecture="nsf", key=0, n_layers=4, n_hidden=(64,64))
flow.params = jax.tree.map(
    lambda p: p + 0.1*jax.random.normal(jax.random.key(7), p.shape, p.dtype),
    flow.params)
arch, dt, params = flow.architecture, flow.data_transform, flow.params
x0 = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
ref = K.fit_gaussian_reference(x0)

class _V: __slots__=("x",)
def tempered(x, beta=0.5):
    x_t, log_j = dt.forward(x)
    z, log_det = arch.forward(params, x_t)
    log_q = standard_normal_log_prob(z) + log_det + log_j
    v=_V(); v.x=x
    lp = (1-beta)*log_q + beta*(problem.log_likelihood(v)+problem.log_prior(v))
    return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

def target_only(x):
    v=_V(); v.x=x
    return problem.log_likelihood(v)+problem.log_prior(v)

def scan_of(body):
    @jax.jit
    def run(x, key):
        def step(carry, i):
            x, key = carry
            key = jax.random.fold_in(key, i)
            x = body(x, key)
            return (x, key), None
        (xf, _), _ = jax.lax.scan(step, (x, key), jnp.arange(STEPS))
        return xf
    return run

bodies = {
  "noop":        lambda x, k: x*1.0001,
  "gamma":       lambda x, k: x + 1e-9*jax.random.gamma(k, 4.5, (n,), dtype=jnp.float32)[:,None],
  "normal+unif": lambda x, k: x + 1e-9*(jax.random.normal(k,(n,d),jnp.float32) + jax.random.uniform(k,(n,))[:,None]),
  "mahal2":      lambda x, k: x + 1e-9*(K._mahalanobis_sq(ref,x) + K._mahalanobis_sq(ref,x*1.0001))[:,None],
  "target":      lambda x, k: x + 1e-9*target_only(x)[:,None],
  "flow":        lambda x, k: x + 1e-9*tempered(x)[:,None],
  "full_tpcn":   None,
}

def tpcn_body(x, k):
    st = K.ChainState(x=x, log_prob=tempered(x)*0.0, key=k,
                      step_size=jnp.asarray(0.5, jnp.float32),
                      n_accept=jnp.zeros(n, jnp.float32))
    st2 = K.tpcn_step(st, log_prob_fn=tempered, ref=ref)
    return st2.x
bodies["full_tpcn"] = tpcn_body

def med(run, reps=5):
    float(jnp.sum(run(x0, jax.random.key(0))))
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); float(jnp.sum(run(x0, jax.random.key(0))))
        ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]/STEPS*1e3

for name, b in bodies.items():
    print(f"{name:12s} {med(scan_of(b)):7.3f} ms/step", flush=True)
