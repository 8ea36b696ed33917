"""Which part of the ladder body costs? Add parts incrementally."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
from aspire_tpu.flows import Flow
from aspire_tpu.models import GaussianMixtureProblem
from aspire_tpu.samplers import kernels as K
from aspire_tpu.samplers.smc import _iteration_stats
from aspire_tpu.ops.resampling import systematic_resample
from aspire_tpu.flows.bijectors import standard_normal_log_prob

n, d = 131072, 4
problem = GaussianMixtureProblem(dims=d)
flow = Flow(dims=d, architecture="nsf", key=0, n_layers=4, n_hidden=(64,64))
params = jax.tree.map(
    lambda p: p + 0.1*jax.random.normal(jax.random.key(7), p.shape, p.dtype),
    flow.params)
arch, dt = flow.architecture, flow.data_transform
x0 = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)

class _V: __slots__=("x",)
def flow_lq(x):
    x_t, log_j = dt.forward(x)
    z, log_det = arch.forward(params, x_t)
    return standard_normal_log_prob(z) + log_det + log_j
def target(x):
    v=_V(); v.x=x
    return problem.log_likelihood(v), problem.log_prior(v)
def tempered(x, beta):
    lq = flow_lq(x); ll, lpi = target(x)
    lp = (1-beta)*lq + beta*(ll+lpi)
    return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

def chain(x, key, beta, n_steps=20):
    lp_fn = lambda z: tempered(z, beta)
    ref = K.fit_gaussian_reference(x)
    st = K.ChainState(x=x, log_prob=lp_fn(x), key=key,
                      step_size=jnp.asarray(0.5, jnp.float32),
                      n_accept=jnp.zeros(n, jnp.float32))
    fin, _ = K.run_chain(functools.partial(K.tpcn_step, log_prob_fn=lp_fn, ref=ref),
                         st, n_steps)
    return fin.x

def make(variant):
    @jax.jit
    def run(x, key):
        def cond(s): return s[2] < 5
        def body(s):
            x, key, i = s
            key, k1, k2 = jax.random.split(key, 3)
            beta = 0.1 + 0.2 * i.astype(jnp.float32)
            if variant >= 1:  # stats (incl. bisect)
                ll, lpi = target(x); lq = flow_lq(x)
                stats = _iteration_stats(ll, lpi, lq, beta - 0.2, jnp.float32(1.0),
                                         jnp.float32(0.5), jnp.float32(1e-8),
                                         jnp.float32(0.0), jnp.float32(1.0),
                                         adaptive=True, adaptive_min_step=False)
            if variant >= 2:  # resample
                lw = jnp.zeros(n, jnp.float32)
                idx = systematic_resample(k1, lw, n)
                x = x[idx]
            x = chain(x, k2, beta)
            return (x, key, i + 1)
        out, _, _ = jax.lax.while_loop(cond, body, (x, key, jnp.asarray(0)))
        return out
    return run

for v, name in [(0, "chains only"), (1, "+stats/bisect+densities"), (2, "+resample")]:
    run = make(v)
    float(jnp.sum(run(x0, jax.random.key(0))))
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); float(jnp.sum(run(x0, jax.random.key(0))))
        ts.append(time.perf_counter()-t0)
    ts.sort(); print(f"{name:26s}: {ts[2]:.3f}s")
