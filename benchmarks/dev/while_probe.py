"""Isolate while_loop overhead: 5x20-step chains, one program vs five."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
from aspire_tpu.flows import Flow
from aspire_tpu.models import GaussianMixtureProblem
from aspire_tpu.samplers import kernels as K
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
def tempered(x, beta):
    x_t, log_j = dt.forward(x)
    z, log_det = arch.forward(params, x_t)
    lq = standard_normal_log_prob(z) + log_det + log_j
    v=_V(); v.x=x
    lp = (1-beta)*lq + beta*(problem.log_likelihood(v)+problem.log_prior(v))
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

@jax.jit
def five_in_while(x, key):
    def cond(s): return s[2] < 5
    def body(s):
        x, key, i = s
        key, k = jax.random.split(key)
        beta = 0.1 + 0.2 * i.astype(jnp.float32)
        return (chain(x, k, beta), key, i + 1)
    out, _, _ = jax.lax.while_loop(cond, body, (x, key, jnp.asarray(0)))
    return out

@functools.partial(jax.jit, static_argnames=("i",))
def one(x, key, i):
    return chain(x, key, jnp.asarray(0.1 + 0.2*i, jnp.float32))

def fetch(r): float(jnp.sum(r))

# warm
fetch(five_in_while(x0, jax.random.key(0)))
for i in range(5): fetch(one(x0, jax.random.key(i), i))

ts=[]
for _ in range(5):
    t0=time.perf_counter(); fetch(five_in_while(x0, jax.random.key(0)))
    ts.append(time.perf_counter()-t0)
ts.sort(); print(f"while(5 chains, 1 dispatch): {ts[2]:.3f}s")

ts=[]
for _ in range(5):
    t0=time.perf_counter()
    x = x0
    for i in range(5):
        x = one(x, jax.random.key(i), i)
    fetch(x)
    ts.append(time.perf_counter()-t0)
ts.sort(); print(f"five dispatches            : {ts[2]:.3f}s")
