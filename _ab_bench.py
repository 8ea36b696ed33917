"""A/B: SMC mutation chain throughput, fused pallas vs XLA flow path."""
import time, functools
import jax, jax.numpy as jnp
from aspire_tpu.flows import Flow
from aspire_tpu.models import GaussianMixtureProblem
from aspire_tpu.samplers import kernels as K
from aspire_tpu.flows.bijectors import standard_normal_log_prob
from aspire_tpu.ops.fused_coupling import fused_coupling_apply

n, dims, n_steps = 131072, 4, 20
problem = GaussianMixtureProblem(dims=dims)
flow = Flow(dims=dims, architecture="nsf", key=0, n_layers=4, n_hidden=(64,64))
arch, dt = flow.architecture, flow.data_transform
params = jax.tree.map(
    lambda p: p + 0.1*jax.random.normal(jax.random.key(1), p.shape, p.dtype),
    flow.params)
x0 = jax.random.normal(jax.random.key(2), (n, dims), jnp.float32)

class _V: __slots__=("x",)
def make_tempered(fwd):
    def tempered(x, beta):
        x_t, log_j = dt.forward(x)
        z, log_det = fwd(params, x_t)
        log_q = standard_normal_log_prob(z) + log_det + log_j
        v=_V(); v.x=x
        lp = (1-beta)*log_q + beta*(problem.log_likelihood(v)+problem.log_prior(v))
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)
    return tempered

def make_mutate(fwd):
    tempered = make_tempered(fwd)
    @jax.jit
    def mutate(x, key):
        beta = jnp.float32(0.5)
        lp_fn = lambda z: tempered(z, beta)
        ref = K.fit_gaussian_reference(x)
        step = functools.partial(K.tpcn_step, log_prob_fn=lp_fn, ref=ref)
        state = K.ChainState(x=x, log_prob=lp_fn(x), key=key,
                             step_size=jnp.asarray(0.5, jnp.float32),
                             n_accept=jnp.zeros(n, jnp.float32))
        final, _ = K.run_chain(step, state, n_steps)
        return final.x, final.log_prob
    return mutate

mut_xla = make_mutate(lambda p, x: arch._forward_xla(p, x))
mut_fused = make_mutate(lambda p, x: fused_coupling_apply(arch, "forward", p, x))

key = jax.random.key(3)
for m in (mut_xla, mut_fused):
    jax.block_until_ready(m(x0, key))  # compile

res = {"xla": [], "fused": []}
for rep in range(6):
    for name, m in (("xla", mut_xla), ("fused", mut_fused)):
        t0 = time.perf_counter()
        out = m(x0, key)
        jax.block_until_ready(out)
        dt_s = time.perf_counter() - t0
        res[name].append(n*n_steps/dt_s)
for name, v in res.items():
    v.sort()
    print(f"{name:6s} median {v[len(v)//2]/1e6:8.2f} M particle-steps/s   "
          f"best {v[-1]/1e6:8.2f}")
