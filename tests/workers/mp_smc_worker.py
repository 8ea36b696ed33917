"""Worker for the 2-process end-to-end SMC test.

Two controllers share a 4-device CPU mesh: the full pipeline (flow
proposal, sharded adaptive-tempered SMC, per-process shard-wise
checkpoints, mid-ladder resume in a fresh sampler) runs SPMD across
processes and must produce identical results on both.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..")
)

pid = int(sys.argv[1])
port = sys.argv[2]
workdir = sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=pid,
)

import numpy as np
from jax.sharding import Mesh

from aspire_tpu.flows import Flow
from aspire_tpu.io import checkpoint_barrier
from aspire_tpu.models import GaussianProblem
from aspire_tpu.samplers import PCNSMC

mesh = Mesh(np.array(jax.devices()), ("data",))
problem = GaussianProblem(dims=2)
rng = np.random.default_rng(1)
flow = Flow(dims=2, architecture="maf", key=0, n_layers=2)
flow.fit(problem.draw_initial_samples(rng, 512), n_epochs=3,
         batch_size=256)


def make_sampler():
    return PCNSMC(
        log_likelihood=problem.log_likelihood,
        log_prior=problem.log_prior,
        dims=2,
        prior_flow=flow,
        parameters=problem.parameters,
        rng=jax.random.key(9),
        mesh=mesh,
    )


path = os.path.join(workdir, "smc.h5")
first = make_sampler()
first.sample(
    64,
    max_n_steps=2,
    sampler_kwargs={"n_steps": 3},
    checkpoint_every=1,
    checkpoint_file_path=path,
    device_ladder=False,
)
prefix = list(first.history.beta)
assert os.path.exists(path if pid == 0 else f"{path}.proc1")
checkpoint_barrier("after-first-leg")

fresh = make_sampler()
out = fresh.sample(
    64,
    resume_from=path,
    sampler_kwargs={"n_steps": 3},
    device_ladder=False,
)
assert fresh.history.beta[: len(prefix)] == prefix
assert fresh.history.beta[-1] == 1.0
assert np.isfinite(float(out.log_evidence))
checkpoint_barrier("done")
print(f"proc {pid} OK logZ={float(out.log_evidence):.4f}", flush=True)
