"""Worker for the 2-process CHUNKED device-ladder checkpoint test.

The compiled device ladder on a multi-controller mesh cannot post
io_callback checkpoints (global gather); it must instead run in
checkpoint_every-sized chunks with shard-LOCAL writes between
dispatches (smc.py _run_device_ladder_chunked). This worker asserts:

1. per-iteration checkpoints are written mid-ladder (one per rung),
2. each process writes its own shard file,
3. a fresh sampler resumes from the mid-ladder file with the compiled
   ladder and finishes with a consistent history and finite logZ.
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


path = os.path.join(workdir, "ladder.h5")
first = make_sampler()
writes = []


def counting_callback(state):
    writes.append(state["iteration"])
    first.save_checkpoint_to_hdf(state, path)


first.sample(
    64,
    max_n_steps=2,
    sampler_kwargs={"n_steps": 3},
    checkpoint_every=1,
    checkpoint_callback=counting_callback,
    device_ladder=True,
)
prefix = list(first.history.beta)
# One shard-local checkpoint per temperature iteration, streamed
# between chunked dispatches of the compiled ladder (plus sample()'s
# usual forced final checkpoint).
assert writes[:2] == [1, 2], writes
assert len(prefix) == 2, prefix
assert os.path.exists(path if pid == 0 else f"{path}.proc1")
checkpoint_barrier("after-first-leg")

fresh = make_sampler()
out = fresh.sample(
    64,
    resume_from=path,
    sampler_kwargs={"n_steps": 3},
    device_ladder=True,
)
assert fresh.history.beta[: len(prefix)] == prefix, (
    fresh.history.beta, prefix,
)
assert fresh.history.beta[-1] == 1.0
assert np.isfinite(float(out.log_evidence))
checkpoint_barrier("done")
print(
    f"proc {pid} OK logZ={float(out.log_evidence):.4f} "
    f"iters={len(fresh.history.beta)}",
    flush=True,
)
