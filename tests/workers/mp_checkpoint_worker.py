"""Worker for the 2-process sharded-checkpoint test.

Each process owns 2 of 4 CPU devices on a shared mesh, writes ONLY its
addressable shards to its own file (process 0 -> ckpt.h5, process 1 ->
ckpt.h5.proc1), barriers, then reloads the distributed array reading
only the hyperslabs for its own shards — the actual multi-host
checkpoint contract from docs/checkpointing.md.
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

import h5py
import jax.numpy as jnp  # noqa: F401
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aspire_tpu.io import (
    checkpoint_barrier,
    checkpoint_shard_files,
    load_sharded_array,
    process_checkpoint_path,
    save_sharded_array,
)

assert jax.device_count() == 4 and jax.local_device_count() == 2
mesh = Mesh(np.array(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data"))

n, d = 16, 3
full = np.arange(n * d, dtype=np.float32).reshape(n, d)
global_x = jax.make_array_from_callback(
    (n, d), sharding, lambda idx: full[idx]
)
assert len(global_x.addressable_shards) == 2  # only local shards

path = os.path.join(workdir, "ckpt.h5")
with h5py.File(process_checkpoint_path(path), "a") as f:
    save_sharded_array(f, "checkpoint/arrays/x", global_x)
checkpoint_barrier()

if pid == 0:
    # The main file alone holds only process 0's shards: full-host
    # assembly must fail loudly, not return garbage.
    with h5py.File(path, "r") as f0:
        try:
            load_sharded_array(f0, "checkpoint/arrays/x")
        except ValueError:
            pass
        else:
            raise SystemExit("expected unfilled-region error")

files = [h5py.File(p, "r") for p in checkpoint_shard_files(path)]
try:
    assert len(files) == 2, [f.filename for f in files]
    restored = load_sharded_array(
        files, "checkpoint/arrays/x", sharding=sharding
    )
finally:
    for f in files:
        f.close()
for shard in restored.addressable_shards:
    np.testing.assert_array_equal(
        np.asarray(shard.data), full[shard.index]
    )
checkpoint_barrier("done")
print(f"proc {pid} OK", flush=True)
