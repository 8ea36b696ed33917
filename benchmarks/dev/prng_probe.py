"""Probe pltpu in-kernel PRNG on the live TPU + interpret mode."""
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], seed_ref[1])
    bits = pltpu.prng_random_bits(out_ref.shape)
    # uniform in (0,1): top 24 bits
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    out_ref[:] = u

def run(interpret):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    out = f(jnp.asarray([3, 7], jnp.int32))
    o = np.asarray(out)
    print("interpret" if interpret else "compiled",
          "mean", o.mean(), "min", o.min(), "max", o.max())

if __name__ == "__main__":
    import sys
    if "cpu" in sys.argv:
        run(True)
    else:
        run(False)
