"""Minimal repro hunt for the XLA:CPU compile SIGSEGV (exit 139).

Context (tests/run_suite.sh): a single pytest process over the whole
suite intermittently SIGSEGVs on this host after several hundred
XLA:CPU compiles accumulate — always late in the suite, never in
per-file runs. Round-4 crash stacks bottomed out in
``backend_compile_and_load`` (and, with a persistent compilation cache
enabled, ``put_executable_and_time`` — the cache has been removed
since). This script isolates "many distinct compiles in one process"
from everything else the suite does: it compiles ``--n`` DISTINCT
jitted programs (unique constants defeat the in-memory executable
cache) in the suite's three dominant shapes — plain elementwise jits,
``lax.scan`` chains, and 8-virtual-device shard_map collectives — and
exits 0 if the process survives.

Usage:
    python benchmarks/dev/xla_cpu_sigsegv_repro.py [--n 1200] [--mix all]

Exit 139 here = the crash is a jaxlib/XLA:CPU bug reproducible without
this repo's code; exit 0 across several seeds = the suite's specific
compilation pattern (or its allocation history) is a necessary
ingredient, and the per-file runner remains the documented workaround
either way.

Result on this host (2026-08-19, jax 0.9.0): survives repeated
1200-compile runs of every mix (3x slower than the suite's compile
count) — the standalone loop does NOT reproduce the crash, so the
trigger includes suite-specific state (allocation history / fixture
churn), not compile count alone. Recorded in tests/run_suite.sh.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1200)
    parser.add_argument(
        "--mix", default="all", choices=["plain", "scan", "collective", "all"]
    )
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    x = jnp.arange(64.0).reshape(8, 8)

    def compile_plain(i: int) -> None:
        c = float(i) + 0.5

        @jax.jit
        def f(x):
            return jnp.sin(x * c) + jnp.log1p(jnp.abs(x) + c)

        f(x).block_until_ready()

    def compile_scan(i: int) -> None:
        c = float(i) + 0.25

        @jax.jit
        def f(x):
            def body(carry, _):
                return carry * 0.99 + jnp.tanh(carry + c), None

            out, _ = jax.lax.scan(body, x, None, length=7)
            return out

        f(x).block_until_ready()

    def compile_collective(i: int) -> None:
        c = float(i) + 0.125

        @jax.jit
        def f(x):
            def inner(xs):
                return xs + c * jax.lax.psum(jnp.sum(xs), "data")

            return jax.shard_map(
                inner, mesh=mesh, in_specs=P("data"), out_specs=P("data")
            )(x)

        f(x).block_until_ready()

    fns = {
        "plain": [compile_plain],
        "scan": [compile_scan],
        "collective": [compile_collective],
        "all": [compile_plain, compile_scan, compile_collective],
    }[args.mix]

    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        fns[int(rng.integers(len(fns)))](i + args.seed * 1_000_000)
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{args.n} distinct compiles OK", flush=True)
    print("survived: no SIGSEGV after", args.n, "distinct compiles")
    sys.exit(0)


if __name__ == "__main__":
    main()
