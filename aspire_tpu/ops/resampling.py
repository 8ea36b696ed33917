"""On-device particle resampling.

The reference resamples by dropping to host numpy and calling
``rng.choice`` (multinomial; ``samples.py:1251-1287``) — a host round-trip
per SMC iteration. Here every scheme runs on device with static shapes:

- ``systematic`` (default; lower-variance upgrade over the reference's
  multinomial, kept as the TPU-native default per BASELINE.json),
- ``multinomial`` (parity with the reference for comparison runs),
- ``stratified`` and ``residual`` for completeness.

All schemes reduce to: build an inclusion-count / index vector from the
normalized weights, then gather rows. Index construction is a cumulative
sum + ``searchsorted`` — O(n log n) on device, no host sync. Under a
sharded mesh the weights are all-gathered (they are O(n) scalars, tiny
compared to the (n, d) particle array) and the gather is a collective-aware
``jnp.take`` on the sharded particle array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalized_weights(log_w: jax.Array) -> jax.Array:
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(log_w)


def systematic_resample(
    key: jax.Array, log_w: jax.Array, n_out: int | None = None
) -> jax.Array:
    """Systematic resampling: one uniform offset, n evenly spaced points.

    Returns indices of shape ``(n_out,)`` into the particle array.
    """
    n = log_w.shape[0]
    n_out = n_out or n
    w = _normalized_weights(log_w)
    cdf = jnp.cumsum(w)
    # Guard against round-off: force the final CDF value to 1.
    cdf = cdf / cdf[-1]
    u0 = jax.random.uniform(key, ())
    pts = (u0 + jnp.arange(n_out)) / n_out
    idx = jnp.searchsorted(cdf, pts, side="left")
    return jnp.clip(idx, 0, n - 1)


def stratified_resample(
    key: jax.Array, log_w: jax.Array, n_out: int | None = None
) -> jax.Array:
    """Stratified resampling: one uniform per stratum."""
    n = log_w.shape[0]
    n_out = n_out or n
    w = _normalized_weights(log_w)
    cdf = jnp.cumsum(w)
    cdf = cdf / cdf[-1]
    u = jax.random.uniform(key, (n_out,))
    pts = (u + jnp.arange(n_out)) / n_out
    idx = jnp.searchsorted(cdf, pts, side="left")
    return jnp.clip(idx, 0, n - 1)


def multinomial_resample(
    key: jax.Array, log_w: jax.Array, n_out: int | None = None
) -> jax.Array:
    """Multinomial resampling (parity with reference samples.py:1277-1278)."""
    n = log_w.shape[0]
    n_out = n_out or n
    return jax.random.categorical(key, log_w, shape=(n_out,))


def residual_resample(
    key: jax.Array, log_w: jax.Array, n_out: int | None = None
) -> jax.Array:
    """Residual resampling: deterministic floor counts + multinomial rest.

    Implemented with static shapes: the deterministic part is expressed as a
    repeat-by-counts gather built from a cumulative sum, and the residual
    part reuses multinomial sampling on the residual weights.
    """
    n = log_w.shape[0]
    n_out = n_out or n
    w = _normalized_weights(log_w)
    counts = jnp.floor(n_out * w).astype(jnp.int32)
    n_det = jnp.sum(counts)
    # Deterministic replication: position j in the output takes particle i
    # where i is the bucket of j in the cumulative counts.
    ends = jnp.cumsum(counts)
    det_idx = jnp.searchsorted(ends, jnp.arange(n_out), side="right")
    det_idx = jnp.clip(det_idx, 0, n - 1)
    # Residual multinomial for the remaining slots.
    resid = n_out * w - counts
    resid_log_w = jnp.log(jnp.maximum(resid, 1e-38))
    mult_idx = jax.random.categorical(key, resid_log_w, shape=(n_out,))
    slot = jnp.arange(n_out)
    return jnp.where(slot < n_det, det_idx, mult_idx)


_SCHEMES = {
    "systematic": systematic_resample,
    "stratified": stratified_resample,
    "multinomial": multinomial_resample,
    "residual": residual_resample,
}


# ---------------------------------------------------------------------------
# Hand-rolled sharded resampling (SURVEY.md §5, BASELINE.md)
# ---------------------------------------------------------------------------
#
# The default path lets GSPMD lower the global gather `x[idx]` however it
# likes. This is the explicit alternative, written with shard_map so the
# collective schedule is pinned:
#
#   1. all_gather the LOG-WEIGHTS only — O(n) scalars, tiny next to the
#      (n, d) particle array;
#   2. every shard computes the identical global systematic index vector
#      (same key => same single uniform => bit-identical to the GSPMD
#      path) and slices out its own output rows;
#   3. the particle blocks stream around a ppermute RING: in S steps
#      each shard sees every block once and copies out the rows it
#      needs. Peak memory stays O(chunk * d) per device — the global
#      particle array is never materialized anywhere — and total bytes
#      moved (n * d per device around the ring) meet the all-to-all
#      redistribution lower bound.


_RING_CACHE: dict = {}


def ring_resample_matrix(key, log_w, data, mesh, axis_name: str = "data",
                         method: str = "systematic"):
    """Resample a row-sharded ``(n, cols)`` matrix on a 1-D mesh.

    ``log_w`` must carry the same ``P(axis_name)`` sharding as ``data``.
    Returns the resampled matrix with the input sharding, bit-identical
    to ``data[get_resampler(method)(key, log_w, n)]``. The jitted
    shard_map program is cached per (mesh, axis, method) so repeated
    SMC iterations hit the compile cache instead of re-tracing.
    """
    cache_key = (mesh, axis_name, method)
    cached = _RING_CACHE.get(cache_key)
    if cached is None:
        cached = _build_ring_resampler(mesh, axis_name, method)
        _RING_CACHE[cache_key] = cached
    return cached(key, log_w, data)


def _build_ring_resampler(mesh, axis_name: str, method: str):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    n_shards = mesh.devices.size
    resampler = get_resampler(method)
    ring = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def local_fn(key, lw_local, block):
        chunk = block.shape[0]
        lw_global = jax.lax.all_gather(
            lw_local, axis_name, tiled=True
        )
        idx = resampler(key, lw_global, lw_global.shape[0])
        me = jax.lax.axis_index(axis_name)
        idx_mine = jax.lax.dynamic_slice_in_dim(
            idx, me * chunk, chunk
        )

        def ring_step(r, carry):
            held, out = carry
            src = (me - r) % n_shards  # whose block we hold this step
            rows = idx_mine - src * chunk
            want = (rows >= 0) & (rows < chunk)
            picked = held[jnp.clip(rows, 0, chunk - 1)]
            out = jnp.where(want[:, None], picked, out)
            held = jax.lax.ppermute(held, axis_name, perm=ring)
            return held, out

        _, out = jax.lax.fori_loop(
            0, n_shards, ring_step, (block, jnp.zeros_like(block))
        )
        return out

    sharded = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name)),
            out_specs=P(axis_name),
            check_vma=False,
        ),
        in_shardings=(NamedSharding(mesh, P()), sharded, sharded),
        out_shardings=sharded,
    )


def get_resampler(name: str):
    try:
        return _SCHEMES[name]
    except KeyError:
        raise ValueError(
            f"Unknown resampling scheme '{name}'. "
            f"Choose from {sorted(_SCHEMES)}"
        ) from None
