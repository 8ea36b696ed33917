"""Stable special functions and reductions.

These are the scalar-reduction primitives the whole sampler stack is built
on (reference: ``utils.py:196-257`` logit/sigmoid/logsumexp and
``utils.py:510-514`` effective_sample_size). They are written to be
psum-aware: every function takes an optional ``axis_name`` so the same code
runs unsharded under ``jit`` or sharded under ``shard_map`` with the
reduction tree riding ICI collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logsumexp(log_w: jax.Array, axis_name: str | None = None) -> jax.Array:
    """Numerically stable log(sum(exp(log_w))) over all elements.

    With ``axis_name`` set (inside ``shard_map``/``pmap``), the reduction is
    completed globally with ``lax.pmax``/``lax.psum`` so each shard returns
    the full-population value.
    """
    m = jnp.max(log_w)
    if axis_name is not None:
        m = jax.lax.pmax(m, axis_name)
    # Guard: if every element is -inf the max is -inf; shift by 0 instead.
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    # minimum(., 0) is exact when m is the true (finite) max; it blocks
    # the XLA reassociation that overflowed the stepping-stone reduce
    # on 1e19-magnitude log-weights (samples.py regression). When m is
    # NOT finite the clip must be skipped: a +inf log-weight would be
    # silently masked to exp(0) instead of loudly propagating inf.
    x = log_w - m_safe
    x = jnp.where(jnp.isfinite(m), jnp.minimum(x, 0.0), x)
    s = jnp.sum(jnp.exp(x))
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return m_safe + jnp.log(s)


def effective_sample_size(
    log_w: jax.Array, axis_name: str | None = None
) -> jax.Array:
    """Kish effective sample size ``exp(2*lse(log_w) - lse(2*log_w))``.

    Parity: reference ``utils.py:510-514``.
    """
    return jnp.exp(
        2 * logsumexp(log_w, axis_name) - logsumexp(2 * log_w, axis_name)
    )


def logit(x: jax.Array, eps: float | None = None) -> jax.Array:
    """Logit with optional clamping; parity with reference utils.py:196-221."""
    if eps is not None:
        x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x) - jnp.log1p(-x)


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def log_evidence_from_log_weights(
    log_w: jax.Array, n: int | None = None, axis_name: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """Log evidence and delta-method standard error from IS log-weights.

    ``logZ = lse(log_w) - log n``;
    ``var(logZ) ~= var(w) / (n * mean(w)^2)`` with weights shifted by their
    max for stability. Parity: reference ``samples.py:457-475`` and
    ``samples.py:1226-1242``.
    """
    if n is None:
        n = log_w.shape[0]
        if axis_name is not None:
            n = n * jax.lax.axis_size(axis_name)
    log_z = logsumexp(log_w, axis_name) - jnp.log(float(n))
    m = jnp.max(log_w)
    if axis_name is not None:
        m = jax.lax.pmax(m, axis_name)
    m_finite = jnp.isfinite(m)
    m = jnp.where(m_finite, m, 0.0)
    # Clip only under a finite max — see logsumexp above.
    u = log_w - m
    u = jnp.exp(jnp.where(m_finite, jnp.minimum(u, 0.0), u))
    if axis_name is not None:
        s1 = jax.lax.psum(jnp.sum(u), axis_name)
        s2 = jax.lax.psum(jnp.sum(u**2), axis_name)
    else:
        s1 = jnp.sum(u)
        s2 = jnp.sum(u**2)
    mean_w = s1 / n
    var_w = s2 / n - mean_w**2
    var_log_z = jnp.where(
        mean_w > 0, var_w / (n * mean_w**2), jnp.nan
    )
    return log_z, jnp.sqrt(var_log_z)
