"""Continuous normalizing flow trained with conditional flow matching.

Parity with the reference's ``ZukoFlowMatching``
(flows/torch/flows.py:447-483): a velocity field trained with the
linear-path CFM MSE loss; sampling integrates the ODE noise -> data, and
``log_prob`` integrates the augmented ODE with the exact divergence
(dims are small in this problem class, so the d x d Jacobian trace is
cheap and avoids Hutchinson noise).

TPU notes: fixed-step RK4 under ``lax.scan`` (static step count, no
adaptive control flow), batched MLP evaluations on the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .base import Flow
from .bijectors import standard_normal_sample
from .nets import apply_mlp, init_mlp


class _VelocityField:
    """Architecture-like shim exposing init for the velocity MLP."""

    def __init__(self, dims: int, n_hidden, dtype):
        self.dims = dims
        self.n_hidden = list(n_hidden)
        self.dtype = dtype

    def init(self, key):
        # Input: x (dims) + time embedding (2: t, 1-t).
        return init_mlp(
            key, self.dims + 2, self.n_hidden, self.dims, dtype=self.dtype
        )


def _velocity(params, t, x):
    """v(t, x) for a batch; t scalar in [0, 1]."""
    tvec = jnp.full((x.shape[0], 1), t, dtype=x.dtype)
    feats = jnp.concatenate([x, tvec, 1.0 - tvec], axis=-1)
    return apply_mlp(params, feats)


class FlowMatching(Flow):
    """CNF proposal trained by conditional flow matching."""

    def __init__(
        self,
        dims: int,
        data_transform=None,
        key: jax.Array | int | None = None,
        dtype: str = "float32",
        n_hidden: tuple = (128, 128, 128),
        n_steps: int = 64,
        **kwargs: Any,
    ):
        self.n_steps = n_steps
        self._n_hidden = tuple(n_hidden)
        # Bypass Flow.__init__'s architecture plumbing; set up manually.
        self.dims = dims
        self.dtype = jnp.dtype(dtype)
        self._architecture_name = "flow_matching"
        self.architecture = _VelocityField(dims, n_hidden, self.dtype)
        self._architecture_kwargs = {
            "n_hidden": list(n_hidden),
            "n_steps": n_steps,
        }
        from ..transforms import IdentityTransform

        self.data_transform = data_transform or IdentityTransform(dtype=dtype)
        if key is None:
            key = jax.random.key(0)
        elif isinstance(key, int):
            key = jax.random.key(key)
        self._key = key
        self._key, init_key = jax.random.split(self._key)
        self.params = self.architecture.init(init_key)

        self._latent_log_prob = jax.jit(self._ode_forward)
        self._latent_inverse = jax.jit(self._ode_inverse)

    def config_dict(self) -> dict:
        return {
            "dims": self.dims,
            "architecture": "flow_matching",
            "dtype": str(self.dtype),
            "architecture_config": {
                "n_hidden": list(self._n_hidden),
                "n_steps": self.n_steps,
            },
        }

    # -- ODE integration ---------------------------------------------------

    def _rk4_step(self, params, t, dt, x):
        k1 = _velocity(params, t, x)
        k2 = _velocity(params, t + dt / 2, x + dt / 2 * k1)
        k3 = _velocity(params, t + dt / 2, x + dt / 2 * k2)
        k4 = _velocity(params, t + dt, x + dt * k3)
        return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    def _divergence(self, params, t, x):
        """Exact divergence of v at each row of x."""

        def v_single(xi):
            return _velocity(params, t, xi[None, :])[0]

        def div_single(xi):
            jac = jax.jacfwd(v_single)(xi)
            return jnp.trace(jac)

        return jax.vmap(div_single)(x)

    def _rk4_step_with_div(self, params, t, dt, carry):
        x, logp = carry

        def f(t, state):
            x, _ = state
            return (
                _velocity(params, t, x),
                -self._divergence(params, t, x),
            )

        k1 = f(t, (x, logp))
        k2 = f(t + dt / 2, (x + dt / 2 * k1[0], logp))
        k3 = f(t + dt / 2, (x + dt / 2 * k2[0], logp))
        k4 = f(t + dt, (x + dt * k3[0], logp))
        x_new = x + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        logp_new = logp + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        return x_new, logp_new

    def _ode_forward(self, params, x):
        """Data -> latent (t: 1 -> 0) with log-det accumulation.

        Returns (z, log_det) where log q(x) = log N(z) + log_det, matching
        the discrete-flow convention used by :class:`Flow`.
        """
        dt = -1.0 / self.n_steps

        def step(carry, i):
            t = 1.0 + i * dt
            return self._rk4_step_with_div(params, t, dt, carry), None

        (z, delta), _ = jax.lax.scan(
            step,
            (x, jnp.zeros(x.shape[0], dtype=x.dtype)),
            jnp.arange(self.n_steps),
        )
        # delta = +int_0^1 div v dt along the trajectory; the Flow
        # convention is log q(x) = log N(z) + log_det, and the
        # change-of-variables gives log q(x) = log N(z) - int_0^1 div dt.
        return z, -delta

    def _ode_inverse(self, params, z):
        """Latent -> data (t: 0 -> 1)."""
        dt = 1.0 / self.n_steps

        def step(carry, i):
            t = i * dt
            return self._rk4_step_with_div(params, t, dt, carry), None

        (x, delta), _ = jax.lax.scan(
            step,
            (z, jnp.zeros(z.shape[0], dtype=z.dtype)),
            jnp.arange(self.n_steps),
        )
        # delta = -int_0^1 div dt; Flow convention for the sampling pass is
        # log q = log N(z) - log_det with log_det = log|dx/dz| = -delta.
        return x, -delta

    # -- training ----------------------------------------------------------

    def loss_fn(self, params, batch, key):
        """Linear-path CFM loss: ||v(t, x_t) - (x1 - x0)||^2."""
        n = batch.shape[0]
        t_key, noise_key = jax.random.split(key)
        t = jax.random.uniform(t_key, (n, 1), dtype=batch.dtype)
        x0 = standard_normal_sample(noise_key, batch.shape, batch.dtype)
        x_t = (1 - t) * x0 + t * batch
        target = batch - x0
        tvec = jnp.concatenate([t, 1.0 - t], axis=-1)
        feats = jnp.concatenate([x_t, tvec], axis=-1)
        v = apply_mlp(params, feats)
        return jnp.mean(jnp.sum((v - target) ** 2, axis=-1))

