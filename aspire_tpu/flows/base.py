"""Flow wrapper: architecture + data transform + training + persistence.

Parity with the reference's ``Flow`` ABC (flows/base.py:11-98) and its
backend wrappers (``FlowJax`` flows/jax/flows.py:17-328, ``ZukoFlow``
flows/torch/flows.py:113-444), re-designed for one native JAX backend:
the architecture is a pure functional core (:mod:`.architectures`), the
wrapper owns the parameter pytree, the fitted data transform, and jitted
density/sampling entry points. ``log_prob``/``sample`` compose the data
transform's log-Jacobians exactly as the reference does
(flows/jax/flows.py:106-217).
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp

from ..transforms import BaseTransform, IdentityTransform
from ..utils import asarray
from .architectures import Architecture, get_architecture
from .bijectors import standard_normal_log_prob, standard_normal_sample
from .train import TrainConfig, fit_flow

logger = logging.getLogger("aspire_tpu")


class Flow:
    """A trainable normalizing-flow proposal.

    Parameters
    ----------
    dims : int
        Number of dimensions.
    architecture : str | Architecture
        Flow architecture name ("maf", "nsf", "realnvp", "maf-rqs") or an
        :class:`Architecture` instance.
    data_transform : BaseTransform, optional
        Invertible preprocessing fit to the training data (bounded ->
        unbounded, whitening); identity if omitted.
    key : jax.Array | int, optional
        PRNG key (or seed) for parameter init and sampling.
    dtype : str, optional
        Parameter/sample dtype (default float32).
    **architecture_kwargs
        Forwarded to the architecture constructor (n_layers, n_hidden,
        num_bins, ...).
    """

    def __init__(
        self,
        dims: int,
        architecture: str | Architecture = "maf",
        data_transform: BaseTransform | None = None,
        key: jax.Array | int | None = None,
        dtype: str = "float32",
        **architecture_kwargs: Any,
    ):
        self.dims = dims
        self.dtype = jnp.dtype(dtype)
        if isinstance(architecture, Architecture):
            self.architecture = architecture
            self._architecture_name = type(architecture).__name__.lower()
        else:
            self._architecture_name = architecture
            self.architecture = get_architecture(
                architecture, dims, dtype=str(dtype), **architecture_kwargs
            )
        self._architecture_kwargs = dict(architecture_kwargs)
        self.data_transform = data_transform or IdentityTransform(dtype=dtype)
        if key is None:
            key = jax.random.key(0)
        elif isinstance(key, int):
            key = jax.random.key(key)
        self._key = key
        self._key, init_key = jax.random.split(self._key)
        self.params = self.architecture.init(init_key)

        arch = self.architecture
        self._latent_log_prob = jax.jit(
            lambda params, x: arch.forward(params, x)
        )
        self._latent_inverse = jax.jit(
            lambda params, z: arch.inverse(params, z)
        )

    # -- config ------------------------------------------------------------

    def config_dict(self) -> dict:
        import dataclasses

        return {
            "dims": self.dims,
            "architecture": self._architecture_name,
            "dtype": str(self.dtype),
            "architecture_config": dataclasses.asdict(self.architecture),
        }

    def next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def reinitialize(self, key: jax.Array | int | None = None) -> None:
        """Fresh parameter draw from the init distribution, in place.

        Keeps the flow OBJECT alive: params are traced arguments of
        every compiled sampler program, so re-initializing in place
        (unlike replacing the flow) triggers no recompiles. Used by
        ``Aspire.replicated_evidence``'s flow-refit cycles, where each
        replicate needs an independent fit seed.
        """
        if key is None:
            key = self.next_key()
        elif isinstance(key, int):
            key = jax.random.key(key)
        self._key, init_key = jax.random.split(key)
        self.params = self.architecture.init(init_key)

    # -- densities ---------------------------------------------------------

    def log_prob(self, x) -> jax.Array:
        """log q(x), composing the data-transform Jacobian."""
        x = asarray(x, dtype=self.dtype)
        x_t, log_j_data = self.data_transform.forward(x)
        z, log_det = self._latent_log_prob(self.params, x_t)
        return standard_normal_log_prob(z) + log_det + log_j_data

    def forward(self, x) -> tuple[jax.Array, jax.Array]:
        """Data space -> latent z, with total log|J|."""
        x = asarray(x, dtype=self.dtype)
        x_t, log_j_data = self.data_transform.forward(x)
        z, log_det = self._latent_log_prob(self.params, x_t)
        return z, log_det + log_j_data

    def inverse(self, z) -> tuple[jax.Array, jax.Array]:
        """Latent z -> data space, with total log|J|."""
        z = asarray(z, dtype=self.dtype)
        x_t, log_det = self._latent_inverse(self.params, z)
        x, log_j_data = self.data_transform.inverse(x_t)
        return x, log_det + log_j_data

    def sample(self, n: int, key: jax.Array | None = None) -> jax.Array:
        return self.sample_and_log_prob(n, key=key)[0]

    def sample_and_log_prob(
        self, n: int, key: jax.Array | None = None
    ) -> tuple[jax.Array, jax.Array]:
        if key is None:
            key = self.next_key()
        z = standard_normal_sample(key, (n, self.dims), dtype=self.dtype)
        x_t, log_det = self._latent_inverse(self.params, z)
        log_q = standard_normal_log_prob(z) - log_det
        x, log_j_data = self.data_transform.inverse(x_t)
        log_q = log_q - log_j_data
        return x, log_q

    # -- training ----------------------------------------------------------

    def loss_fn(self, params, batch, key):
        """Mean negative log-likelihood in the transformed space."""
        del key
        z, log_det = self.architecture.forward(params, batch)
        return -jnp.mean(standard_normal_log_prob(z) + log_det)

    def fit(self, x, key: jax.Array | None = None, sharding=None, **kwargs):
        """Fit the data transform, then train by MLE.

        Accepts the reference trainer's knobs (n_epochs, batch_size, lr,
        patience, ...; flows/torch/flows.py:170-325).
        """
        x = asarray(x, dtype=self.dtype)
        x_t = self.data_transform.fit(x)
        # Reference trainer spellings (flows/torch/flows.py:170-180)
        # map onto TrainConfig fields so migrating fit() calls keep
        # their knobs live.
        aliases = {
            "lr": "learning_rate",
            "clip_grad": "max_grad_norm",
            "lr_annealing": "annealing",
        }
        for old, new in aliases.items():
            if old in kwargs:
                if new in kwargs and kwargs[new] != kwargs[old]:
                    raise ValueError(
                        f"Conflicting fit kwargs: {old}={kwargs[old]!r} "
                        f"and {new}={kwargs[new]!r}"
                    )
                value = kwargs.pop(old)
                # The reference spells "no clipping" as clip_grad=None;
                # TrainConfig's max_grad_norm is always a float, so
                # drop the alias entirely and keep the default.
                if value is not None:
                    kwargs[new] = value
        if kwargs.get("patience", 0) is None:
            # Reference: patience=None disables early stopping; the
            # trainer's patience is an int, so "off" = the epoch count.
            kwargs["patience"] = int(
                kwargs.get(
                    "n_epochs",
                    TrainConfig.__dataclass_fields__["n_epochs"].default,
                )
            )
        config = TrainConfig(
            **{
                k: v
                for k, v in kwargs.items()
                if k in TrainConfig.__dataclass_fields__
            }
        )
        unknown = set(kwargs) - set(TrainConfig.__dataclass_fields__)
        if unknown:
            logger.warning("Ignoring unknown fit kwargs: %s", sorted(unknown))
        if key is None:
            key = self.next_key()
        self.params, history = fit_flow(
            self.loss_fn, self.params, x_t, key, config, sharding=sharding
        )
        return history

    # -- persistence -------------------------------------------------------

    def save(self, h5_file, path: str = "flow") -> None:
        from ..io import save_dict_to_hdf5, save_pytree_to_hdf5

        if path in h5_file:
            del h5_file[path]
        grp = h5_file.create_group(path)
        grp.attrs["class"] = type(self).__name__
        save_dict_to_hdf5(grp, "config", self.config_dict())
        save_pytree_to_hdf5(grp, "params", self.params)
        try:
            self.data_transform.save(grp, "data_transform")
        except NotImplementedError:
            logger.warning(
                "Data transform does not support saving; skipping"
            )

    @classmethod
    def load(cls, h5_file, path: str = "flow") -> "Flow":
        from ..io import load_dict_from_hdf5, load_pytree_from_hdf5

        grp = h5_file[path]
        config = load_dict_from_hdf5(grp, "config")
        arch_config = config.pop("architecture_config", {})
        arch_config.pop("dims", None)
        arch_config.pop("dtype", None)
        if isinstance(arch_config.get("n_hidden"), list):
            arch_config["n_hidden"] = tuple(arch_config["n_hidden"])
        data_transform = None
        if "data_transform" in grp:
            data_transform = BaseTransform.load(grp, "data_transform")
        flow = cls(
            dims=config["dims"],
            architecture=config["architecture"],
            data_transform=data_transform,
            dtype=config["dtype"],
            **arch_config,
        )
        flow.params = load_pytree_from_hdf5(grp, "params", flow.params)
        return flow
