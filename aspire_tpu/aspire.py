"""Orchestrator: the user-facing ``Aspire`` facade.

Parity with the reference orchestrator (``/root/reference/src/aspire/
aspire.py:34-1152``): holds the problem definition, builds the flow and
sampler, drives fit / sample_posterior / sample_flow, and implements the
three resume modes (``resume_from_file`` aspire.py:572, primed
``sample_posterior`` call 451-465, and the ``auto_checkpoint`` context
manager 647-746 with fit-skip 239-243). Single-namespace (JAX) design:
the reference's xp/device plumbing is gone; dtype remains first-class.
"""

from __future__ import annotations

import copy
import logging
import pickle
from contextlib import contextmanager
from inspect import signature
from pathlib import Path
from typing import Any, Callable

from .flows import Flow, default_architecture_for_backend, get_flow_class
from .history import FlowHistory
from .io import AspireFile, load_dict_from_hdf5, save_dict_to_hdf5
from .samples import Samples
from .samplers import get_sampler_class as _registry_get_sampler_class
from .transforms import (
    CompositeTransform,
    FlowPreconditioningTransform,
    FlowTransform,
)
from .utils import function_id

logger = logging.getLogger("aspire_tpu")


class Aspire:
    """Accelerated sequential posterior inference via reuse, TPU-native.

    Parameters
    ----------
    log_likelihood, log_prior : Callable
        Functions of a Samples-like object (``samples.x`` is ``(n, d)``)
        returning ``(n,)`` log-densities. Jittable functions run fully on
        device; plain numpy/scipy callables are evaluated on host.
    dims : int
        Number of parameters.
    parameters : list[str], optional
        Parameter names.
    periodic_parameters : list[str], optional
        Names of periodic parameters (wrapped, zero-Jacobian).
    prior_bounds : dict[str, tuple], optional
        Per-parameter bounds; enables bounded -> unbounded transforms.
    bounded_to_unbounded : bool
        Whether to unbound bounded parameters for the flow.
    bounded_transform : str
        "logit" or "probit".
    flow : Flow, optional
        Pre-built flow (otherwise built on first ``fit``).
    flow_backend : str
        Flow architecture/backend name ("maf", "nsf", "realnvp", ...).
    flow_matching : bool
        Use a flow-matching CNF instead of a discrete flow.
    eps : float
        Clamp epsilon for bounded transforms.
    dtype : str, optional
        Global dtype for samples/flow/transforms.
    **kwargs
        Extra keyword arguments forwarded to the flow constructor.
    """

    def __init__(
        self,
        *,
        log_likelihood: Callable,
        log_prior: Callable,
        dims: int,
        parameters: list[str] | None = None,
        periodic_parameters: list[str] | None = None,
        prior_bounds: dict | None = None,
        bounded_to_unbounded: bool = True,
        bounded_transform: str = "logit",
        flow: Flow | None = None,
        flow_backend: str = "maf",
        flow_matching: bool = False,
        eps: float = 1e-6,
        dtype: Any = None,
        seed: int | None = None,
        **kwargs: Any,
    ) -> None:
        self.log_likelihood = log_likelihood
        self.log_prior = log_prior
        self.dims = dims
        self.parameters = (
            list(parameters)
            if parameters is not None
            else [f"x_{i}" for i in range(dims)]
        )
        self.periodic_parameters = periodic_parameters
        self.prior_bounds = prior_bounds
        self.bounded_to_unbounded = bounded_to_unbounded
        self.bounded_transform = bounded_transform
        self.flow_backend = flow_backend
        self.flow_matching = flow_matching
        self.flow_kwargs = kwargs
        self.eps = eps
        self.dtype = dtype
        self.seed = seed

        self._flow = flow
        self._sampler = None

    # -- properties ---------------------------------------------------------

    @property
    def flow(self) -> Flow | None:
        return self._flow

    @flow.setter
    def flow(self, flow: Flow) -> None:
        self._flow = flow

    @property
    def sampler(self):
        return self._sampler

    @property
    def n_likelihood_evaluations(self) -> int | None:
        if self._sampler is not None:
            return self._sampler.n_likelihood_evaluations
        return None

    # -- samples ------------------------------------------------------------

    def convert_to_samples(
        self,
        x,
        log_likelihood=None,
        log_prior=None,
        log_q=None,
        evaluate: bool = True,
    ) -> Samples:
        samples = Samples(
            x=x,
            parameters=self.parameters,
            log_likelihood=log_likelihood,
            log_prior=log_prior,
            log_q=log_q,
            dtype=self.dtype,
        )
        if evaluate:
            if log_prior is None:
                logger.info("Evaluating log prior")
                samples.log_prior = self.log_prior(samples)
            if log_likelihood is None:
                logger.info("Evaluating log likelihood")
                samples.log_likelihood = self.log_likelihood(samples)
            if samples.log_q is not None:
                samples.compute_weights()
        return samples

    # -- flow ---------------------------------------------------------------

    def init_flow(self) -> None:
        FlowClass = get_flow_class(
            backend=self.flow_backend, flow_matching=self.flow_matching
        )
        data_transform = FlowTransform(
            parameters=self.parameters,
            prior_bounds=self.prior_bounds,
            bounded_to_unbounded=self.bounded_to_unbounded,
            bounded_transform=self.bounded_transform,
            eps=self.eps,
            dtype=self.dtype,
        )
        flow_kwargs = dict(self.flow_kwargs)
        if FlowClass is Flow:
            flow_kwargs.setdefault(
                "architecture",
                default_architecture_for_backend(self.flow_backend),
            )
        if self.dtype is not None:
            flow_kwargs.setdefault("dtype", str(self.dtype))
        if self.seed is not None:
            flow_kwargs.setdefault("key", self.seed)
        logger.info(
            "Configuring %s with kwargs: %s", FlowClass.__name__, flow_kwargs
        )
        self._flow = FlowClass(
            dims=self.dims,
            data_transform=data_transform,
            **flow_kwargs,
        )

    def fit(
        self,
        samples: Samples,
        checkpoint_path: str | None = None,
        checkpoint_save_config: bool = True,
        overwrite: bool = False,
        **kwargs: Any,
    ) -> FlowHistory:
        """Fit the flow proposal to existing posterior samples."""
        if self.parameters is None and samples.parameters is not None:
            self.parameters = list(samples.parameters)

        if self.flow is None:
            self.init_flow()
        elif getattr(self, "_skip_flow_training", False) and not overwrite:
            logger.info(
                "Skipping flow training because a checkpointed flow was "
                "loaded."
            )
            return FlowHistory()

        x = samples.x if hasattr(samples, "x") else samples
        self.training_samples = samples
        logger.info("Training with %d samples", len(x))
        history = self.flow.fit(x, **kwargs)

        defaults = getattr(self, "_checkpoint_defaults", None)
        if checkpoint_path is None and defaults:
            checkpoint_path = defaults["path"]
            checkpoint_save_config = defaults["save_config"]
        saved_config = (
            defaults.get("saved_config", False) if defaults else False
        )
        if checkpoint_path is not None:
            with AspireFile(checkpoint_path, "a") as h5_file:
                if checkpoint_save_config and not saved_config:
                    self.save_config(h5_file, "aspire_config")
                    if defaults is not None:
                        defaults["saved_config"] = True
                if "flow" in h5_file and overwrite:
                    del h5_file["flow"]
                if "flow" not in h5_file:
                    self.save_flow(h5_file)
        return history

    def sample_flow(self, n_samples: int = 1) -> Samples:
        """Sample from the flow proposal only (reference aspire.py:891)."""
        if self.flow is None:
            self.init_flow()
        x, log_q = self.flow.sample_and_log_prob(n_samples)
        return Samples(
            x=x,
            log_q=log_q,
            parameters=self.parameters,
            dtype=self.dtype,
        )

    # -- samplers -----------------------------------------------------------

    def get_sampler_class(self, sampler_type: str) -> type:
        return _registry_get_sampler_class(sampler_type)

    def init_sampler(
        self,
        sampler_type: str,
        preconditioning: str | None = None,
        preconditioning_kwargs: dict | None = None,
        **kwargs: Any,
    ):
        """Build a sampler with its preconditioning transform.

        Preconditioning parity: reference aspire.py:330-368 — "none",
        "standard"/"default" (composite: periodic wrap + optional bounded
        + optional affine), or "flow" (transport-map preconditioning).
        """
        SamplerClass = self.get_sampler_class(sampler_type)

        if sampler_type != "importance" and preconditioning is None:
            preconditioning = "default"
        preconditioning = (
            preconditioning.lower() if preconditioning else None
        )

        if preconditioning is None or preconditioning == "none":
            transform = None
        elif preconditioning in ("standard", "default"):
            preconditioning_kwargs = dict(preconditioning_kwargs or {})
            preconditioning_kwargs.setdefault("affine_transform", False)
            preconditioning_kwargs.setdefault("bounded_to_unbounded", False)
            preconditioning_kwargs.setdefault("bounded_transform", "logit")
            transform = CompositeTransform(
                parameters=self.parameters,
                prior_bounds=self.prior_bounds,
                periodic_parameters=self.periodic_parameters,
                dtype=self.dtype,
                **preconditioning_kwargs,
            )
            if transform.is_identity:
                # No periodic/bounded/affine component is active: drop
                # the no-op so samplers keep their transform-free fast
                # paths (e.g. the single-dispatch device ladder).
                logger.debug(
                    "Default preconditioning is a no-op for this "
                    "problem; running without a transform."
                )
                transform = None
        elif preconditioning == "flow":
            # Defaults inherited from the Aspire problem spec; anything
            # the user passes in preconditioning_kwargs overrides them.
            transform_kwargs = dict(
                affine_transform=False,
                parameters=self.parameters,
                flow_backend=self.flow_backend,
                flow_kwargs=self.flow_kwargs,
                flow_matching=self.flow_matching,
                periodic_parameters=self.periodic_parameters,
                bounded_to_unbounded=self.bounded_to_unbounded,
                prior_bounds=self.prior_bounds,
                dtype=self.dtype,
            )
            transform_kwargs.update(preconditioning_kwargs or {})
            transform = FlowPreconditioningTransform(**transform_kwargs)
        else:
            raise ValueError(f"Unknown preconditioning: {preconditioning}")

        if self.seed is not None:
            # Distinct stream from the flow's key (which uses self.seed)
            # so proposal sampling and kernel randomness never collide.
            kwargs.setdefault("rng", self.seed + 1)
        return SamplerClass(
            log_likelihood=self.log_likelihood,
            log_prior=self.log_prior,
            dims=self.dims,
            prior_flow=self.flow,
            dtype=self.dtype,
            preconditioning_transform=transform,
            parameters=self.parameters,
            **kwargs,
        )

    def sample_posterior(
        self,
        n_samples: int | None = 1000,
        sampler: str = "importance",
        return_history: bool = False,
        preconditioning: str | None = None,
        preconditioning_kwargs: dict | None = None,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 1,
        checkpoint_save_config: bool = True,
        **kwargs: Any,
    ):
        """Draw posterior samples (reference aspire.py:383-570)."""
        if (
            sampler == "importance"
            and getattr(self, "_resume_sampler_type", None)
        ):
            sampler = self._resume_sampler_type

        if "resume_from" not in kwargs and hasattr(
            self, "_resume_from_default"
        ):
            kwargs["resume_from"] = self._resume_from_default
            if hasattr(self, "_resume_overrides"):
                kwargs.update(self._resume_overrides)
            if (
                hasattr(self, "_resume_n_samples")
                and self._resume_n_samples is not None
                and n_samples == 1000
            ):
                n_samples = self._resume_n_samples

        SamplerClass = self.get_sampler_class(sampler)
        # Collect ctor params across the MRO: subclasses forward through
        # *args/**kwargs, so the subclass signature alone misses base
        # params like ``mesh``/``rng`` (they would be silently dropped).
        init_params: dict = {}
        for klass in SamplerClass.__mro__:
            init = klass.__dict__.get("__init__")
            if init is not None:
                init_params.update(signature(init).parameters)
        # Arguments init_sampler supplies itself must not be routable
        # (they would arrive twice and raise TypeError).
        reserved = {
            "self",
            "args",
            "kwargs",
            "log_likelihood",
            "log_prior",
            "dims",
            "prior_flow",
            "dtype",
            "preconditioning_transform",
            "parameters",
        }
        sampler_init_kwargs = {
            k: v
            for k, v in kwargs.items()
            if k in init_params and k not in reserved
        }
        kwargs = {
            k: v for k, v in kwargs.items() if k not in sampler_init_kwargs
        }

        # Reuse the sampler (and with it every compiled program: draw,
        # mutation chains, device ladder) across sample_posterior calls
        # when the configuration is unchanged. Flow params and the
        # fitted data transform are traced ARGUMENTS of those programs,
        # so refitting the flow between calls stays correct; replacing
        # the flow object itself invalidates the cache.
        sampler_sig = (
            sampler,
            id(self.flow),
            preconditioning,
            preconditioning_kwargs,
            sampler_init_kwargs,
        )
        if (
            self._sampler is None
            or getattr(self, "_sampler_sig", None) != sampler_sig
        ):
            self._sampler = self.init_sampler(
                sampler,
                preconditioning=preconditioning,
                preconditioning_kwargs=preconditioning_kwargs,
                **sampler_init_kwargs,
            )
            self._sampler_sig = sampler_sig
        else:
            logger.debug(
                "Reusing %s sampler (compiled programs cached)", sampler
            )
            self._sampler.n_likelihood_evaluations = 0
            if self.seed is not None:
                # Fresh-sampler semantics: a fixed seed gives identical
                # runs, so re-seed the reused sampler's stream.
                from .samplers.base import _as_key

                self._sampler.key = _as_key(self.seed + 1)
        self._last_sampler_type = sampler

        defaults = getattr(self, "_checkpoint_defaults", None)
        if checkpoint_path is None and defaults:
            checkpoint_path = defaults["path"]
            checkpoint_every = defaults["every"]
            checkpoint_save_config = defaults["save_config"]
        saved_flow = defaults.get("saved_flow", False) if defaults else False
        saved_config = (
            defaults.get("saved_config", False) if defaults else False
        )
        if checkpoint_path is not None:
            sample_params = signature(self._sampler.sample).parameters
            if not {"checkpoint_file_path", "checkpoint_every"}.issubset(
                sample_params
            ):
                logger.warning(
                    "Sampler %s does not support checkpointing. Checkpoint "
                    "will not be saved.",
                    sampler,
                )
            else:
                kwargs.setdefault("checkpoint_file_path", checkpoint_path)
                kwargs.setdefault("checkpoint_every", checkpoint_every)
            with AspireFile(checkpoint_path, "a") as h5_file:
                if (
                    self.flow is not None
                    and not saved_flow
                    and "flow" not in h5_file
                ):
                    self.save_flow(h5_file)
                    saved_flow = True
                    if defaults is not None:
                        defaults["saved_flow"] = True

        # Drop kwargs the sampler's sample() signature does not accept.
        sample_params = signature(self._sampler.sample).parameters
        has_var_kw = any(
            p.kind is p.VAR_KEYWORD for p in sample_params.values()
        )
        if not has_var_kw:
            unknown = {
                k: v for k, v in kwargs.items() if k not in sample_params
            }
            if unknown:
                logger.warning(
                    "Ignoring kwargs not supported by %s.sample: %s",
                    sampler,
                    sorted(unknown),
                )
            kwargs = {k: v for k, v in kwargs.items() if k in sample_params}

        samples = self._sampler.sample(n_samples, **kwargs)
        self._last_sample_posterior_kwargs = {
            "n_samples": n_samples,
            "sampler": sampler,
            "return_history": return_history,
            "preconditioning": preconditioning,
            "preconditioning_kwargs": preconditioning_kwargs,
            "sampler_init_kwargs": sampler_init_kwargs,
            "sample_kwargs": copy.deepcopy(
                {k: v for k, v in kwargs.items() if k != "resume_from"}
            ),
        }

        if checkpoint_path is not None:
            with AspireFile(checkpoint_path, "a") as h5_file:
                if checkpoint_save_config and not saved_config:
                    self.save_config(h5_file, "aspire_config")
                    self.save_sampler_config(
                        h5_file, include_sample_calls="last"
                    )
                    if defaults is not None:
                        defaults["saved_config"] = True
                if (
                    self.flow is not None
                    and not saved_flow
                    and "flow" not in h5_file
                ):
                    self.save_flow(h5_file)
                    if defaults is not None:
                        defaults["saved_flow"] = True

        samples.parameters = self.parameters
        logger.info("Sampled %d samples from the posterior", len(samples))
        logger.info(
            "Number of likelihood evaluations: %s",
            self.n_likelihood_evaluations,
        )
        logger.info("Sample summary:\n%s", samples)
        if return_history:
            return samples, self._sampler.history
        return samples

    # -- pool ---------------------------------------------------------------

    def enable_pool(self, pool, **kwargs):
        """Parallelize a host likelihood over a multiprocessing pool."""
        from .utils import PoolHandler

        return PoolHandler(self, pool, **kwargs)

    # -- config / persistence -----------------------------------------------

    def config_dict(self, include_sampler_config: bool = False, **kwargs):
        config = {
            "log_likelihood": function_id(self.log_likelihood),
            "log_prior": function_id(self.log_prior),
            "dims": self.dims,
            "parameters": self.parameters,
            "periodic_parameters": self.periodic_parameters,
            "prior_bounds": self.prior_bounds,
            "bounded_to_unbounded": self.bounded_to_unbounded,
            "bounded_transform": self.bounded_transform,
            "flow_matching": self.flow_matching,
            "flow_backend": self.flow_backend,
            "flow_kwargs": self.flow_kwargs,
            "eps": self.eps,
            "dtype": str(self.dtype) if self.dtype else None,
        }
        if include_sampler_config:
            if hasattr(self, "_last_sampler_type"):
                config["sampler_type"] = self._last_sampler_type
            if self.sampler is None:
                raise ValueError("Sampler has not been initialized.")
            config["sampler_config"] = self.sampler.config_dict(**kwargs)
        return config

    def save_config(self, h5_file, path: str = "aspire_config", **kwargs):
        if path in h5_file:
            del h5_file[path]
        save_dict_to_hdf5(h5_file, path, self.config_dict(**kwargs))

    def save_sampler_config(
        self, h5_file, path: str = "sampler_config", **kwargs
    ):
        config = self.sampler.config_dict(**kwargs) if self.sampler else {}
        if hasattr(self, "_last_sampler_type"):
            config["sampler_type"] = self._last_sampler_type
        if path in h5_file:
            del h5_file[path]
        save_dict_to_hdf5(h5_file, path, config)

    def save_flow(self, h5_file, path: str = "flow") -> None:
        if self.flow is None:
            raise ValueError("Flow has not been initialized.")
        self.flow.save(h5_file, path=path)

    def load_flow(self, h5_file, path: str = "flow") -> None:
        FlowClass = get_flow_class(
            backend=self.flow_backend, flow_matching=self.flow_matching
        )
        self._flow = FlowClass.load(h5_file, path=path)

    def save_config_to_json(self, filename: str) -> None:
        import json

        with open(filename, "w") as f:
            json.dump(self.config_dict(), f, indent=4, default=str)

    # -- resume (three modes; reference aspire.py:572-746) --------------------

    @classmethod
    def resume_from_file(
        cls,
        file_path: str,
        *,
        log_likelihood: Callable,
        log_prior: Callable,
        sampler: str | None = None,
        checkpoint_path: str = "checkpoint",
        checkpoint_dset: str = "state",
        flow_path: str = "flow",
        config_path: str = "aspire_config",
        resume_kwargs: dict | None = None,
    ) -> "Aspire":
        """Recreate an Aspire object from a single file and prime resume."""
        (
            aspire,
            checkpoint_payload,
            checkpoint_state,
            sampler_config,
            saved_sampler_type,
            n_samples,
        ) = cls._build_aspire_from_file(
            file_path=file_path,
            log_likelihood=log_likelihood,
            log_prior=log_prior,
            checkpoint_path=checkpoint_path,
            checkpoint_dset=checkpoint_dset,
            flow_path=flow_path,
            config_path=config_path,
        )
        aspire._set_resume_defaults(
            checkpoint_payload=checkpoint_payload,
            checkpoint_state=checkpoint_state,
            sampler_config=sampler_config,
            saved_sampler_type=saved_sampler_type,
            n_samples=n_samples,
            sampler=sampler,
            resume_kwargs=resume_kwargs,
        )
        aspire._checkpoint_defaults = {
            "path": file_path,
            "every": 1,
            "save_config": False,
            "save_flow": False,
            "saved_config": False,
            "saved_flow": False,
        }
        return aspire

    @contextmanager
    def auto_checkpoint(
        self,
        path: str,
        every: int = 1,
        save_config: bool = True,
        save_flow: bool = True,
        resume: bool = False,
    ):
        """Context manager: default checkpoints + optional resume."""
        prev = getattr(self, "_checkpoint_defaults", None)
        self._checkpoint_defaults = {
            "path": str(path),
            "every": every,
            "save_config": save_config,
            "save_flow": save_flow,
            "saved_config": False,
            "saved_flow": False,
        }
        resume_attrs = [
            "_resume_from_default",
            "_resume_sampler_type",
            "_resume_n_samples",
            "_resume_overrides",
            "_resume_sampler_config",
            "_skip_flow_training",
        ]
        prev_resume_state = {
            attr: getattr(self, attr)
            for attr in resume_attrs
            if hasattr(self, attr)
        }
        path = Path(path)
        if resume and path.is_file():
            logger.info("Resuming from checkpoint file at %s", path)
            (
                checkpoint_payload,
                checkpoint_state,
                sampler_config,
                saved_sampler_type,
                n_samples,
            ) = self._load_resume_data(path)
            requested = self._resume_n_samples_from_sampler_config(
                sampler_config
            )
            if requested is not None:
                n_samples = requested
            self._load_flow_from_file(path, required=False)
            self._set_resume_defaults(
                checkpoint_payload=checkpoint_payload,
                checkpoint_state=checkpoint_state,
                sampler_config=sampler_config,
                saved_sampler_type=saved_sampler_type,
                n_samples=n_samples,
            )
            self._skip_flow_training = self.flow is not None
        try:
            yield self
        finally:
            for attr in resume_attrs:
                if attr in prev_resume_state:
                    setattr(self, attr, prev_resume_state[attr])
                elif hasattr(self, attr):
                    delattr(self, attr)
            if prev is None:
                if hasattr(self, "_checkpoint_defaults"):
                    delattr(self, "_checkpoint_defaults")
            else:
                self._checkpoint_defaults = prev

    # -- resume helpers -------------------------------------------------------

    @staticmethod
    def _load_resume_data(
        file_path,
        checkpoint_path: str = "checkpoint",
        checkpoint_dset: str = "state",
        config_path: str = "aspire_config",
        sampler_config_path: str = "sampler_config",
    ):
        import h5py

        with h5py.File(file_path, "r") as h5_file:
            config_dict = (
                load_dict_from_hdf5(h5_file, config_path)
                if config_path in h5_file
                else None
            )
            standalone_sampler_config = (
                load_dict_from_hdf5(h5_file, sampler_config_path)
                if sampler_config_path in h5_file
                else None
            )
            has_checkpoint = (
                checkpoint_path in h5_file
                and checkpoint_dset in h5_file[checkpoint_path]
            )

        sampler_config = None
        saved_sampler_type = None
        if config_dict is not None:
            saved_sampler_type = config_dict.get("sampler_type")
            sampler_config = config_dict.get("sampler_config")
        if standalone_sampler_config is not None:
            saved_sampler_type = (
                saved_sampler_type
                or standalone_sampler_config.get("sampler_type")
            )
            if sampler_config is None:
                sampler_config = dict(standalone_sampler_config)
                sampler_config.pop("sampler_type", None)

        # Full state load reassembles the shard-wise particle arrays
        # (aspire_tpu.io.load_sharded_array); resume then proceeds in
        # dict mode, so the arrays are never re-pickled.
        n_samples = None
        checkpoint_state = None
        if has_checkpoint:
            try:
                from .samplers.base import Sampler

                checkpoint_state = Sampler.load_checkpoint_from_file(
                    file_path, path=checkpoint_path
                )
                saved = checkpoint_state.get("samples")
                if saved is not None:
                    n_samples = len(saved)
            except Exception:
                logger.warning(
                    "Failed to decode checkpoint; proceeding without "
                    "resume state."
                )
        else:
            logger.warning(
                "Checkpoint not found at %s/%s in %s; will resume "
                "without a checkpoint.",
                checkpoint_path,
                checkpoint_dset,
                file_path,
            )
        return (
            checkpoint_state,
            checkpoint_state,
            sampler_config,
            saved_sampler_type,
            n_samples,
        )

    def _set_resume_defaults(
        self,
        *,
        checkpoint_payload,
        checkpoint_state,
        sampler_config,
        saved_sampler_type,
        n_samples,
        sampler: str | None = None,
        resume_kwargs: dict | None = None,
    ) -> None:
        if checkpoint_payload is None:
            return
        sampler_config = sampler_config or {}
        sampler_config.pop("sampler_class", None)
        self._resume_from_default = checkpoint_payload
        self._resume_sampler_type = (
            sampler
            or saved_sampler_type
            or (checkpoint_state.get("sampler") if checkpoint_state else None)
        )
        self._resume_n_samples = n_samples
        self._resume_overrides = resume_kwargs or {}
        self._resume_sampler_config = sampler_config

    @staticmethod
    def _resume_n_samples_from_sampler_config(sampler_config) -> int | None:
        if not isinstance(sampler_config, dict):
            return None
        sample_calls = sampler_config.get("sample_calls")
        if not isinstance(sample_calls, dict):
            return None
        sample_args = sample_calls.get("args")
        if hasattr(sample_args, "__len__") and not isinstance(
            sample_args, (str, bytes, dict)
        ):
            if len(sample_args) == 0:
                sample_args = None
        else:
            sample_args = None
        if sample_args is not None:
            try:
                return int(sample_args[0])
            except (TypeError, ValueError):
                return None
        sample_kwargs = sample_calls.get("kwargs")
        if isinstance(sample_kwargs, dict) and "n_samples" in sample_kwargs:
            try:
                return int(sample_kwargs["n_samples"])
            except (TypeError, ValueError):
                return None
        return None

    def _load_flow_from_file(
        self, file_path, flow_path: str = "flow", required: bool = True
    ) -> bool:
        import h5py

        with h5py.File(file_path, "r") as h5_file:
            if flow_path in h5_file:
                logger.info(
                    "Loading flow from %s in %s", flow_path, file_path
                )
                self.load_flow(h5_file, path=flow_path)
                return True
        if required:
            raise ValueError(
                f"Flow path '{flow_path}' not found in {file_path}"
            )
        logger.warning(
            "Flow not found at %s in %s; continuing without loading a "
            "flow.",
            flow_path,
            file_path,
        )
        return False

    @classmethod
    def _build_aspire_from_file(
        cls,
        file_path: str,
        log_likelihood: Callable,
        log_prior: Callable,
        checkpoint_path: str,
        checkpoint_dset: str,
        flow_path: str,
        config_path: str,
    ):
        import h5py

        with h5py.File(file_path, "r") as h5_file:
            if config_path not in h5_file:
                raise ValueError(
                    f"Config path '{config_path}' not found in {file_path}"
                )
            config_dict = load_dict_from_hdf5(h5_file, config_path)

        (
            checkpoint_payload,
            checkpoint_state,
            sampler_config,
            saved_sampler_type,
            n_samples,
        ) = cls._load_resume_data(
            file_path,
            checkpoint_path=checkpoint_path,
            checkpoint_dset=checkpoint_dset,
            config_path=config_path,
        )

        config_dict.pop("sampler_config", None)
        config_dict.pop("sampler_type", None)
        flow_kwargs = config_dict.pop("flow_kwargs", None) or {}
        config_dict.pop("log_likelihood", None)
        config_dict.pop("log_prior", None)
        config_dict["log_likelihood"] = log_likelihood
        config_dict["log_prior"] = log_prior
        known = set(signature(cls.__init__).parameters)
        extra = {
            k: v for k, v in config_dict.items() if k not in known
        }
        config_dict = {
            k: v for k, v in config_dict.items() if k in known
        }
        config_dict.update(flow_kwargs)
        config_dict.update(extra)
        aspire = cls(**config_dict)

        aspire._load_flow_from_file(
            file_path, flow_path=flow_path, required=True
        )

        requested = cls._resume_n_samples_from_sampler_config(sampler_config)
        if requested is not None:
            n_samples = requested

        return (
            aspire,
            checkpoint_payload,
            checkpoint_state,
            sampler_config,
            saved_sampler_type,
            n_samples,
        )
