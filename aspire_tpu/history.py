"""Training and sampling diagnostics histories.

Parity with reference ``history.py``: :class:`FlowHistory` (train/val loss
+ plot, history.py:52-68), :class:`SMCHistory` (per-iteration beta, ESS,
targets, log-evidence ratios, MCMC acceptance/autocorr, full per-iteration
sample history; HDF5 round-trip 83-149; plotting suite 151-427).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

import numpy as np


@dataclass
class History:
    """Base class: dict-shaped HDF5 round-trip."""

    def save(self, h5_file, path: str = "history"):
        from .io import save_dict_to_hdf5

        dictionary = copy.deepcopy(self.__dict__)
        save_dict_to_hdf5(h5_file, path, dictionary)

    @classmethod
    def load(cls, h5_file, path: str = "history"):
        from .io import load_dict_from_hdf5

        dictionary = load_dict_from_hdf5(h5_file, path)
        return cls._from_dict(dictionary)

    @classmethod
    def _from_dict(cls, dictionary: dict):
        field_names = set(cls.__dataclass_fields__)
        init_kwargs = {
            k: _to_list(v)
            for k, v in dictionary.items()
            if k in field_names
        }
        instance = cls(**init_kwargs)
        for k, v in dictionary.items():
            if k not in field_names:
                setattr(instance, k, v)
        return instance


def _to_list(value):
    if isinstance(value, np.ndarray):
        return value.tolist()
    return value


@dataclass
class FlowHistory(History):
    training_loss: list = field(default_factory=list)
    validation_loss: list = field(default_factory=list)

    def plot_loss(self):
        import matplotlib.pyplot as plt

        fig = plt.figure()
        plt.plot(self.training_loss, label="Training loss")
        plt.plot(self.validation_loss, label="Validation loss")
        plt.legend()
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        return fig

    def save(self, h5_file, path: str = "flow_history"):
        super().save(h5_file, path=path)

    @classmethod
    def load(cls, h5_file, path: str = "flow_history"):
        return super().load(h5_file, path=path)


@dataclass
class SMCHistory(History):
    log_norm_ratio: list = field(default_factory=list)
    log_norm_ratio_var: list = field(default_factory=list)
    beta: list = field(default_factory=list)
    ess: list = field(default_factory=list)
    ess_target: list = field(default_factory=list)
    eff_target: list = field(default_factory=list)
    mcmc_autocorr: list = field(default_factory=list)
    mcmc_acceptance: list = field(default_factory=list)
    sample_history: list = field(default_factory=list)

    # -- persistence -------------------------------------------------------

    def save(self, h5_file, path: str = "smc_history"):
        from .io import save_dict_to_hdf5

        exclude = {"sample_history"}
        dictionary = {
            k: copy.deepcopy(v)
            for k, v in self.__dict__.items()
            if k not in exclude
        }
        dictionary["__len_sample_history"] = len(self.sample_history)
        save_dict_to_hdf5(h5_file, path, dictionary)
        for i, samples in enumerate(self.sample_history):
            samples.save(h5_file, path=f"{path}__sample_history/{i}")

    @classmethod
    def load(cls, h5_file, path: str = "smc_history"):
        from .io import load_dict_from_hdf5
        from .samples import SMCSamples

        dictionary = load_dict_from_hdf5(h5_file, path)
        n = int(dictionary.pop("__len_sample_history", 0))
        dictionary["sample_history"] = [
            SMCSamples.load(h5_file, path=f"{path}__sample_history/{i}")
            for i in range(n)
        ]
        return cls._from_dict(dictionary)

    # -- plots -------------------------------------------------------------

    def _plot_series(self, values, ylabel, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots()
        else:
            fig = None
        ax.plot(values)
        ax.set_xlabel("Iteration")
        ax.set_ylabel(ylabel)
        return fig

    def plot_beta(self, ax=None):
        return self._plot_series(self.beta, r"$\beta$", ax)

    def plot_log_norm_ratio(self, ax=None):
        return self._plot_series(
            self.log_norm_ratio, "Log evidence ratio", ax
        )

    def plot_ess(self, ax=None):
        return self._plot_series(self.ess, "ESS", ax)

    def plot_ess_target(self, ax=None):
        return self._plot_series(self.ess_target, "ESS target", ax)

    def plot_eff_target(self, ax=None):
        return self._plot_series(self.eff_target, "Efficiency target", ax)

    def plot_mcmc_acceptance(self, ax=None):
        return self._plot_series(self.mcmc_acceptance, "MCMC Acceptance", ax)

    def plot_mcmc_autocorr(self, ax=None):
        return self._plot_series(self.mcmc_autocorr, "MCMC Autocorr", ax)

    def plot(self, fig=None):
        import matplotlib.pyplot as plt

        methods = [
            self.plot_beta,
            self.plot_log_norm_ratio,
            self.plot_ess,
            self.plot_ess_target,
            self.plot_eff_target,
            self.plot_mcmc_acceptance,
        ]
        if fig is None:
            fig, axs = plt.subplots(
                len(methods), 1, sharex=True, figsize=(6, 2 * len(methods))
            )
        else:
            axs = fig.axes
        for method, ax in zip(methods, axs):
            method(ax)
        for ax in axs[:-1]:
            ax.set_xlabel("")
        return fig

    def plot_sample_history(
        self,
        n_samples=None,
        parameters=None,
        ax=None,
        cmap: str = "viridis",
        scatter_kwargs=None,
        x_axis: str = "log_p_t",
        iterations: list[int] | None = None,
    ):
        """Scatter of per-iteration samples vs log_p_t / log_likelihood.

        Parity: reference history.py:244-346.
        """
        import matplotlib.pyplot as plt

        if x_axis not in {"log_p_t", "log_likelihood"}:
            raise ValueError(
                f"Unsupported x_axis '{x_axis}'. Expected 'log_p_t' or "
                "'log_likelihood'."
            )
        if not self.sample_history:
            raise ValueError("No sample history available to plot.")
        n_parameters = (
            len(parameters)
            if parameters is not None
            else self.sample_history[0].dims
        )
        if ax is None:
            fig, ax = plt.subplots(
                n_parameters, 1, sharex=True, figsize=(6, 2 * n_parameters)
            )
            ax = np.atleast_1d(ax)
        else:
            fig = None
            ax = np.atleast_1d(ax)

        colormap = plt.get_cmap(cmap)
        if iterations is None:
            iterations = list(range(len(self.sample_history)))
        colors = colormap(np.linspace(0, 1, len(iterations)))

        has_log_pt = all(
            getattr(s, "beta", None) is not None
            and s.log_likelihood is not None
            and s.log_prior is not None
            and s.log_q is not None
            for s in self.sample_history
        )
        has_logl = all(
            s.log_likelihood is not None for s in self.sample_history
        )
        scatter_kwargs = {"s": 10, **(scatter_kwargs or {})}

        samples = None
        for it, color in zip(iterations, colors):
            samples = self.sample_history[it].to_numpy()
            if n_samples is not None:
                samples = samples[:n_samples]
            if parameters is not None:
                idx = [samples.parameters.index(p) for p in parameters]
                x = np.asarray(samples.x)[:, idx]
            else:
                x = np.asarray(samples.x)
            if x_axis == "log_p_t" and has_log_pt:
                x_values = np.asarray(samples.log_p_t(samples.beta))
            elif x_axis == "log_likelihood" and has_logl:
                x_values = np.asarray(samples.log_likelihood)
            else:
                x_values = it * np.ones(len(x))
            for i in range(x.shape[1]):
                ax[i].scatter(x_values, x[:, i], color=color, **scatter_kwargs)

        labels = parameters or samples.parameters
        for i, p in enumerate(labels):
            ax[i].set_ylabel(p)
        if x_axis == "log_p_t" and has_log_pt:
            ax[-1].set_xlabel("log p_t(beta)")
        elif x_axis == "log_likelihood" and has_logl:
            ax[-1].set_xlabel("log likelihood")
        else:
            ax[-1].set_xlabel("Iteration")
        return fig

    def plot_quantile_bands(
        self,
        parameters: list[str] | None = None,
        quantile_interval: tuple[float, float] = (0.1, 0.9),
        ax=None,
        line_kwargs=None,
        band_kwargs=None,
    ):
        """Per-parameter quantile bands vs iteration (reference :348-427)."""
        import matplotlib.pyplot as plt

        if not self.sample_history:
            raise ValueError("No sample history available to plot.")
        q_low, q_high = quantile_interval
        if not (0.0 <= q_low < 0.5 < q_high <= 1.0):
            raise ValueError(
                "quantile_interval must satisfy 0 <= low < 0.5 < high <= 1."
            )
        first = self.sample_history[0]
        all_parameters = first.parameters or [
            f"x_{i}" for i in range(first.dims)
        ]
        if parameters is None:
            parameters = all_parameters
        indices = [all_parameters.index(p) for p in parameters]
        n_params = len(indices)

        if ax is None:
            fig, axs = plt.subplots(
                n_params, 1, sharex=True, figsize=(6, 2 * n_params)
            )
            axs = np.atleast_1d(axs)
        else:
            fig = None
            axs = np.atleast_1d(ax)
            if len(axs) != n_params:
                raise ValueError(
                    "Number of axes must match number of requested "
                    "parameters."
                )

        line_kwargs = {"color": "C0", "lw": 1.5, **(line_kwargs or {})}
        band_kwargs = {"color": "C0", "alpha": 0.2, **(band_kwargs or {})}

        iters = np.arange(len(self.sample_history))
        quantiles = np.empty((3, len(self.sample_history), n_params))
        for it, samples in enumerate(self.sample_history):
            x_np = np.asarray(samples.to_numpy().x)
            for j, idx in enumerate(indices):
                quantiles[:, it, j] = np.quantile(
                    x_np[:, idx], [q_low, 0.5, q_high]
                )

        for j, (axis, param) in enumerate(zip(axs, parameters)):
            axis.plot(iters, quantiles[1, :, j], **line_kwargs)
            axis.fill_between(
                iters, quantiles[0, :, j], quantiles[2, :, j], **band_kwargs
            )
            axis.set_ylabel(param)
        axs[-1].set_xlabel("Iteration")
        return fig
