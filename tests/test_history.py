"""History tests (model: reference tests/test_history.py)."""

import h5py
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from aspire_tpu.history import FlowHistory, SMCHistory
from aspire_tpu.samples import SMCSamples


@pytest.fixture
def smc_history(rng):
    h = SMCHistory(
        beta=[0.1, 0.5, 1.0],
        ess=[90.0, 80.0, 70.0],
        ess_target=[50.0, 50.0, 50.0],
        eff_target=[0.5, 0.5, 0.5],
        log_norm_ratio=[-1.0, -0.5, -0.2],
        log_norm_ratio_var=[0.01, 0.02, 0.03],
        mcmc_acceptance=[0.3, 0.25, 0.22],
    )
    for beta in h.beta:
        n = 20
        h.sample_history.append(
            SMCSamples(
                x=rng.normal(size=(n, 2)),
                log_likelihood=rng.normal(size=n),
                log_prior=rng.normal(size=n),
                log_q=rng.normal(size=n),
                beta=beta,
            ).to_numpy()
        )
    return h


class TestFlowHistory:
    def test_roundtrip(self, tmp_path):
        h = FlowHistory(
            training_loss=[3.0, 2.0, 1.0], validation_loss=[3.1, 2.1, 1.1]
        )
        with h5py.File(tmp_path / "h.h5", "w") as f:
            h.save(f)
        with h5py.File(tmp_path / "h.h5", "r") as f:
            h2 = FlowHistory.load(f)
        assert h2.training_loss == h.training_loss
        assert h2.validation_loss == h.validation_loss

    def test_plot_loss(self):
        h = FlowHistory(training_loss=[2.0, 1.0], validation_loss=[2.1, 1.1])
        fig = h.plot_loss()
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestSMCHistory:
    def test_roundtrip_with_sample_history(self, smc_history, tmp_path):
        with h5py.File(tmp_path / "h.h5", "w") as f:
            smc_history.save(f)
        with h5py.File(tmp_path / "h.h5", "r") as f:
            h2 = SMCHistory.load(f)
        assert h2.beta == smc_history.beta
        assert h2.log_norm_ratio == smc_history.log_norm_ratio
        assert len(h2.sample_history) == 3
        np.testing.assert_allclose(
            np.asarray(h2.sample_history[0].x),
            np.asarray(smc_history.sample_history[0].x),
        )
        assert h2.sample_history[1].beta == 0.5

    @pytest.mark.parametrize(
        "method",
        [
            "plot_beta",
            "plot_log_norm_ratio",
            "plot_ess",
            "plot_ess_target",
            "plot_eff_target",
            "plot_mcmc_acceptance",
            "plot_mcmc_autocorr",
            "plot_lineage_fraction",
        ],
    )
    def test_single_plots(self, smc_history, method):
        import matplotlib.pyplot as plt

        fig = getattr(smc_history, method)()
        assert fig is not None
        plt.close(fig)

    def test_combined_plot(self, smc_history):
        import matplotlib.pyplot as plt

        fig = smc_history.plot()
        assert len(fig.axes) == 6
        plt.close(fig)

    @pytest.mark.parametrize("x_axis", ["log_p_t", "log_likelihood"])
    def test_plot_sample_history(self, smc_history, x_axis):
        import matplotlib.pyplot as plt

        fig = smc_history.plot_sample_history(x_axis=x_axis)
        assert fig is not None
        plt.close(fig)

    def test_plot_sample_history_bad_axis(self, smc_history):
        with pytest.raises(ValueError, match="Unsupported x_axis"):
            smc_history.plot_sample_history(x_axis="nope")

    def test_plot_quantile_bands(self, smc_history):
        import matplotlib.pyplot as plt

        fig = smc_history.plot_quantile_bands()
        assert fig is not None
        plt.close(fig)

    def test_plot_quantile_bands_bad_interval(self, smc_history):
        with pytest.raises(ValueError, match="quantile_interval"):
            smc_history.plot_quantile_bands(quantile_interval=(0.6, 0.9))

    def test_empty_sample_history_raises(self):
        h = SMCHistory()
        with pytest.raises(ValueError, match="No sample history"):
            h.plot_sample_history()


class TestPlotComparison:
    def test_plot_comparison(self, rng):
        import matplotlib.pyplot as plt

        from aspire_tpu.plot import plot_comparison
        from aspire_tpu.samples import Samples

        s1 = Samples(
            rng.normal(size=(200, 2)),
            log_likelihood=rng.normal(size=200),
            log_prior=np.zeros(200),
            log_q=np.zeros(200),
        )
        s2 = Samples(rng.normal(1.0, 1.0, size=(200, 2)))
        fig = plot_comparison(
            s1,
            s2,
            labels=["a", "b"],
            per_samples_kwargs=[
                {"include_weights": True},
                {"color": "C5"},
            ],
        )
        assert fig is not None
        plt.close(fig)

    def test_kwargs_length_mismatch(self, rng):
        from aspire_tpu.plot import plot_comparison
        from aspire_tpu.samples import Samples

        s = Samples(rng.normal(size=(50, 2)))
        with pytest.raises(ValueError, match="same length"):
            plot_comparison(s, per_samples_kwargs=[{}, {}])

    def test_history_comparison(self, rng):
        import matplotlib.pyplot as plt

        from aspire_tpu.history import SMCHistory
        from aspire_tpu.plot import plot_history_comparison

        h1 = SMCHistory(beta=[0.5, 1.0], ess=[10, 9], ess_target=[5, 5],
                        eff_target=[0.5, 0.5], log_norm_ratio=[-1, -0.5],
                        log_norm_ratio_var=[0.1, 0.1],
                        mcmc_acceptance=[0.3, 0.2])
        h2 = SMCHistory(beta=[0.6, 1.0], ess=[11, 8], ess_target=[5, 5],
                        eff_target=[0.5, 0.5], log_norm_ratio=[-1, -0.4],
                        log_norm_ratio_var=[0.1, 0.1],
                        mcmc_acceptance=[0.4, 0.3])
        fig = plot_history_comparison(h1, h2)
        assert fig is not None
        plt.close(fig)

    def test_history_comparison_type_mismatch(self):
        from aspire_tpu.history import FlowHistory, SMCHistory
        from aspire_tpu.plot import plot_history_comparison

        with pytest.raises(ValueError, match="same type"):
            plot_history_comparison(SMCHistory(), FlowHistory())
