"""Unit tests for the run-file reader / checkpoint policy / resume
state (aspire_tpu.checkpointing) — the from-scratch round-3 redesign of
the orchestrator's resume machinery."""

import numpy as np
import pytest

from aspire_tpu.checkpointing import (
    CheckpointPolicy,
    ResumeState,
    RunFile,
    open_run_file,
)
from aspire_tpu.io import AspireFile, save_dict_to_hdf5


class TestCheckpointPolicy:
    def test_owes_respects_toggles_and_ledger(self):
        p = CheckpointPolicy(path="x.h5", config=True, flow=False)
        assert p.owes("config")
        assert not p.owes("flow")  # disabled outright
        p.settle("config")
        assert not p.owes("config")  # written once, never again

    def test_independent_ledgers(self):
        a = CheckpointPolicy(path="a.h5")
        b = CheckpointPolicy(path="b.h5")
        a.settle("flow")
        assert b.owes("flow")


class TestRunFile:
    def _write(self, path, *, config=None, sampler=None, state=False):
        with AspireFile(path, "w") as f:
            if config is not None:
                save_dict_to_hdf5(f, "aspire_config", config)
            if sampler is not None:
                save_dict_to_hdf5(f, "sampler_config", sampler)
            if state:
                f.create_group("checkpoint")

    def test_scans_groups_once(self, tmp_path):
        path = tmp_path / "run.h5"
        self._write(
            path,
            config={"dims": 3, "sampler_type": "smc"},
            sampler={"sampler_type": "smc", "foo": 1},
        )
        run = RunFile(str(path))
        assert run.config["dims"] == 3
        assert run.sampler_type == "smc"
        # standalone group merged without its sampler_type key
        assert run.sampler_config is not None
        assert "sampler_type" not in run.sampler_config
        assert not run.has_flow
        assert not run.has_checkpoint

    def test_embedded_sampler_config_wins(self, tmp_path):
        path = tmp_path / "run.h5"
        self._write(
            path,
            config={
                "dims": 2,
                "sampler_type": "smc",
                "sampler_config": {"n": 7},
            },
            sampler={"sampler_type": "importance", "n": 99},
        )
        run = RunFile(str(path))
        assert run.sampler_type == "smc"
        assert run.sampler_config["n"] == 7

    def test_recorded_n_samples_precedence(self, tmp_path):
        path = tmp_path / "run.h5"
        self._write(
            path,
            config={"dims": 2},
            sampler={"sample_calls": {"args": [512], "kwargs": {}}},
        )
        run = RunFile(str(path))
        assert run.recorded_n_samples() == 512
        # kwargs fallback
        self._write(
            path,
            config={"dims": 2},
            sampler={
                "sample_calls": {
                    "args": [],
                    "kwargs": {"n_samples": 64},
                }
            },
        )
        assert RunFile(str(path)).recorded_n_samples() == 64

    def test_recorded_n_samples_falls_back_to_population(self, tmp_path):
        path = tmp_path / "run.h5"
        self._write(path, config={"dims": 2})
        run = RunFile(str(path))

        class FakeSamples(list):
            pass

        state = {"samples": FakeSamples(range(37))}
        assert run.recorded_n_samples(state) == 37
        assert run.recorded_n_samples(None) is None

    def test_missing_checkpoint_returns_none(self, tmp_path):
        path = tmp_path / "run.h5"
        self._write(path, config={"dims": 2})
        run = RunFile(str(path))
        assert run.load_state() is None
        assert run.resume_state() is None

    def test_constructor_kwargs_reinjects_and_forwards(self, tmp_path):
        from aspire_tpu import Aspire

        path = tmp_path / "run.h5"
        self._write(
            path,
            config={
                "dims": 3,
                "log_likelihood": "mod:fn",
                "log_prior": "mod:fn",
                "sampler_type": "smc",
                "sampler_config": {"n": 1},
                "flow_kwargs": {"n_layers": 2},
                "unknown_future_key": 5,
            },
        )
        run = RunFile(str(path))
        kwargs = run.constructor_kwargs(Aspire)
        # callables stripped (must be re-supplied), derived keys dropped
        assert "log_likelihood" not in kwargs
        assert "sampler_type" not in kwargs
        assert kwargs["dims"] == 3
        # flow kwargs and unknown keys ride through to the flow ctor
        assert kwargs["n_layers"] == 2
        assert kwargs["unknown_future_key"] == 5

    def test_constructor_kwargs_requires_config(self, tmp_path):
        path = tmp_path / "run.h5"
        self._write(path, sampler={"sampler_type": "smc"})
        from aspire_tpu import Aspire

        with pytest.raises(ValueError, match="aspire config"):
            RunFile(str(path)).constructor_kwargs(Aspire)

    def test_open_run_file_missing_path(self, tmp_path):
        assert open_run_file(str(tmp_path / "nope.h5")) is None


def test_resume_state_defaults():
    rs = ResumeState(state={"iteration": 3})
    assert rs.sampler_type is None
    assert rs.sample_overrides == {}
