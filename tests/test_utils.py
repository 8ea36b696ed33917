"""Utils tests (model: reference tests/test_utils.py)."""

import logging
import math
import operator

import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.utils import (
    CallHistory,
    PoolHandler,
    configure_logger,
    function_id,
    resolve_dtype,
    split_kwargs_by_signature,
    to_numpy,
    track_calls,
)


class TestDtype:
    def test_resolve_none(self):
        assert resolve_dtype(None) is None

    @pytest.mark.parametrize("spec", ["float32", "float64", np.float32])
    def test_resolve(self, spec):
        assert resolve_dtype(spec) == jnp.dtype(spec)

    def test_to_numpy(self):
        x = jnp.ones(3)
        out = to_numpy(x)
        assert isinstance(out, np.ndarray)

    def test_to_numpy_none(self):
        assert to_numpy(None) is None


class TestFunctionId:
    def test_plain_function(self):
        def my_fn(x):
            return x

        fid = function_id(my_fn)
        assert fid.endswith("my_fn")
        assert ":" in fid

    def test_builtin_like(self):
        assert function_id(operator.itemgetter(0)) is not None

    def test_none(self):
        assert function_id(None) is None


class TestTrackCalls:
    def test_records_calls(self):
        class Thing:
            @track_calls
            def sample(self, n, flag=True):
                return n

        t = Thing()
        t.sample(5, flag=False)
        t.sample(7)
        history = t._call_history["sample"]
        assert len(history.calls) == 2
        assert history.last["args"] == (7,)
        assert history.calls[0]["kwargs"] == {"flag": False}

    def test_to_dict_sanitizes_callables(self):
        h = CallHistory()
        h.add_call((math.sin,), {"fn": math.cos})
        d = h.to_dict()
        assert "sin" in d["0"]["args"][0]
        assert "cos" in d["0"]["kwargs"]["fn"]


class TestSplitKwargs:
    def test_split(self):
        def f(a, b=1):
            pass

        acc, rest = split_kwargs_by_signature(f, {"a": 1, "c": 2})
        assert acc == {"a": 1}
        assert rest == {"c": 2}

    def test_var_kwargs_accepts_all(self):
        def f(a, **kw):
            pass

        acc, rest = split_kwargs_by_signature(f, {"a": 1, "c": 2})
        assert acc == {"a": 1, "c": 2}
        assert rest == {}


class TestLogger:
    def test_configure(self):
        logger = configure_logger("DEBUG")
        assert logger.level == logging.DEBUG
        assert any(
            isinstance(h, logging.StreamHandler) for h in logger.handlers
        )
        # Clean up handlers to avoid duplicate output in later tests.
        for h in list(logger.handlers):
            logger.removeHandler(h)


class _FakePool:
    """Stand-in for multiprocessing.Pool."""

    def __init__(self):
        self.closed = False
        self.used = False

    def map(self, fn, items):
        self.used = True
        return [fn(i) for i in items]

    def close(self):
        self.closed = True

    def join(self):
        pass


class TestPoolHandler:
    def _make_aspire_like(self):
        class A:
            def log_likelihood(self, samples, map_fn=map):
                return np.asarray(
                    list(map_fn(lambda row: -0.5 * np.sum(row**2), samples.x))
                )

            def log_prior(self, samples):
                return np.zeros(len(samples.x))

        # Bind methods as attributes like Aspire does.
        a = A()
        a.log_likelihood = a.log_likelihood
        a.log_prior = a.log_prior
        return a

    def test_swaps_map_fn(self):
        a = self._make_aspire_like()
        pool = _FakePool()

        class S:
            x = np.ones((4, 2))

        with PoolHandler(a, pool):
            out = a.log_likelihood(S())
        assert pool.used
        assert pool.closed
        np.testing.assert_allclose(out, -1.0)

    def test_requires_map_fn_kwarg(self):
        class A:
            pass

        a = A()
        a.log_likelihood = lambda samples: 0  # no map_fn
        a.log_prior = lambda samples: 0
        with pytest.raises(ValueError, match="map_fn"):
            PoolHandler(a, _FakePool()).__enter__()

    def test_restores_original(self):
        a = self._make_aspire_like()
        original = a.log_likelihood
        with PoolHandler(a, _FakePool()):
            assert a.log_likelihood is not original
        assert a.log_likelihood is original
