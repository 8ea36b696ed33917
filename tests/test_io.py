"""Persistence tests: dict and pytree HDF5 round-trips."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aspire_tpu.io import (
    AspireFile,
    load_dict_from_hdf5,
    load_pytree_from_hdf5,
    load_state_bytes,
    save_dict_to_hdf5,
    save_pytree_to_hdf5,
    save_state_bytes,
)


class TestAspireFile:
    def test_version_stamp(self, tmp_path):
        import aspire_tpu

        with AspireFile(tmp_path / "f.h5", "w") as f:
            assert f.attrs["aspire_tpu_version"] == aspire_tpu.__version__


class TestDictRoundtrip:
    def test_nested(self, tmp_path):
        data = {
            "a": 1,
            "b": 2.5,
            "c": "hello",
            "d": None,
            "e": {},
            "f": {"g": np.arange(5), "h": [1.0, 2.0]},
            "flag": True,
            "strs": ["x", "y"],
        }
        with h5py.File(tmp_path / "f.h5", "w") as f:
            save_dict_to_hdf5(f, "root", data)
        with h5py.File(tmp_path / "f.h5", "r") as f:
            out = load_dict_from_hdf5(f, "root")
        assert out["a"] == 1
        assert out["b"] == 2.5
        assert out["c"] == "hello"
        assert out["d"] is None
        assert out["e"] == {}
        np.testing.assert_array_equal(out["f"]["g"], np.arange(5))
        assert out["flag"] is True or out["flag"] == 1
        assert out["strs"] == ["x", "y"]

    def test_overwrite(self, tmp_path):
        with h5py.File(tmp_path / "f.h5", "w") as f:
            save_dict_to_hdf5(f, "root", {"a": 1})
            save_dict_to_hdf5(f, "root", {"a": 2})
            assert load_dict_from_hdf5(f, "root")["a"] == 2

    def test_arbitrary_object_pickled(self, tmp_path):
        data = {"obj": {1: "a", 2: "b"}}  # dict with non-str keys
        with h5py.File(tmp_path / "f.h5", "w") as f:
            save_dict_to_hdf5(f, "root", data)
        with h5py.File(tmp_path / "f.h5", "r") as f:
            out = load_dict_from_hdf5(f, "root")
        # non-str keys are stringified group keys
        assert out["obj"]["1"] == "a"


class TestPytreeRoundtrip:
    def test_nested_params(self, tmp_path):
        tree = {
            "layers": [
                {"w": jnp.ones((3, 4)), "b": jnp.zeros(4)},
                {"w": jnp.full((4, 2), 2.0), "b": jnp.ones(2)},
            ],
            "meta": 7,
        }
        with h5py.File(tmp_path / "f.h5", "w") as f:
            save_pytree_to_hdf5(f, "params", tree)
        like = jax.tree_util.tree_map(jnp.zeros_like, tree)
        with h5py.File(tmp_path / "f.h5", "r") as f:
            out = load_pytree_from_hdf5(f, "params", like)
        np.testing.assert_array_equal(
            np.asarray(out["layers"][0]["w"]), np.ones((3, 4))
        )
        assert out["meta"] == 7

    def test_shape_mismatch_raises(self, tmp_path):
        tree = {"w": jnp.ones((3, 4))}
        with h5py.File(tmp_path / "f.h5", "w") as f:
            save_pytree_to_hdf5(f, "params", tree)
        like = {"w": jnp.zeros((2, 2))}
        with h5py.File(tmp_path / "f.h5", "r") as f:
            with pytest.raises(ValueError, match="shape mismatch"):
                load_pytree_from_hdf5(f, "params", like)

    def test_structure_mismatch_raises(self, tmp_path):
        tree = {"w": jnp.ones(3)}
        with h5py.File(tmp_path / "f.h5", "w") as f:
            save_pytree_to_hdf5(f, "params", tree)
        like = {"w": jnp.zeros(3), "extra": jnp.zeros(1)}
        with h5py.File(tmp_path / "f.h5", "r") as f:
            with pytest.raises(ValueError, match="structure mismatch"):
                load_pytree_from_hdf5(f, "params", like)


class TestStateBytes:
    def test_roundtrip(self, tmp_path):
        payload = b"some pickled state \x00\x01"
        with h5py.File(tmp_path / "f.h5", "w") as f:
            save_state_bytes(f, payload)
        with h5py.File(tmp_path / "f.h5", "r") as f:
            assert load_state_bytes(f) == payload

    def test_overwrite(self, tmp_path):
        with h5py.File(tmp_path / "f.h5", "w") as f:
            save_state_bytes(f, b"one")
            save_state_bytes(f, b"two longer payload")
            assert load_state_bytes(f) == b"two longer payload"
