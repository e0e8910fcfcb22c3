"""Tests for the small utility/tool modules: MANO pkl conversion (incl. the
chumpy-stub unpickling path — smpl_handpca_wrapper_HAND_only.py:22-67),
Timer warmup semantics (common/timer.py:41-70), colorlogger file binding
(common/logger.py:23-56), and the persistent compile cache knob."""

import logging
import pickle
import sys
import types

import numpy as np
import pytest

from hoisdf_tpu.mano.model import (
    NUM_VERTS,
    convert_mano_pkl,
    load_mano_npz,
    make_synthetic_mano,
    save_mano_npz,
)


def _mano_pkl_payload(rng):
    return {
        "shapedirs": rng.standard_normal((NUM_VERTS, 3, 10)),
        "posedirs": rng.standard_normal((NUM_VERTS, 3, 135)),
        "v_template": rng.standard_normal((NUM_VERTS, 3)),
        "J_regressor": rng.standard_normal((16, NUM_VERTS)),
        "weights": rng.random((NUM_VERTS, 16)),
        "f": rng.integers(0, NUM_VERTS, (1538, 3)),
        "hands_components": rng.standard_normal((45, 45)),
        "hands_mean": rng.standard_normal(45),
    }


def test_convert_mano_pkl_plain_and_sparse(tmp_path):
    scipy_sparse = pytest.importorskip("scipy.sparse")
    rng = np.random.default_rng(0)
    data = _mano_pkl_payload(rng)
    dense_jreg = data["J_regressor"].copy()
    data["J_regressor"] = scipy_sparse.csc_matrix(dense_jreg)

    path = tmp_path / "MANO_LEFT.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)

    model = convert_mano_pkl(str(path))
    assert model.side == "left"  # inferred from the file name
    np.testing.assert_allclose(model.j_regressor, dense_jreg, rtol=1e-6)
    assert model.posedirs.shape == (NUM_VERTS, 3, 135)
    assert model.faces.dtype == np.int32

    npz = tmp_path / "mano_left.npz"
    save_mano_npz(model, str(npz))
    back = load_mano_npz(str(npz))
    np.testing.assert_array_equal(back.v_template, model.v_template)
    assert back.side == "left"


def test_convert_mano_pkl_chumpy_objects(tmp_path, monkeypatch):
    """Arrays wrapped in chumpy.Ch nodes (the real MANO pkl layout) unpickle
    through the installed stub without chumpy itself."""
    fake = types.ModuleType("chumpy")

    class Ch:
        pass

    # pickle stores classes by __module__/__qualname__, so point them at
    # the fake module to get 'chumpy Ch' into the stream like a real pkl
    Ch.__module__ = "chumpy"
    Ch.__qualname__ = "Ch"
    fake.Ch = Ch
    monkeypatch.setitem(sys.modules, "chumpy", fake)

    rng = np.random.default_rng(1)
    data = _mano_pkl_payload(rng)
    expected_shapedirs = data["shapedirs"].copy()
    wrapped = Ch()
    wrapped.__dict__["x"] = data["shapedirs"]
    data["shapedirs"] = wrapped

    path = tmp_path / "MANO_RIGHT.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)

    # Fresh process state: convert_mano_pkl must install its own stub.
    monkeypatch.delitem(sys.modules, "chumpy")
    model = convert_mano_pkl(str(path), side="right")
    np.testing.assert_allclose(model.shapedirs, expected_shapedirs, rtol=1e-6)
    assert model.side == "right"


def test_synthetic_mano_deterministic():
    a = make_synthetic_mano(3)
    b = make_synthetic_mano(3)
    np.testing.assert_array_equal(a.shapedirs, b.shapedirs)
    assert make_synthetic_mano(4).shapedirs.shape == a.shapedirs.shape


def test_timer_warmup_average():
    from hoisdf_tpu.utils.timer import Timer

    t = Timer(warmup=2)
    for _ in range(5):
        t.tic()
        t.toc()
    # only calls 3..5 enter the average
    assert t.calls == 5
    assert t.total_time > 0
    assert t.average_time == pytest.approx(t.total_time / 3)
    t.reset()
    assert t.calls == 0 and t.total_time == 0.0


def test_colorlogger_rebinds_to_new_dir(tmp_path):
    from hoisdf_tpu.utils.logger import colorlogger

    d1, d2 = tmp_path / "run1", tmp_path / "run2"
    log = colorlogger(str(d1), "logs.txt")
    log.info("first run")
    # same logger name, new run dir: handlers must rebind, not reuse run1
    log2 = colorlogger(str(d2), "logs.txt")
    log2.info("second run")
    assert "first run" in (d1 / "logs.txt").read_text()
    assert "second run" in (d2 / "logs.txt").read_text()
    assert "second run" not in (d1 / "logs.txt").read_text()
    # idempotent: same dir returns the same bound logger without dup handlers
    assert colorlogger(str(d2), "logs.txt") is log2
    assert sum(isinstance(h, logging.FileHandler) for h in log2.handlers) == 1


def test_compile_cache_enable(tmp_path):
    import jax

    from hoisdf_tpu.utils.compile_cache import enable

    before = jax.config.jax_compilation_cache_dir
    try:
        assert enable(str(tmp_path / "xla_cache"), min_compile_secs=1.0)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla_cache")
        assert (tmp_path / "xla_cache").is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
