"""AOT serving artifacts (double_yolo_kaist_tpu/export.py): the exported
one-file program must reproduce the live Predictor exactly, enforce its
compiled shapes, and refuse non-deterministic exports."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.export import (ExportedPredictor,
                                          export_serving_artifact)
from double_yolo_kaist_tpu.models import graph
from double_yolo_kaist_tpu.serving import Predictor

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")
SRC_HW = (96, 128)


def _tiny_predictor(**kw):
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    return Predictor(ir, variables, img_size=64, conf_thres=0.005,
                     batch_buckets=(2,), compute_dtype=jnp.float32, **kw)


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 256, (n,) + SRC_HW + (3,), dtype=np.uint8)
    l = rng.integers(0, 256, (n,) + SRC_HW + (3,), dtype=np.uint8)
    return v, l


def _assert_same_outputs(out_a, out_b):
    assert len(out_a) == len(out_b)
    for (ba, sa, ca), (bb, sb, cb) in zip(out_a, out_b):
        assert len(ba) == len(bb)
        np.testing.assert_allclose(ba, bb, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(ca, cb)


def test_exported_matches_predictor(tmp_path):
    pred = _tiny_predictor()
    path = str(tmp_path / "tiny.dykx")
    meta = export_serving_artifact(pred, SRC_HW, 2, path)
    assert jax.default_backend() in meta["platforms"]
    assert meta["int8"] is False

    loaded = ExportedPredictor(path)
    assert loaded.src_hw == SRC_HW and loaded.batch == 2
    # partial final chunk exercises the padding path (3 = 2 + 1-padded)
    v, l = _frames(3)
    _assert_same_outputs(loaded(v, l), pred(v, l))


def test_exported_warmup_and_frame_size_check(tmp_path):
    pred = _tiny_predictor()
    path = str(tmp_path / "tiny.dykx")
    export_serving_artifact(pred, SRC_HW, 2, path)
    loaded = ExportedPredictor(path)
    loaded.warmup()
    bad = np.zeros((1, 64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="compiled for frames"):
        loaded(bad)


def test_export_int8_roundtrip(tmp_path):
    qpath = str(tmp_path / "q.npz")
    pred = _tiny_predictor(int8=True, calibration_batches=1, quantized=qpath)
    # one served batch calibrates + quantizes (and freezes qvars to qpath)
    v, l = _frames(2, seed=3)
    ref_out = pred(v, l)
    assert pred._qvars is not None, "tiny plan unexpectedly empty"

    path = str(tmp_path / "tiny_int8.dykx")
    meta = export_serving_artifact(pred, SRC_HW, 2, path)
    assert meta["int8"] is True and meta["int8_mode"] == "chain"
    loaded = ExportedPredictor(path)
    _assert_same_outputs(loaded(v, l), ref_out)


def test_export_refuses_uncalibrated_int8(tmp_path):
    pred = _tiny_predictor(int8=True, calibration_batches=4)
    with pytest.raises(ValueError, match="not quantized yet"):
        export_serving_artifact(pred, SRC_HW, 2,
                                str(tmp_path / "nope.dykx"))


def test_export_refuses_mesh(tmp_path):
    from double_yolo_kaist_tpu.parallel import mesh as M

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    pred = Predictor(ir, variables, img_size=64,
                     compute_dtype=jnp.float32, mesh=M.make_mesh())
    with pytest.raises(ValueError, match="single-replica"):
        export_serving_artifact(pred, SRC_HW, 8,
                                str(tmp_path / "nope.dykx"))


def test_export_cli_tool(tmp_path):
    """tools/export_model.py end-to-end on the tiny cfg."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import export_model as mod
    out = str(tmp_path / "cli.dykx")
    meta = mod.main(["--cfg", TINY, "--img-size", "64",
                     "--src-hw", "96", "128", "--batch", "1",
                     "--conf-thres", "0.005", "--out", out])
    assert os.path.exists(out) and meta["batch"] == 1
    loaded = ExportedPredictor(out)
    v, l = _frames(1, seed=5)
    out1 = loaded(v, l)
    assert len(out1) == 1


def test_export_integrity_check(tmp_path):
    """A flipped byte in the variables blob must be caught at load."""
    import zipfile

    pred = _tiny_predictor()
    path = str(tmp_path / "tiny.dykx")
    export_serving_artifact(pred, SRC_HW, 2, path)
    with zipfile.ZipFile(path) as zf:
        members = {n: zf.read(n) for n in zf.namelist()}
    blob = bytearray(members["variables.npz"])
    blob[len(blob) // 2] ^= 0xFF
    members["variables.npz"] = bytes(blob)
    bad = str(tmp_path / "bad.dykx")
    with zipfile.ZipFile(bad, "w") as zf:
        for n, b in members.items():
            zf.writestr(n, b)
    with pytest.raises(ValueError, match="sha256 mismatch"):
        ExportedPredictor(bad)
