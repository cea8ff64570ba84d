"""Predictor serving API: batch bucketing, padding, letterbox undo."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph
from double_yolo_kaist_tpu.serving import Predictor

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")


def test_predictor_batching():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    pred = Predictor(ir, variables, img_size=64, conf_thres=0.005,
                     batch_buckets=(2, 4), compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (5, 96, 128, 3), dtype=np.uint8)
    out = pred(imgs, imgs)
    assert len(out) == 5
    for boxes, scores, classes in out:
        assert boxes.shape[1:] == (4,)
        assert len(boxes) == len(scores) == len(classes)
        if len(boxes):
            assert (boxes[:, [0, 2]] <= 128).all()
            assert (boxes[:, [1, 3]] <= 96).all()
            assert (boxes >= 0).all()
    # only the bucketed shapes were compiled (2 buckets -> <= 2 programs)
    assert len(pred._pre_cache) == 1


def test_fused_request_program_matches_split_pipeline():
    """The single fused request program (letterbox+forward+NMS with a
    packed valid mask — one dispatch, one fetch) returns exactly what the
    split letterbox -> infer pipeline returns."""
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    pred = Predictor(ir, variables, img_size=64, conf_thres=0.005,
                     batch_buckets=(2,), compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    v = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    l = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)

    out_fused = pred(v, l)                       # production path

    src_hw = (96, 128)
    fn, ratio, pad = pred._preprocess(src_hw)
    xv, xl = fn(jnp.asarray(v), jnp.asarray(l))
    det, valid = pred._infer(pred.folded, xv, xl)
    det, valid = np.asarray(det), np.asarray(valid).astype(bool)
    for i, (boxes, scores, classes) in enumerate(out_fused):
        d = det[i][valid[i]]
        assert len(d) == len(boxes)
        np.testing.assert_allclose(scores, d[:, 4], rtol=1e-6)
        np.testing.assert_array_equal(classes, d[:, 5].astype(int))


def test_predictor_int8_warmup_calibration():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    kw = dict(img_size=64, conf_thres=0.005, batch_buckets=(4,),
              compute_dtype=jnp.float32)
    fp = Predictor(ir, variables, **kw)
    q = Predictor(ir, variables, int8=True, calibration_batches=2, **kw)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 96, 128, 3), dtype=np.uint8)
    assert q._qvars is None           # lazy: nothing calibrated yet
    q(imgs, imgs)                     # warm-up batch 1: still bf16/fp path
    assert q._qvars is None and len(q._cal_batches) == 1
    out_fp, out_q = fp(imgs, imgs), q(imgs, imgs)   # batch 2 -> quantize
    assert q._qvars is not None and not q._cal_batches
    assert len(out_q) == len(out_fp) == 4
    # detections from the quantized path track the fp path: every top-3 fp
    # box must have a close quantized counterpart (marginal sub-threshold
    # boxes may reorder, so the comparison is set-based, not positional)
    for (bf, sf, cf), (bq, sq, cq) in zip(out_fp, out_q):
        if not len(bq):
            assert not len(bf)
            continue
        order = np.argsort(-sf)[:3]
        for i in order:
            d = np.abs(bq - bf[i]).max(axis=1)
            j = int(np.argmin(d))
            assert d[j] < 3.0, d[j]              # px at 96x128
            assert abs(sq[j] - sf[i]) < 0.05


def test_warmup_bypasses_calibration():
    """Predictor.warmup precompiles without consuming calibration slots:
    an all-zeros warmup frame routed through __call__ would occupy one of
    the calibration batches while contributing nothing to the max-abs
    stats (cli/serve.py startup regression)."""
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    q = Predictor(ir, variables, img_size=64, batch_buckets=(2,),
                  compute_dtype=jnp.float32, int8=True,
                  calibration_batches=1)
    q.warmup((96, 128))
    assert q._qvars is None and not q._cal_batches
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    q(imgs, imgs)                 # first REAL batch calibrates
    assert q._qvars is not None


def test_calibration_artifact_roundtrip(tmp_path):
    """Traffic-calibrated stats persist to the artifact, and a fresh
    Predictor loading it is fully quantized BEFORE any request with
    identical detections (fleet pattern: calibrate once, ship the file)."""
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    cal = str(tmp_path / "calib.npz")
    kw = dict(img_size=64, conf_thres=0.005, batch_buckets=(4,),
              compute_dtype=jnp.float32, int8=True, calibration_batches=1)
    a = Predictor(ir, variables, calibration=cal, **kw)
    assert a._qvars is None            # artifact doesn't exist yet
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 96, 128, 3), dtype=np.uint8)
    a(imgs, imgs)                      # calibrates from traffic AND saves
    assert os.path.exists(cal)
    out_a = a(imgs, imgs)

    b = Predictor(ir, variables, calibration=cal, **kw)
    assert b._qvars is not None        # quantized at startup, pre-traffic
    out_b = b(imgs, imgs)
    for (ba, sa, ca), (bb, sb, cb) in zip(out_a, out_b):
        np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(ca, cb)


def test_quantized_artifact_roundtrip(tmp_path):
    """Finished quantized variables persist and reload: a Predictor given
    the artifact starts int8-ready WITHOUT running fold+quantize (the
    startup-compile skip), with detections identical to the producer's.
    A mode mismatch is rejected loudly."""
    import pytest

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    qpath = str(tmp_path / "qvars.npz")
    kw = dict(img_size=64, conf_thres=0.005, batch_buckets=(4,),
              compute_dtype=jnp.float32, int8=True, calibration_batches=1)
    a = Predictor(ir, variables, quantized=qpath, **kw)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 96, 128, 3), dtype=np.uint8)
    a(imgs, imgs)                      # calibrates, quantizes, saves qvars
    assert os.path.exists(qpath)
    out_a = a(imgs, imgs)

    b = Predictor(ir, variables, quantized=qpath, **kw)
    assert b._qvars is not None        # loaded, no quantize pass
    out_b = b(imgs, imgs)
    for (ba, sa, ca), (bb, sb, cb) in zip(out_a, out_b):
        np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(ca, cb)

    with pytest.raises(ValueError, match="mode"):
        Predictor(ir, variables, quantized=qpath, int8_mode="seed", **kw)


def test_warmup_batch_snaps_to_bucket():
    """An explicit warmup batch override is snapped to the bucket __call__
    would pick: warming an off-bucket shape wastes the compile, and on a
    mesh a non-device-multiple batch fails the 'data' sharding outright
    (the mesh case is exercised in test_dp_inference.py)."""
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    pred = Predictor(ir, variables, img_size=64, conf_thres=0.005,
                     batch_buckets=(2, 4), compute_dtype=jnp.float32)
    assert pred._bucket(3) == 4
    pred.warmup((96, 128), batch=3)          # snaps to bucket 4


def test_int8_empty_plan_downgrades_to_bf16():
    """A model whose int8 plan is empty (MobileNet family) serves bf16:
    no calibration batches are collected, no quantize compile happens."""
    import unittest.mock as mock
    import warnings

    from double_yolo_kaist_tpu.models import quantize as Q

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    with mock.patch.object(Q, "plan_quantization",
                           lambda ir, mode="chain": (set(), set())):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            pred = Predictor(ir, variables, img_size=64, batch_buckets=(2,),
                             compute_dtype=jnp.float32, int8=True)
        assert any("plan" in str(x.message) for x in w)
    assert pred._int8 is False
    img = np.full((48, 64, 3), 128, np.uint8)
    dets = pred(np.stack([img, img]), np.stack([img, img]))
    assert len(dets) == 2
    assert not pred._cal_batches


def test_quantized_artifact_rect_hw_accepted(tmp_path):
    """A quantized artifact prepared at a rect hw (e.g. bench.py's 512x640
    cache) serves on a square-img_size server whenever the s2d plans agree
    — the relaxed check in Predictor.__init__ (plan equality is the only
    hw-dependence of seed/chain/all artifacts, quantize.py)."""
    from double_yolo_kaist_tpu.models import quantize as Q

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    folded = graph.fold_batchnorm(ir, variables)
    rng = np.random.default_rng(0)
    cal = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    stats = Q.calibrate(ir, folded, [(cal, cal)],
                        compute_dtype=jnp.float32)
    qv = Q.quantize(ir, folded, stats, mode="chain", hw=(64, 96))
    qpath = str(tmp_path / "rect_q.npz")
    Q.save_quantized(qpath, qv, mode="chain", hw=(64, 96))

    pred = Predictor(ir, variables, img_size=64, conf_thres=0.005,
                     batch_buckets=(2,), compute_dtype=jnp.float32,
                     int8=True, quantized=qpath)
    if pred._int8:                      # empty-plan models downgrade
        assert pred._qvars is not None  # loaded despite hw != (64, 64)
    imgs = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    out = pred(imgs, imgs)
    assert len(out) == 2


def test_flagship_s2d_plan_stable_across_serving_shapes():
    """The flagship's s2d plan is identical at (512,512) (Predictor
    prepare), (448,512) (KAIST frames letterboxed to img_size 512) and
    (512,640) (bench/eval rect) — the property the relaxed artifact-hw
    check and the serving prepare path both rely on."""
    from double_yolo_kaist_tpu.models.zoo import cfg_path

    ir = compile_cfg(cfg_path("Double-YOLOv4-Fshare-Global-CSE3"))
    base = graph.s2d_plan(ir, 512, 512)
    assert base == graph.s2d_plan(ir, 448, 512)
    assert base == graph.s2d_plan(ir, 512, 640)
    assert len(base) > 0
