"""Data-parallel INFERENCE over the device mesh: the fused serve/eval
programs (forward + decode + NMS) sharded over the batch must produce
outputs identical to the single-device programs (per-image math is
embarrassingly parallel — no collectives, no tolerance games), including
partial batches that need padding to a device-count multiple.

This is the deployment-scale path (SURVEY §2.3 maps DP as the first-class
strategy; the reference's evaluate.py:31-123 ran strictly single-GPU): the
flagship's per-chip fps is roofline-bound (docs/ROADMAP.md), so reaching
past it is only possible as aggregate multi-chip throughput.
"""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.data.dataset import KaistDataset
from double_yolo_kaist_tpu.eval.evaluator import evaluate_dataset
from double_yolo_kaist_tpu.models import graph
from double_yolo_kaist_tpu.parallel import mesh as M
from double_yolo_kaist_tpu.serving import Predictor

TINY = os.path.join(os.path.dirname(__file__), "fixtures",
                    "tiny_dyolov3.cfg")
W0, H0 = 160, 128


@pytest.fixture(scope="module")
def mini_split(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_kaist")
    img_dir = root / "images" / "set00"
    lab_dir = root / "labels" / "set00"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    logical = []
    for i in range(8):
        v = rng.integers(0, 256, (H0, W0, 3), dtype=np.uint8)
        l = rng.integers(0, 256, (H0, W0, 3), dtype=np.uint8)
        stem = f"I{i:05d}"
        cv2.imwrite(str(img_dir / f"{stem}_visible.jpg"), v)
        cv2.imwrite(str(img_dir / f"{stem}_lwir.jpg"), l)
        with open(lab_dir / f"{stem}.txt", "w") as f:
            f.write("0 0.5 0.5 0.25 0.4\n")
        logical.append(str(img_dir / f"{stem}.jpg"))
    split = root / "val.txt"
    split.write_text("\n".join(logical) + "\n")
    return str(split)


def test_evaluate_dataset_sharded_matches_single(mini_split):
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    ds = KaistDataset(mini_split, img_size=64, rect=True)
    mesh = M.make_mesh()          # all 8 virtual devices on ("data",)
    # batch 5 over 8 images -> batches of 5 and 3: 5 and 3 both need
    # zero-padding to a multiple of 8 in the sharded run
    kw = dict(batch_size=5, conf_thres=0.005,
              compute_dtype=jnp.float32)
    r1 = evaluate_dataset(ir, variables, ds, **kw)
    r8 = evaluate_dataset(ir, variables, ds, mesh=mesh, **kw)
    assert r1["ap"] == pytest.approx(r8["ap"], abs=1e-9)
    assert r1["lamr"] == pytest.approx(r8["lamr"], abs=1e-9)
    np.testing.assert_allclose(r1["coco_stats"], r8["coco_stats"],
                               atol=1e-9)
    assert set(r1["predictions"]) == set(r8["predictions"])
    for k in r1["predictions"]:
        b1, s1 = r1["predictions"][k]
        b8, s8 = r8["predictions"][k]
        assert len(b1) == len(b8), k
        np.testing.assert_allclose(b1, b8, atol=1e-4)
        np.testing.assert_allclose(s1, s8, atol=1e-5)


def test_evaluate_calibration_artifact(mini_split, tmp_path):
    """evaluate_dataset(calibration=path): the first int8 run freezes its
    stats to the artifact, the second loads them — identical metrics, and
    eval can certify exactly the quantization deployment serves."""
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    ds = KaistDataset(mini_split, img_size=64, rect=True)
    cal = str(tmp_path / "c.npz")
    kw = dict(batch_size=4, conf_thres=0.005, compute_dtype=jnp.float32,
              int8=True)
    r1 = evaluate_dataset(ir, variables, ds, calibration=cal, **kw)
    assert os.path.exists(cal)
    r2 = evaluate_dataset(ir, variables, ds, calibration=cal, **kw)
    np.testing.assert_array_equal(r1["coco_stats"], r2["coco_stats"])
    assert r1["ap"] == r2["ap"] and r1["lamr"] == r2["lamr"]


def test_evaluate_quantized_artifact(mini_split, tmp_path):
    """evaluate_dataset(quantized=path) scores the LITERAL artifact a
    server loads: metrics equal quantizing in-process from the same frozen
    stats, and a mode mismatch is rejected."""
    from double_yolo_kaist_tpu.models import quantize as Q

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    ds = KaistDataset(mini_split, img_size=64, rect=True)
    kw = dict(batch_size=4, conf_thres=0.005, compute_dtype=jnp.float32,
              int8=True)

    # freeze stats, build the artifact exactly as tools/calibrate.py does
    cal = str(tmp_path / "c.npz")
    r_stats = evaluate_dataset(ir, variables, ds, calibration=cal, **kw)
    stats, _ = Q.load_calibration(cal)
    folded = graph.fold_batchnorm(ir, variables)
    folded = jax.tree.map(lambda a: a.astype(jnp.float32), folded)
    hw = tuple(int(x) for x in ds.batch_shapes[0])  # eval's rect prepare size
    qpath = str(tmp_path / "q.npz")
    Q.save_quantized(qpath, Q.quantize(ir, folded, stats, mode="chain",
                                       hw=hw),
                     mode="chain", hw=hw)

    r_art = evaluate_dataset(ir, variables, ds, quantized=qpath, **kw)
    np.testing.assert_allclose(r_art["coco_stats"], r_stats["coco_stats"],
                               atol=1e-9)
    assert r_art["ap"] == pytest.approx(r_stats["ap"], abs=1e-9)

    with pytest.raises(ValueError, match="mode"):
        evaluate_dataset(ir, variables, ds, quantized=qpath,
                         int8_mode="seed", **kw)


def test_predictor_sharded_matches_single():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    mesh = M.make_mesh()
    kw = dict(img_size=64, conf_thres=0.005, compute_dtype=jnp.float32)
    p1 = Predictor(ir, variables, batch_buckets=(4,), **kw)
    p8 = Predictor(ir, variables, batch_buckets=(4,), mesh=mesh, **kw)
    # bucket rounding: 4 -> 8 on an 8-device mesh
    assert p8.batch_buckets == [8]
    # warmup with an off-bucket batch must snap to the bucket: batch=3 is
    # not divisible by 8 devices and would fail the 'data' sharding raw
    p8.warmup((96, 128), batch=3)
    rng = np.random.default_rng(0)
    imgs_v = rng.integers(0, 256, (6, 96, 128, 3), dtype=np.uint8)
    imgs_l = rng.integers(0, 256, (6, 96, 128, 3), dtype=np.uint8)
    out1 = p1(imgs_v, imgs_l)     # 6 imgs through bucket-4 programs
    out8 = p8(imgs_v, imgs_l)     # 6 imgs padded to one bucket-8 program
    assert len(out1) == len(out8) == 6
    for (b1, s1, c1), (b8, s8, c8) in zip(out1, out8):
        assert len(b1) == len(b8)
        np.testing.assert_allclose(b1, b8, atol=1e-4)
        np.testing.assert_allclose(s1, s8, atol=1e-5)
        np.testing.assert_array_equal(c1, c8)


def test_predictor_sharded_int8_runs():
    """int8 serving over the mesh: calibration + quantized program execute
    sharded and produce the same detections as the single-device int8
    path."""
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    mesh = M.make_mesh()
    kw = dict(img_size=64, conf_thres=0.005, compute_dtype=jnp.float32,
              int8=True, calibration_batches=1)
    p1 = Predictor(ir, variables, batch_buckets=(8,), **kw)
    p8 = Predictor(ir, variables, batch_buckets=(8,), mesh=mesh, **kw)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (8, 96, 128, 3), dtype=np.uint8)
    p1(imgs, imgs)                # calibration batch
    p8(imgs, imgs)
    assert p1._qvars is not None and p8._qvars is not None
    out1, out8 = p1(imgs, imgs), p8(imgs, imgs)
    for (b1, s1, c1), (b8, s8, c8) in zip(out1, out8):
        assert len(b1) == len(b8)
        np.testing.assert_allclose(b1, b8, atol=1e-4)
        np.testing.assert_array_equal(c1, c8)
