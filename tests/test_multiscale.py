"""Multi-scale training: per-batch bucket sizes feed the same train step
(one cached XLA program per size)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.data.dataset import KaistDataset
from double_yolo_kaist_tpu.data.pipeline import train_batches
from double_yolo_kaist_tpu.train import optim as OPT
from double_yolo_kaist_tpu.train.step import create_train_state, make_train_step
from double_yolo_kaist_tpu.train.trainer import multi_scale_buckets

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")

HYP = {"box": 1.0, "obj": 1.0, "cls": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
       "iou_t": 0.2, "fl_gamma": 0.0, "momentum": 0.9, "weight_decay": 0.0,
       "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
       "degrees": 0, "translate": 0, "scale": 0, "shear": 0}


def test_buckets():
    assert multi_scale_buckets(512) == [320, 544, 512, 736] or \
        sorted(multi_scale_buckets(512)) == multi_scale_buckets(512)
    b = multi_scale_buckets(512)
    assert all(s % 32 == 0 for s in b)
    assert min(b) <= 512 // 1.5 + 32 and max(b) >= 512


def test_multiscale_batches(tmp_path):
    import cv2
    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    logical = []
    for i in range(8):
        im = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"I{i}_visible.jpg"), im)
        cv2.imwrite(str(img_dir / f"I{i}_lwir.jpg"), im)
        (lab_dir / f"I{i}.txt").write_text("0 0.5 0.5 0.3 0.4\n")
        logical.append(str(img_dir / f"I{i}.jpg"))
    split = tmp_path / "t.txt"
    split.write_text("\n".join(logical))

    ds = KaistDataset(str(split), 64, 2, augment=True, hyp=HYP)
    sizes = [32, 64]
    seen = set()
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    tx = OPT.make_optimizer(HYP, lambda s: 1e-3, sgd=True)
    state = create_train_state(ir, jax.random.PRNGKey(0), tx)
    step = make_train_step(ir, HYP, tx, compute_dtype=jnp.float32)
    for batch, idx in train_batches(ds, 2, jax.random.PRNGKey(0),
                                    img_size=sizes, hyp=HYP, seed_epoch=3):
        seen.add(batch["v"].shape[1])
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
    assert seen <= set(sizes) and len(seen) >= 1
