"""Gradient-checkpointed (remat) training path must match non-remat exactly."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.train import loss as LS
from double_yolo_kaist_tpu.train import optim as OPT
from double_yolo_kaist_tpu.train.step import create_train_state, make_train_step

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")


def test_remat_matches_plain():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    hyp = {"box": 1.0, "obj": 1.0, "cls": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
           "iou_t": 0.2, "fl_gamma": 0.0, "momentum": 0.9,
           "weight_decay": 0.0}
    tx = OPT.make_optimizer(hyp, lambda s: 1e-3, sgd=True)
    rng = np.random.default_rng(0)
    batch = {"v": rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8),
             "l": rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)}
    t, m = LS.pad_labels(
        [np.asarray([[0, 0.5, 0.5, 0.2, 0.4]], np.float32)] * 4, 4)
    batch.update({"targets": t, "tmask": m})

    results = {}
    for rs in (0, 4):
        state = create_train_state(ir, jax.random.PRNGKey(0), tx)
        step = make_train_step(ir, hyp, tx, compute_dtype=jnp.float32,
                               donate=False, remat_segments=rs)
        s2, metrics = step(state, batch, jax.random.PRNGKey(2))
        results[rs] = (float(metrics["loss"]), float(metrics["grad_norm"]),
                       np.asarray(s2.params["l0"]["w"]))
    assert abs(results[0][0] - results[4][0]) < 1e-6
    assert abs(results[0][1] - results[4][1]) < 1e-5
    np.testing.assert_allclose(results[0][2], results[4][2], atol=1e-7)
