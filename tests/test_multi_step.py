"""Scan-based multi-step trainer == sequence of single steps."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.train import loss as LS
from double_yolo_kaist_tpu.train import optim as OPT
from double_yolo_kaist_tpu.train.step import (create_train_state,
                                              make_multi_step,
                                              make_train_step)

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")

HYP = {"box": 1.0, "obj": 1.0, "cls": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
       "iou_t": 0.2, "fl_gamma": 0.0, "momentum": 0.9, "weight_decay": 0.0}


def _batches(k, bs=2, seed=0):
    rng = np.random.default_rng(seed)
    t, m = LS.pad_labels(
        [np.asarray([[0, 0.5, 0.5, 0.2, 0.4]], np.float32)] * bs, 4)
    return {
        "v": rng.integers(0, 256, (k, bs, 64, 64, 3), dtype=np.uint8),
        "l": rng.integers(0, 256, (k, bs, 64, 64, 3), dtype=np.uint8),
        "targets": np.broadcast_to(t, (k,) + t.shape).copy(),
        "tmask": np.broadcast_to(m, (k,) + m.shape).copy(),
    }


def test_multi_step_matches_sequential():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    tx = OPT.make_optimizer(HYP, lambda s: 1e-3, sgd=True)
    K = 3
    batches = _batches(K)
    rng = jax.random.PRNGKey(5)

    # sequential singles
    s1 = create_train_state(ir, jax.random.PRNGKey(0), tx)
    step = make_train_step(ir, HYP, tx, compute_dtype=jnp.float32,
                           donate=False)
    r = rng
    seq_losses = []
    for i in range(K):
        b = {kk: v[i] for kk, v in batches.items()}
        s1, m = step(s1, b, r)
        seq_losses.append(float(m["loss"]))
        r = jax.random.fold_in(r, 1)

    # one scan dispatch
    s2 = create_train_state(ir, jax.random.PRNGKey(0), tx)
    multi = make_multi_step(ir, HYP, tx, compute_dtype=jnp.float32)
    s2, metrics = multi(s2, {k: jnp.asarray(v) for k, v in batches.items()},
                        rng)
    scan_losses = [float(x) for x in np.asarray(metrics["loss"])]

    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.params["l0"]["w"]),
                               np.asarray(s1.params["l0"]["w"]),
                               rtol=1e-5, atol=1e-6)
    assert int(jax.device_get(s2.step)) == K
