"""Training step: loss decreases, EMA/freeze work, and the data-parallel
sharded step over an 8-device CPU mesh matches the single-device result."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph
from double_yolo_kaist_tpu.parallel import mesh as M
from double_yolo_kaist_tpu.train import loss as LS
from double_yolo_kaist_tpu.train import optim as OPT
from double_yolo_kaist_tpu.train.step import (TrainState, create_train_state,
                                              make_eval_step, make_train_step)

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")


@pytest.fixture(scope="module")
def tiny_ir():
    return compile_cfg(TINY, yolo_strides=[8, 4])


def _batch(bs=8, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 256, (bs, 64, 64, 3), dtype=np.uint8)
    l = rng.integers(0, 256, (bs, 64, 64, 3), dtype=np.uint8)
    labels = [np.asarray([[0, 0.3, 0.4, 0.2, 0.3], [0, 0.7, 0.6, 0.25, 0.4]],
                         np.float32) for _ in range(bs)]
    t, m = LS.pad_labels(labels, 8)
    return {"v": v, "l": l, "targets": t, "tmask": m}


def test_ir_structure(tiny_ir):
    assert tiny_ir.dual_stream and tiny_ir.second_index == 3
    assert [n.yolo_stride for n in tiny_ir.head_nodes()] == [8, 4]


def test_loss_decreases(tiny_ir):
    hyp = {"box": 3.54, "obj": 64.3, "cls": 37.4, "cls_pw": 1.0, "obj_pw": 1.0,
           "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0,
           "momentum": 0.9, "weight_decay": 0.0}
    sched = OPT.cosine_epoch_schedule(1e-3, 0.1, epochs=10, steps_per_epoch=5,
                                      warmup=False)
    tx = OPT.make_optimizer(hyp, sched, sgd=False)
    state = create_train_state(tiny_ir, jax.random.PRNGKey(0), tx, ema=True)
    step = make_train_step(tiny_ir, hyp, tx, compute_dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(25):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 25
    assert int(state.ema["updates"]) == 25
    assert np.isfinite(losses).all()


def test_sharded_matches_single_device(tiny_ir):
    hyp = {"box": 1.0, "obj": 1.0, "cls": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
           "iou_t": 0.2, "fl_gamma": 0.0, "momentum": 0.9,
           "weight_decay": 1e-4}
    sched = lambda s: 1e-3  # noqa: E731
    tx = OPT.make_optimizer(hyp, sched, sgd=True)
    step = make_train_step(tiny_ir, hyp, tx, compute_dtype=jnp.float32,
                           donate=False)
    batch = _batch()
    rng = jax.random.PRNGKey(2)

    s0 = create_train_state(tiny_ir, jax.random.PRNGKey(0), tx)
    _, m_single = step(s0, batch, rng)

    mesh = M.make_mesh()
    assert mesh.devices.size == 8
    sharded = M.shard_batch(batch, mesh)
    s1 = create_train_state(tiny_ir, jax.random.PRNGKey(0), tx)
    s1 = TrainState(*[M.replicate(x, mesh) if x is not None else None
                      for x in s1])
    _, m_sharded = step(s1, sharded, rng)

    for k in ("loss", "box_loss", "obj_loss"):
        assert abs(float(m_single[k]) - float(m_sharded[k])) < 1e-4, k


def test_freeze_mask(tiny_ir):
    variables = graph.init(tiny_ir, jax.random.PRNGKey(0))
    mask = OPT.freeze_mask_by_layer(variables["params"], max_frozen_layer=5)
    hyp = {"momentum": 0.9, "weight_decay": 0.0, "box": 1.0, "obj": 1.0,
           "cls": 1.0, "cls_pw": 1.0, "obj_pw": 1.0, "iou_t": 0.2,
           "fl_gamma": 0.0}
    tx = OPT.make_optimizer(hyp, lambda s: 1e-2, sgd=True, freeze_mask=mask)
    state = create_train_state(tiny_ir, jax.random.PRNGKey(0), tx,
                               variables=variables)
    step = make_train_step(tiny_ir, hyp, tx, compute_dtype=jnp.float32,
                           donate=False)
    new_state, _ = step(state, _batch(), jax.random.PRNGKey(3))
    frozen_before = variables["params"]["l0"]["w"]
    frozen_after = new_state.params["l0"]["w"]
    np.testing.assert_array_equal(np.asarray(frozen_before),
                                  np.asarray(frozen_after))
    live_delta = np.abs(np.asarray(new_state.params["l10"]["w"])
                        - np.asarray(variables["params"]["l10"]["w"])).max()
    assert live_delta > 0


def test_eval_step(tiny_ir):
    variables = graph.init(tiny_ir, jax.random.PRNGKey(0))
    fwd = make_eval_step(tiny_ir, compute_dtype=jnp.float32)
    batch = _batch(bs=2)
    io = fwd(variables, batch["v"], batch["l"])
    n_expect = 3 * (8 * 8 + 16 * 16)
    assert io.shape == (2, n_expect, 6)
    conf = np.asarray(io[..., 4])
    assert (conf >= 0).all() and (conf <= 1).all()


def test_warmup_schedule():
    sched = OPT.cosine_epoch_schedule(1e-3, 0.1, epochs=50, steps_per_epoch=500)
    assert float(sched(0)) < 2e-5  # warmup start: lr0/1000
    assert abs(float(sched(500)) - 1e-3 * (((1 + np.cos(np.pi / 50)) / 2) * 0.9 + 0.1)) < 1e-9
    assert abs(float(sched(50 * 500 - 1)) - 1e-4) < 2e-6  # final ~ lr0*lrf
