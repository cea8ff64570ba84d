"""2-D mesh: data x spatial sharding of the conv stack.

Images are sharded over batch AND height; XLA GSPMD inserts the halo
exchanges for 3x3 convs automatically. The sharded forward/train step must
match the single-device result."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph
from double_yolo_kaist_tpu.parallel import mesh as M
from double_yolo_kaist_tpu.train import loss as LS
from double_yolo_kaist_tpu.train import optim as OPT
from double_yolo_kaist_tpu.train.step import (TrainState, create_train_state,
                                              make_train_step)

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")


def test_data_x_spatial_forward():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xv = jnp.asarray(rng.random((4, 64, 64, 3), np.float32))
    xl = jnp.asarray(rng.random((4, 64, 64, 3), np.float32))

    fwd = jax.jit(lambda v, a, b: graph.apply(ir, v, a, b, train=False)[0][0])
    ref = np.asarray(fwd(variables, xv, xl))

    mesh = M.make_mesh(axis_names=("data", "space"), shape=(4, 2))
    sh = NamedSharding(mesh, P("data", "space"))
    xv_s = jax.device_put(xv, sh)
    xl_s = jax.device_put(xl, sh)
    var_s = M.replicate(variables, mesh)
    out = np.asarray(fwd(var_s, xv_s, xl_s))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_data_x_spatial_train_step():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    hyp = {"box": 1.0, "obj": 1.0, "cls": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
           "iou_t": 0.2, "fl_gamma": 0.0, "momentum": 0.9,
           "weight_decay": 0.0}
    tx = OPT.make_optimizer(hyp, lambda s: 1e-3, sgd=True)
    step = make_train_step(ir, hyp, tx, compute_dtype=jnp.float32,
                           donate=False)
    rng = np.random.default_rng(1)
    batch = {"v": rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8),
             "l": rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)}
    t, m = LS.pad_labels(
        [np.asarray([[0, 0.5, 0.5, 0.2, 0.4]], np.float32)] * 4, 4)
    batch.update({"targets": t, "tmask": m})

    s0 = create_train_state(ir, jax.random.PRNGKey(0), tx)
    _, m_ref = step(s0, batch, jax.random.PRNGKey(2))

    mesh = M.make_mesh(axis_names=("data", "space"), shape=(4, 2))
    img_sh = NamedSharding(mesh, P("data", "space"))
    lab_sh = NamedSharding(mesh, P("data"))
    batch_s = {"v": jax.device_put(batch["v"], img_sh),
               "l": jax.device_put(batch["l"], img_sh),
               "targets": jax.device_put(batch["targets"], lab_sh),
               "tmask": jax.device_put(batch["tmask"], lab_sh)}
    s1 = create_train_state(ir, jax.random.PRNGKey(0), tx)
    s1 = TrainState(*[M.replicate(x, mesh) if x is not None else None
                      for x in s1])
    _, m_sh = step(s1, batch_s, jax.random.PRNGKey(2))
    for k in ("loss", "box_loss", "obj_loss"):
        assert abs(float(m_ref[k]) - float(m_sh[k])) < 1e-4, k
