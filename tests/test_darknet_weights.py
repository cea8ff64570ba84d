"""Darknet .weights binary importer parity: synthesize a weights file for a
small cfg, load it through the reference's loader (models.py:318-364) and
ours, and compare the resulting forward outputs."""

import os

import numpy as np
import torch

import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph, layers as _L
from double_yolo_kaist_tpu.models.import_weights import (from_darknet_weights,
                                                         merge_variables)

from tests.torch_ref import load_reference_yolo

_L.set_precision("highest")

CFG = "/root/reference/config/kaist_yolov3.cfg"


def _synthesize_weights(tm, path):
    """Write a darknet-format weights file from a torch reference model."""
    chunks = [np.asarray([0, 2, 0], np.int32).tobytes(),
              np.asarray([0], np.int64).tobytes()]
    for mdef, module in zip(tm.module_defs, tm.module_list):
        if mdef["type"] != "convolutional":
            continue
        conv = module[0]
        if mdef["batch_normalize"]:
            bn = module[1]
            for t in (bn.bias, bn.weight, bn.running_mean, bn.running_var):
                chunks.append(t.detach().numpy().astype(np.float32).tobytes())
        else:
            chunks.append(conv.bias.detach().numpy().astype(np.float32)
                          .tobytes())
        chunks.append(conv.weight.detach().numpy().astype(np.float32)
                      .tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


def test_darknet_import_forward_parity(tmp_path):
    YOLO = load_reference_yolo()
    torch.manual_seed(1)
    donor = YOLO(CFG, img_size=(64, 64), verbose=False)
    # randomize BN running stats so folding/normalization is non-trivial
    for m in donor.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    wpath = str(tmp_path / "synth.weights")
    _synthesize_weights(donor, wpath)

    # reference loads the binary into a fresh model
    torch.manual_seed(2)
    tm = YOLO(CFG, img_size=(64, 64), verbose=False)
    from models import load_darknet_weights  # reference models.py
    load_darknet_weights(tm, wpath)
    tm.eval()

    ir = compile_cfg(CFG)
    base = graph.init(ir, __import__("jax").random.PRNGKey(0))
    variables = merge_variables(base, from_darknet_weights(ir, wpath))

    rng = np.random.default_rng(0)
    v = rng.random((1, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        t_io, _ = tm(torch.from_numpy(v))
    (io, _), _ = graph.apply(ir, variables,
                             jnp.asarray(v.transpose(0, 2, 3, 1)), None,
                             train=False)
    err = np.abs(np.asarray(io) - t_io.numpy()).max() / \
        max(np.abs(t_io.numpy()).max(), 1e-6)
    assert err < 2e-3, err
