"""Reference .pt checkpoint import (torch.load path) -> forward parity."""

import numpy as np
import torch

import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph, layers as _L
from double_yolo_kaist_tpu.models.import_weights import from_torch_checkpoint

from tests.torch_ref import load_reference_yolo

_L.set_precision("highest")

CFG = "/root/reference/config/kaist_yolov3.cfg"


def test_pt_checkpoint_roundtrip(tmp_path):
    YOLO = load_reference_yolo()
    torch.manual_seed(3)
    tm = YOLO(CFG, img_size=(64, 64), verbose=False)
    tm.eval()
    # reference checkpoint format (train.py:225-231)
    path = str(tmp_path / "ckpt.pt")
    torch.save({"model": tm.state_dict(), "optimizer": None,
                "training_results": "", "epoch": 3, "best_map": 0.5}, path)

    ir = compile_cfg(CFG)
    variables = from_torch_checkpoint(ir, path)
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
