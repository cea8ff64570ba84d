"""Loss/assigner parity vs reference compute_loss/build_targets
(build_utils/utils.py:209-384), plus unit checks of the BCE/focal math."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import layers as _L
from double_yolo_kaist_tpu.train import loss as LS

from tests.torch_ref import load_reference_yolo

_L.set_precision("highest")

load_reference_yolo()
from build_utils import utils as ref_utils  # noqa: E402


def _make_targets():
    """2 images x 3 targets in distinct grid cells (avoids tobj scatter-order
    ambiguity between torch last-write and XLA scatter)."""
    rows = [
        [0, 0, 0.20, 0.20, 0.10, 0.30],
        [0, 0, 0.70, 0.30, 0.40, 0.40],
        [0, 0, 0.30, 0.80, 0.05, 0.08],
        [1, 0, 0.60, 0.60, 0.20, 0.15],
        [1, 0, 0.15, 0.70, 0.50, 0.60],
        [1, 0, 0.80, 0.20, 0.08, 0.22],
    ]
    return np.asarray(rows, np.float32)


@pytest.mark.parametrize("cfg,use_ciou", [
    ("kaist_yolov3.cfg", False),
    ("kaist_yolov3.cfg", True),
    ("kaist_yolov4.cfg", True),
])
def test_loss_parity(cfg, use_ciou):
    path = f"/root/reference/config/{cfg}"
    YOLO = load_reference_yolo()
    torch.manual_seed(0)
    tm = YOLO(path, img_size=(64, 64), verbose=False)
    hyp = {"box": 3.54, "obj": 64.3, "cls": 37.4, "cls_pw": 1.0,
           "obj_pw": 1.0, "iou_t": 0.20, "fl_gamma": 0.0}
    if use_ciou:
        hyp["ciou"] = 1.0
    tm.hyp = hyp
    tm.gr = 1.0
    tm.nc = 1

    ir = compile_cfg(path)
    specs = LS.head_specs(ir)

    B = 2
    rng = np.random.default_rng(3)
    p_np = []
    for node in ir.head_nodes():
        s = node.yolo_stride
        ny = nx = 64 // s
        na, no = len(node.anchors), node.nc + 5
        p_np.append((rng.random((B, na, ny, nx, no), dtype=np.float32) * 4 - 2))

    t_np = _make_targets()

    ref = ref_utils.compute_loss([torch.from_numpy(p) for p in p_np],
                                 torch.from_numpy(t_np), tm)
    ref = {k: float(v) for k, v in ref.items()}

    labels = [t_np[t_np[:, 0] == b][:, 1:] for b in range(B)]
    targets, tmask = LS.pad_labels(labels, max_targets=8)
    mine = LS.compute_loss([jnp.asarray(p) for p in p_np],
                           jnp.asarray(targets), jnp.asarray(tmask),
                           specs, hyp)
    for k in ("box_loss", "obj_loss", "class_loss"):
        assert abs(float(mine[k]) - ref[k]) < 2e-4 * max(abs(ref[k]), 1.0), (
            cfg, k, float(mine[k]), ref[k])


def test_bce_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64,)).astype(np.float32) * 3
    t = (rng.random(64) > 0.5).astype(np.float32)
    for pw in (1.0, 2.5):
        ref = torch.nn.BCEWithLogitsLoss(
            pos_weight=torch.tensor([pw]), reduction="none")(
            torch.from_numpy(x), torch.from_numpy(t)).numpy()
        mine = np.asarray(LS.bce_with_logits(jnp.asarray(x), jnp.asarray(t), pw))
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=2e-4)


def test_focal_matches_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64,)).astype(np.float32) * 3
    t = (rng.random(64) > 0.5).astype(np.float32)
    fl = ref_utils.FocalLoss(torch.nn.BCEWithLogitsLoss(), gamma=1.5)
    ref = fl(torch.from_numpy(x), torch.from_numpy(t)).item()
    mine = float((LS.bce_with_logits(jnp.asarray(x), jnp.asarray(t))
                  * LS.focal_scale(jnp.asarray(x), jnp.asarray(t), 1.5)).mean())
    assert abs(mine - ref) < 1e-5


def test_class_loss_multiclass():
    """nc>1 masked class BCE equals a dense reference computation."""
    nc = 4
    rng = np.random.default_rng(2)
    B, T = 1, 4
    specs = [LS.HeadSpec(np.asarray([[1.0, 1.0]], np.float32), 8, "yolov3", nc)]
    p = rng.standard_normal((B, 1, 8, 8, 5 + nc)).astype(np.float32)
    targets = np.zeros((B, T, 5), np.float32)
    targets[0, :, 0] = [0, 1, 2, 3]
    targets[0, :, 1:3] = [[0.1, 0.1], [0.4, 0.4], [0.6, 0.6], [0.9, 0.9]]
    targets[0, :, 3:5] = 0.125  # wh == anchor -> wh_iou == 1 > iou_t
    tmask = np.ones((B, T), bool)
    hyp = {"box": 1.0, "obj": 1.0, "cls": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
           "iou_t": 0.2, "fl_gamma": 0.0}
    out = LS.compute_loss([jnp.asarray(p)], jnp.asarray(targets),
                          jnp.asarray(tmask), specs, hyp)
    # dense check: gather the 4 matched cells and compute BCE by hand
    cells = (targets[0, :, 1:3] * 8).astype(int)
    ps = p[0, 0, cells[:, 1], cells[:, 0], 5:]
    tc = np.eye(nc, dtype=np.float32)[[0, 1, 2, 3]]
    ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(ps),
                                       torch.from_numpy(tc)).item()
    assert abs(float(out["class_loss"]) - ref) < 1e-5
