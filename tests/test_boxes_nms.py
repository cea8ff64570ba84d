"""Box geometry + fixed-shape NMS correctness.

IoU family is checked against the reference's own torch implementation
(utils.py:95-171) as an oracle; NMS is checked against a plain numpy greedy
suppression with torchvision semantics (descending score, suppress IoU>thres)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from double_yolo_kaist_tpu.ops import boxes as B
from double_yolo_kaist_tpu.ops.nms import non_max_suppression, nms_indices

from tests.torch_ref import load_reference_yolo

load_reference_yolo()  # sets up sys.path for reference imports
from build_utils import utils as ref_utils  # noqa: E402


def _rand_boxes(n, seed=0, scale=100.0):
    rng = np.random.default_rng(seed)
    xy = rng.random((n, 2), dtype=np.float32) * scale
    wh = rng.random((n, 2), dtype=np.float32) * scale * 0.5 + 1.0
    return np.concatenate([xy, xy + wh], -1)


def test_xywh_roundtrip():
    b = _rand_boxes(64)
    out = np.asarray(B.xywh2xyxy(B.xyxy2xywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("mode", ["iou", "giou", "diou", "ciou"])
def test_bbox_iou_vs_reference(mode):
    b1 = _rand_boxes(32, seed=1)
    b2 = _rand_boxes(32, seed=2)
    kw = {k: (k[0] == mode[0] and len(mode) > 3) for k in ("GIoU", "DIoU", "CIoU")}
    kw = {"GIoU": mode == "giou", "DIoU": mode == "diou", "CIoU": mode == "ciou"}
    ref = np.stack([
        ref_utils.bbox_iou(torch.from_numpy(b1[i]),
                           torch.from_numpy(b2[i:i + 1]), x1y1x2y2=True,
                           **kw).numpy()[0]
        for i in range(32)])
    mine = np.asarray(B.bbox_iou(jnp.asarray(b1), jnp.asarray(b2),
                                 giou=mode == "giou", diou=mode == "diou",
                                 ciou=mode == "ciou"))
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)


def test_box_iou_pairwise_vs_reference():
    b1, b2 = _rand_boxes(20, 3), _rand_boxes(30, 4)
    ref = ref_utils.box_iou(torch.from_numpy(b1), torch.from_numpy(b2)).numpy()
    mine = np.asarray(B.box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-6)


def test_wh_iou_vs_reference():
    wh1 = _rand_boxes(9, 5)[:, 2:]
    wh2 = _rand_boxes(40, 6)[:, 2:]
    ref = ref_utils.wh_iou(torch.from_numpy(wh1), torch.from_numpy(wh2)).numpy()
    mine = np.asarray(B.wh_iou(jnp.asarray(wh1), jnp.asarray(wh2)))
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


def _numpy_greedy_nms(boxes, scores, iou_thres):
    """torchvision.ops.nms semantics."""
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a1 + a2 - inter + 1e-16)
        alive &= iou <= iou_thres
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_indices_vs_numpy(seed):
    rng = np.random.default_rng(seed)
    boxes = _rand_boxes(100, seed)
    scores = rng.random(100).astype(np.float32)
    idx, valid = nms_indices(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 50)
    mine = np.asarray(idx)[np.asarray(valid)]
    ref = _numpy_greedy_nms(boxes, scores, 0.5)[:50]
    np.testing.assert_array_equal(mine, ref)


def test_full_nms_pipeline():
    """Batched xywh predictions -> detections; compare against a numpy
    emulation of reference utils.py:387-449 (best-class path)."""
    rng = np.random.default_rng(7)
    bs, m, nc = 2, 400, 3
    pred = np.zeros((bs, m, 5 + nc), np.float32)
    pred[..., 0:2] = rng.random((bs, m, 2)) * 400
    pred[..., 2:4] = rng.random((bs, m, 2)) * 80 + 4
    pred[..., 4] = rng.random((bs, m))
    pred[..., 5:] = rng.random((bs, m, nc))

    det, valid = non_max_suppression(jnp.asarray(pred), conf_thres=0.3,
                                     iou_thres=0.5, multi_label=False,
                                     top_k=256, max_det=20)
    det, valid = np.asarray(det), np.asarray(valid)

    for b in range(bs):
        p = pred[b]
        ok = (p[:, 4] > 0.3) & ((p[:, 2:4] > 2) & (p[:, 2:4] < 4096)).all(1)
        conf = p[:, 4:5] * p[:, 5:]
        best = conf.max(1)
        cls = conf.argmax(1)
        ok &= best > 0.3
        cand = np.where(ok)[0]
        boxes = np.asarray(B.xywh2xyxy(jnp.asarray(p[cand, :4])))
        off = cls[cand, None] * 4096.0
        keep = _numpy_greedy_nms(boxes + off, best[cand], 0.5)[:20]
        exp_boxes = boxes[[np.where(cand == cand[k])[0][0] for k in keep]]
        exp_boxes = boxes[keep]
        exp_scores = best[cand][keep]

        got = det[b][valid[b]]
        assert len(got) == len(keep)
        np.testing.assert_allclose(got[:, :4], exp_boxes, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got[:, 4], exp_scores, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got[:, 5].astype(int), cls[cand][keep])
