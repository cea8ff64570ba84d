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


def test_merge_nms_vs_numpy_oracle():
    """merge=True (weighted box fusion) vs a numpy oracle of the reference's
    merge path (utils.py:449-456: for each kept index i over candidate pool
    n, weights = (IoU(offset_boxes[i], offset_boxes[n]) > thr) * score[n];
    box[i] = sum_n w*box[n] / sum_n w). The reference hardcodes merge=False
    locally, so the oracle re-implements those 5 lines."""
    rng = np.random.default_rng(11)
    bs, m, nc = 2, 300, 1
    pred = np.zeros((bs, m, 5 + nc), np.float32)
    # clustered boxes so merging actually changes coordinates
    centers = rng.random((bs, 8, 2)) * 300 + 50
    for b in range(bs):
        for j in range(m):
            c = centers[b, rng.integers(0, 8)]
            pred[b, j, 0:2] = c + rng.normal(0, 3, 2)
            pred[b, j, 2:4] = rng.random(2) * 30 + 20
    pred[..., 4] = rng.random((bs, m))
    pred[..., 5:] = rng.random((bs, m, nc))

    det, valid = non_max_suppression(jnp.asarray(pred), conf_thres=0.3,
                                     iou_thres=0.5, multi_label=False,
                                     top_k=256, max_det=20, merge=True)
    det, valid = np.asarray(det), np.asarray(valid)

    for b in range(bs):
        p = pred[b]
        ok = (p[:, 4] > 0.3) & ((p[:, 2:4] > 2) & (p[:, 2:4] < 4096)).all(1)
        conf = p[:, 4:5] * p[:, 5:]
        best, cls = conf.max(1), conf.argmax(1)
        ok &= best > 0.3
        cand = np.where(ok)[0]
        boxes = np.asarray(B.xywh2xyxy(jnp.asarray(p[cand, :4])))
        off_boxes = boxes + cls[cand, None] * 4096.0
        scores = best[cand]
        keep = _numpy_greedy_nms(off_boxes, scores, 0.5)[:20]
        # the reference's merge step (utils.py:451-456)
        iou = np.asarray(B.box_iou(jnp.asarray(off_boxes[keep]),
                                   jnp.asarray(off_boxes))) > 0.5
        w = iou * scores[None, :]
        exp_boxes = (w @ boxes) / w.sum(1, keepdims=True)
        got = det[b][valid[b]]
        assert len(got) == len(keep)
        np.testing.assert_allclose(got[:, :4], exp_boxes, rtol=1e-4,
                                   atol=1e-2)
        np.testing.assert_allclose(got[:, 4], scores[keep], rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_array_equal(got[:, 5].astype(int), cls[cand][keep])


def test_merge_nms_identity_when_isolated():
    """Non-overlapping boxes: merge must be a no-op."""
    pred = np.zeros((1, 4, 6), np.float32)
    pred[0, :, 0] = [50, 200, 350, 500]
    pred[0, :, 1] = [50, 200, 350, 500]
    pred[0, :, 2:4] = 40
    pred[0, :, 4] = [0.9, 0.8, 0.7, 0.6]
    pred[0, :, 5] = 1.0
    a, va = non_max_suppression(jnp.asarray(pred), conf_thres=0.3,
                                multi_label=False, top_k=8, max_det=8)
    b, vb = non_max_suppression(jnp.asarray(pred), conf_thres=0.3,
                                multi_label=False, top_k=8, max_det=8,
                                merge=True)
    np.testing.assert_allclose(np.asarray(a)[np.asarray(va)],
                               np.asarray(b)[np.asarray(vb)], rtol=1e-5)
