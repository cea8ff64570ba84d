"""Metric parity: VOC-AP / LAMR against the reference implementation
(other_utils/metrics.py), and sanity properties of the COCO-style evaluator."""

import copy

import numpy as np
import pytest

from double_yolo_kaist_tpu.eval import metrics as MET
from double_yolo_kaist_tpu.eval.coco_map import evaluate_coco

from tests.torch_ref import load_reference_yolo

load_reference_yolo()
from other_utils import metrics as ref_metrics  # noqa: E402


def _synthetic_split(seed=0, n_imgs=40, w=640, h=512):
    """Labels + predictions with a mix of hits, misses and false positives."""
    rng = np.random.default_rng(seed)
    labels, preds = [], []
    for i in range(n_imgs):
        # >=1 gt per image: the reference crashes on empty-label images
        # (metrics.py:125-126 argmax of empty); KAIST splits guarantee this
        n = rng.integers(1, 5)
        l = np.zeros((n, 5), np.float32)
        if n:
            l[:, 1] = rng.uniform(0.2, 0.8, n)
            l[:, 2] = rng.uniform(0.2, 0.8, n)
            l[:, 3] = rng.uniform(0.05, 0.25, n)
            l[:, 4] = rng.uniform(0.05, 0.3, n)
        labels.append(l)
        # detections: jittered copies of gts + random false positives
        for j in range(n):
            if rng.random() < 0.8:
                cx, cy, bw, bh = l[j, 1] * w, l[j, 2] * h, l[j, 3] * w, l[j, 4] * h
                jit = rng.normal(0, 2, 4)
                preds.append({"img_id": i,
                              "conf": float(rng.uniform(0.3, 1.0)),
                              "bbox": np.asarray([cx - bw / 2 + jit[0],
                                                  cy - bh / 2 + jit[1],
                                                  cx + bw / 2 + jit[2],
                                                  cy + bh / 2 + jit[3]],
                                                 np.float32)})
        for _ in range(rng.integers(0, 3)):
            x1, y1 = rng.uniform(0, w - 60), rng.uniform(0, h - 60)
            preds.append({"img_id": i, "conf": float(rng.uniform(0.05, 0.6)),
                          "bbox": np.asarray(
                              [x1, y1, x1 + rng.uniform(20, 60),
                               y1 + rng.uniform(20, 60)], np.float32)})
    preds.sort(key=lambda p: -p["conf"])
    shapes = np.asarray([[w, h]] * n_imgs, np.float64)
    return preds, labels, shapes


@pytest.mark.parametrize("seed", [0, 1])
def test_ap_lamr_matches_reference(seed):
    preds, labels, shapes = _synthetic_split(seed)
    mine = MET.compute_ap_lamr(copy.deepcopy(preds), labels, shapes)
    # the reference mutates labels (metrics.py:114-115) — feed it copies
    ref = ref_metrics.compute_ap_lamr(
        copy.deepcopy(preds), [l.copy() for l in labels], shapes)
    assert abs(mine["ap"] - ref["ap"]) < 1e-9
    assert abs(mine["lamr"] - ref["lamr"]) < 1e-9
    np.testing.assert_allclose(mine["recall"], ref["recall"])
    np.testing.assert_allclose(mine["precision"], ref["precision"])
    np.testing.assert_allclose(mine["fppi"], ref["fppi"])


def test_ap_lamr_does_not_mutate_labels():
    preds, labels, shapes = _synthetic_split(2)
    snapshot = [l.copy() for l in labels]
    MET.compute_ap_lamr(preds, labels, shapes)
    out1 = MET.compute_ap_lamr(preds, labels, shapes)
    out2 = MET.compute_ap_lamr(preds, labels, shapes)
    for a, b in zip(labels, snapshot):
        np.testing.assert_array_equal(a, b)
    assert out1["ap"] == out2["ap"]


def test_coco_perfect_predictions():
    rng = np.random.default_rng(0)
    gt, pred = {}, {}
    for i in range(10):
        n = rng.integers(1, 4)
        x1 = rng.uniform(0, 500, n)
        y1 = rng.uniform(0, 400, n)
        bw = rng.uniform(40, 100, n)  # 'medium'/'large' areas
        bh = rng.uniform(40, 100, n)
        boxes = np.stack([x1, y1, x1 + bw, y1 + bh], 1)
        gt[i] = boxes
        pred[i] = (boxes.copy(), rng.uniform(0.5, 1.0, n))
    stats = evaluate_coco(pred, gt)
    assert stats[0] > 0.99   # AP@0.50:0.95
    assert stats[1] > 0.99   # AP@0.50
    assert stats[8] > 0.99   # AR@100


def test_coco_half_matched():
    """Half the gts detected perfectly, no false positives -> AP ~ 0.5."""
    gt, pred = {}, {}
    for i in range(20):
        boxes = np.asarray([[10, 10, 110, 110], [200, 200, 320, 330]], float)
        gt[i] = boxes
        pred[i] = (boxes[:1].copy(), np.asarray([0.9]))
    stats = evaluate_coco(pred, gt)
    assert 0.45 < stats[1] < 0.55
    assert 0.45 < stats[8] < 0.55


def test_coco_false_positives_lower_ap():
    gt, pred = {}, {}
    rng = np.random.default_rng(1)
    for i in range(10):
        boxes = np.asarray([[50, 50, 150, 170]], float)
        gt[i] = boxes
        # perfect hit at low conf + strong false positive
        pred[i] = (np.asarray([[50, 50, 150, 170], [300, 300, 380, 390]],
                              float),
                   np.asarray([0.6, 0.9]))
    stats = evaluate_coco(pred, gt)
    assert stats[1] < 0.9


def test_coco_image_with_zero_detections():
    """An image where the model produced NO detections must not crash the
    matcher (empty comprehension -> float64 array -> bitwise_or TypeError;
    hit in practice by an under-trained model's final-epoch in-train eval)."""
    gt = {0: np.array([[10.0, 10.0, 40.0, 60.0]]),
          1: np.array([[5.0, 5.0, 30.0, 50.0]])}
    pred = {0: (np.zeros((0, 4)), np.zeros((0,))),
            1: (np.array([[5.0, 5.0, 30.0, 50.0]]), np.array([0.9]))}
    stats = evaluate_coco(pred, gt)
    assert stats.shape == (12,)
    assert np.isfinite(stats[stats >= 0]).all()
    # the one matched image out of two: AP@0.5 should be ~0.5
    assert 0.2 <= stats[1] <= 0.8
