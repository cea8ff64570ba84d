"""Native C++ matchers must agree exactly with the numpy fallbacks."""

import numpy as np
import pytest

from double_yolo_kaist_tpu.eval import coco_map
from double_yolo_kaist_tpu.eval import metrics as MET
from double_yolo_kaist_tpu.utils import native as NAT


@pytest.fixture(scope="module")
def lib():
    lib = NAT.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_greedy_match_native_vs_numpy(lib, monkeypatch):
    rng = np.random.default_rng(0)
    n_imgs = 10
    gt_xyxy = []
    for _ in range(n_imgs):
        n = rng.integers(1, 5)
        x1 = rng.uniform(0, 400, n)
        y1 = rng.uniform(0, 300, n)
        gt_xyxy.append(np.stack([x1, y1, x1 + rng.uniform(20, 80, n),
                                 y1 + rng.uniform(20, 80, n)], 1)
                       .astype(np.int32))
    preds = []
    for i in range(n_imgs):
        for g in gt_xyxy[i]:
            preds.append({"img_id": i, "conf": float(rng.random()),
                          "bbox": g.astype(np.float32)
                          + rng.normal(0, 3, 4).astype(np.float32)})
        preds.append({"img_id": i, "conf": float(rng.random()),
                      "bbox": rng.uniform(0, 300, 4).astype(np.float32)})
    preds.sort(key=lambda p: -p["conf"])

    tp_n, fp_n = MET._match_preds(preds, gt_xyxy)

    monkeypatch.setattr(NAT, "get_lib", lambda: None)  # force numpy path
    tp_p, fp_p = MET._match_preds(preds, gt_xyxy)
    np.testing.assert_array_equal(tp_n, tp_p)
    np.testing.assert_array_equal(fp_n, fp_p)


def test_coco_match_native_vs_numpy(lib, monkeypatch):
    rng = np.random.default_rng(1)
    D, G = 12, 6
    dets = np.sort(rng.uniform(0, 300, (D, 2, 2)), axis=1).reshape(D, 4)
    gts = np.sort(rng.uniform(0, 300, (G, 2, 2)), axis=1).reshape(G, 4)
    gt_ignore = np.zeros(G, bool)
    gt_ignore[-2:] = True
    scores = np.sort(rng.random(D))[::-1]

    out_native = coco_map._evaluate_image(dets, scores, gts, (0, 1e10), 100)

    monkeypatch.setattr(NAT, "coco_match", lambda *a: None)
    out_numpy = coco_map._evaluate_image(dets, scores, gts, (0, 1e10), 100)

    for a, b in zip(out_native, out_numpy):
        np.testing.assert_array_equal(a, b)
