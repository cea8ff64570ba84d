"""On-device fixed-shape non-maximum suppression.

The reference runs ``torchvision.ops.nms`` (CUDA) per image after Python-side
boolean filtering (utils.py:387-464) — dynamic shapes at every step. On TPU
everything must be static: candidates are masked (score := -inf) instead of
dropped, reduced to a fixed ``top_k`` pool, then greedily suppressed with a
``fori_loop`` selecting ``max_det`` winners. Semantics (selection order, class
offsetting, thresholds, wh limits) match the reference so parity metrics carry
over. vmapped over the batch; everything stays in HBM/VMEM — zero host sync.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .boxes import box_iou, xywh2xyxy

NEG_INF = -1e10

# Optional Pallas kernel path (ops/pallas_nms.py): pool + IoU matrix stay
# VMEM-resident. Compiled-validated on v5e with index-exact parity. Measured
# (device-loop protocol, M=6000, K=512): standalone single-image kernel
# 200us vs 386us XLA, but inside the full vmapped non_max_suppression it is
# a wash — bs1 1.00x, bs4 1.10x, bs8 0.88x (XLA pipelines the per-image
# fori_loops across the batch; a vmapped pallas_call serializes its grid).
# Default OFF; DYK_NMS_PALLAS=1 opts in (small-batch serving). K is capped
# by scoped VMEM (16 MB): the f32 IoU matrix is K^2 * 4 B plus
# masks/intermediates, so K<=1024 is safe; larger pools use XLA regardless.
_PALLAS_NMS_MAX_K = 1024
_USE_PALLAS_NMS = os.environ.get("DYK_NMS_PALLAS", "0") != "0"


def nms_indices(boxes, scores, iou_thres: float, max_det: int):
    """Greedy NMS over a fixed pool. boxes (K, 4) xyxy, scores (K,).
    Returns (idx (max_det,), valid (max_det,)). Invalid slots have idx 0."""
    if (_USE_PALLAS_NMS and boxes.shape[0] <= _PALLAS_NMS_MAX_K
            and jax.default_backend() == "tpu"):
        from .pallas_nms import pallas_nms_indices
        return pallas_nms_indices(boxes, scores, iou_thres=float(iou_thres),
                                  max_det=int(max_det))
    iou = box_iou(boxes, boxes)           # (K, K) — one MXU-friendly batch op

    def body(_, carry):
        s, idxs, valids, n = carry
        i = jnp.argmax(s)
        ok = s[i] > NEG_INF / 2
        idxs = idxs.at[n].set(jnp.where(ok, i, 0))
        valids = valids.at[n].set(ok)
        # suppress the winner and everything overlapping it
        s = jnp.where(iou[i] > iou_thres, NEG_INF, s)
        s = s.at[i].set(NEG_INF)
        return s, idxs, valids, n + 1

    idxs = jnp.zeros((max_det,), jnp.int32)
    valids = jnp.zeros((max_det,), bool)
    _, idxs, valids, _ = jax.lax.fori_loop(
        0, max_det, body, (scores, idxs, valids, 0))
    return idxs, valids


def _single_image_nms(pred, conf_thres, iou_thres, multi_label,
                      top_k, max_det, min_wh, max_wh, agnostic, merge):
    """pred (M, 5+nc): xywh, obj, cls. Returns ((max_det, 6) xyxy/conf/cls,
    valid (max_det,))."""
    nc = pred.shape[-1] - 5
    obj = pred[:, 4]
    wh_ok = ((pred[:, 2:4] > min_wh) & (pred[:, 2:4] < max_wh)).all(-1)
    base_ok = (obj > conf_thres) & wh_ok
    boxes = xywh2xyxy(pred[:, :4])

    conf_mat = obj[:, None] * pred[:, 5:]          # (M, nc)
    if multi_label and nc > 1:
        scores_flat = jnp.where(
            base_ok[:, None] & (conf_mat > conf_thres), conf_mat, NEG_INF
        ).reshape(-1)                               # (M*nc,)
        k = min(top_k, scores_flat.shape[0])
        top_scores, flat_idx = jax.lax.top_k(scores_flat, k)
        box_idx = flat_idx // nc
        cls_idx = (flat_idx % nc).astype(jnp.float32)
    else:
        best = jnp.max(conf_mat, axis=-1)
        cls = jnp.argmax(conf_mat, axis=-1).astype(jnp.float32)
        scores = jnp.where(base_ok & (best > conf_thres), best, NEG_INF)
        k = min(top_k, scores.shape[0])
        top_scores, box_idx = jax.lax.top_k(scores, k)
        cls_idx = cls[box_idx]

    cand_boxes = boxes[box_idx]
    offset = jnp.zeros_like(cls_idx) if agnostic else cls_idx
    off_boxes = cand_boxes + offset[:, None] * max_wh
    keep, valid = nms_indices(off_boxes, top_scores, iou_thres, max_det)
    valid = valid & (top_scores[keep] > NEG_INF / 2)

    kept_boxes = cand_boxes[keep]
    if merge:
        # merge-NMS / weighted box fusion (reference utils.py:449-456): each
        # winner becomes the conf-weighted mean of every candidate whose
        # class-offset IoU with it exceeds the threshold
        overl = box_iou(off_boxes[keep], off_boxes) > iou_thres  # (max_det,K)
        w = overl * jnp.maximum(top_scores, 0.0)[None, :]
        den = w.sum(-1, keepdims=True)
        merged = (w @ cand_boxes) / jnp.maximum(den, 1e-12)
        kept_boxes = jnp.where(valid[:, None] & (den > 0), merged, kept_boxes)

    det = jnp.concatenate([kept_boxes,
                           top_scores[keep, None],
                           cls_idx[keep, None]], axis=-1)
    det = jnp.where(valid[:, None], det, 0.0)
    return det, valid


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "multi_label",
                                   "top_k", "max_det", "agnostic", "merge"))
def non_max_suppression(pred, conf_thres: float = 0.1, iou_thres: float = 0.6,
                        multi_label: bool = True, top_k: int = 512,
                        max_det: int = 100, min_wh: float = 2.0,
                        max_wh: float = 4096.0, agnostic: bool = False,
                        merge: bool = False):
    """Batched NMS on decoded predictions.

    Args:
      pred: (bs, M, 5+nc) — xywh (input pixels), obj conf, per-class conf.
      conf_thres/iou_thres/multi_label/max_det/min_wh/max_wh: reference
        utils.py:387-449 semantics (conf = obj*cls, class-offset batched NMS,
        top-``max_det`` detections).
      top_k: candidate pool per image before suppression (static).
      merge: merge-NMS / weighted box fusion (reference utils.py:449-456's
        ``merge=True`` path, off by default there too).

    Returns:
      det: (bs, max_det, 6) — x1, y1, x2, y2, conf, cls; zero-padded.
      valid: (bs, max_det) bool.
    """
    fn = partial(_single_image_nms, conf_thres=conf_thres,
                 iou_thres=iou_thres, multi_label=multi_label, top_k=top_k,
                 max_det=max_det, min_wh=min_wh, max_wh=max_wh,
                 agnostic=agnostic, merge=merge)
    return jax.vmap(fn)(pred)
