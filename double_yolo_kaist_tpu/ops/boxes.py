"""Box geometry ops (pure jnp, batched, differentiable where it matters).

Functional equivalents of the reference's box helpers
(utils.py:40-171): xyxy<->xywh, letterbox undo (scale_coords), clipping,
elementwise IoU/GIoU/DIoU/CIoU (used by the loss), pairwise IoU and wh-IoU
(used by NMS and the target assigner). All functions accept leading batch
dims; nothing mutates in place.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xyxy2xywh(x):
    """[..., 4] corners -> center/size."""
    cx = (x[..., 0] + x[..., 2]) * 0.5
    cy = (x[..., 1] + x[..., 3]) * 0.5
    w = x[..., 2] - x[..., 0]
    h = x[..., 3] - x[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def xywh2xyxy(x):
    """[..., 4] center/size -> corners."""
    hw = x[..., 2] * 0.5
    hh = x[..., 3] * 0.5
    return jnp.stack([x[..., 0] - hw, x[..., 1] - hh,
                      x[..., 0] + hw, x[..., 1] + hh], axis=-1)


def clip_coords(boxes, shape_hw):
    """Clip xyxy boxes to image bounds (h, w)."""
    h, w = shape_hw
    return jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                      jnp.clip(boxes[..., 1], 0, h),
                      jnp.clip(boxes[..., 2], 0, w),
                      jnp.clip(boxes[..., 3], 0, h)], axis=-1)


def scale_coords(img1_hw, coords, img0_hw, ratio_pad=None):
    """Undo letterbox: map xyxy boxes from the network frame ``img1_hw`` back
    to the original frame ``img0_hw`` (reference utils.py:60-84).

    ``ratio_pad = ((gain_w, gain_h) or scalar gain, (pad_w, pad_h))`` when the
    exact letterbox parameters are known; otherwise they're derived.
    """
    if ratio_pad is None:
        gain = max(img1_hw) / max(img0_hw)
        pad = ((img1_hw[1] - img0_hw[1] * gain) / 2,
               (img1_hw[0] - img0_hw[0] * gain) / 2)
    else:
        gain = ratio_pad[0][0] if hasattr(ratio_pad[0], "__len__") else ratio_pad[0]
        pad = ratio_pad[1]
    out = jnp.stack([coords[..., 0] - pad[0], coords[..., 1] - pad[1],
                     coords[..., 2] - pad[0], coords[..., 3] - pad[1]],
                    axis=-1) / gain
    return clip_coords(out, img0_hw)


def bbox_iou(box1, box2, xywh: bool = False, giou: bool = False,
             diou: bool = False, ciou: bool = False, eps: float = 1e-16):
    """Elementwise IoU family over broadcastable [..., 4] boxes
    (reference utils.py:95-138; CIoU per Zheng et al. 2019)."""
    if xywh:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
    else:
        b1, b2 = box1, box2
    b1x1, b1y1, b1x2, b1y2 = b1[..., 0], b1[..., 1], b1[..., 2], b1[..., 3]
    b2x1, b2y1, b2x2, b2y2 = b2[..., 0], b2[..., 1], b2[..., 2], b2[..., 3]

    inter = (jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
             * jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = (w1 * h1 + eps) + w2 * h2 - inter
    iou = inter / union

    if not (giou or diou or ciou):
        return iou
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if giou:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    c2 = cw * cw + ch * ch + eps
    rho2 = (jnp.square((b2x1 + b2x2) - (b1x1 + b1x2))
            + jnp.square((b2y1 + b2y2) - (b1y1 + b1y2))) / 4.0
    if diou:
        return iou - rho2 / c2
    v = (4.0 / math.pi ** 2) * jnp.square(
        jnp.arctan(w2 / jnp.maximum(h2, eps)) - jnp.arctan(w1 / jnp.maximum(h1, eps)))
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))
    return iou - (rho2 / c2 + v * alpha)


def box_iou(box1, box2, eps: float = 1e-16):
    """Pairwise IoU: (N, 4) x (M, 4) xyxy -> (N, M) (reference utils.py:141-163)."""
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:], box2[None, :, 2:])
    inter = jnp.clip(rb - lt, 0).prod(-1)
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def wh_iou(wh1, wh2):
    """Template IoU of width/height pairs: (N, 2) x (M, 2) -> (N, M)
    (reference utils.py:166-171; anchors matched as if co-centered)."""
    inter = jnp.minimum(wh1[:, None, :], wh2[None, :, :]).prod(-1)
    return inter / (wh1.prod(-1)[:, None] + wh2.prod(-1)[None, :] - inter)
