"""YOLO loss + anchor-template target assignment, fixed-shape for XLA.

Reference semantics (build_utils/utils.py:209-384): per-scale wh-IoU>iou_t
multi-anchor matching, CIoU/GIoU box loss, BCE objectness with IoU-ratio soft
targets (tobj = (1-gr) + gr*iou), optional label-smoothed/focal BCE class loss,
hyp box/obj/cls weighting, and the v3-vs-v4 box regression formulas
(utils.py:252-262).

TPU re-design: the reference gathers a dynamic number of matched samples per
step; here labels are padded to a fixed (B, T, 5) block with a validity mask,
every (image, target, anchor) triple is a static candidate, and matching is a
boolean mask — losses are masked means and the objectness target is built with
a dropping scatter. The whole thing jits into the training step with no host
sync and is batch-shardable (each image's matches touch only its own rows).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_iou


class HeadSpec(NamedTuple):
    """Static per-scale metadata extracted from the IR yolo nodes."""
    anchors_vec: np.ndarray   # (na, 2) anchors in grid units (anchors/stride)
    stride: int
    bf_type: str              # 'yolov3' | 'yolov4'
    nc: int


def head_specs(ir) -> list:
    return [HeadSpec(np.asarray(n.anchors, np.float32) / n.yolo_stride,
                     n.yolo_stride, n.bf_type, n.nc)
            for n in ir.head_nodes()]


def bce_with_logits(x, t, pos_weight: float = 1.0):
    """Elementwise BCEWithLogits: t*pw*softplus(-x) + (1-t)*softplus(x)."""
    return t * pos_weight * jax.nn.softplus(-x) + (1.0 - t) * jax.nn.softplus(x)


def focal_scale(x, t, gamma: float, alpha: float = 0.25):
    """TF-style focal modulation of a BCE loss (reference utils.py:174-201)."""
    p = jax.nn.sigmoid(x)
    p_t = t * p + (1 - t) * (1 - p)
    alpha_f = t * alpha + (1 - t) * (1 - alpha)
    return alpha_f * jnp.power(1.0 - p_t, gamma)


def smooth_bce(eps: float = 0.0):
    """Positive/negative label-smoothing targets (reference utils.py:204-206)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def compute_loss(raw_heads, targets, tmask, specs, hyp, gr: float = 1.0):
    """Compute the 3-component YOLO loss.

    Args:
      raw_heads: list of per-scale raw predictions (B, na, ny, nx, no), fp32
        logits (output of graph.apply train mode).
      targets: (B, T, 5) padded labels [cls, cx, cy, w, h], normalized 0-1.
      tmask: (B, T) bool — which label rows are real.
      specs: list[HeadSpec] (from :func:`head_specs`).
      hyp: dict with box/obj/cls gains, cls_pw/obj_pw, iou_t, fl_gamma and
        optionally 'ciou' (reference hyp.scratch.4.yaml).
      gr: IoU-ratio for objectness targets (reference train.py:171, gr=1.0).

    Returns: dict {box_loss, obj_loss, class_loss} of scalars (hyp-weighted).
    """
    B, T = targets.shape[:2]
    use_ciou = "ciou" in hyp
    iou_t = hyp["iou_t"]
    fl_gamma = float(hyp.get("fl_gamma", 0.0) or 0.0)
    cp, cn = smooth_bce(0.0)

    # fp32 minimum; float64 heads keep double precision end to end so fp64
    # parity runs (tests/test_grad_parity.py) are not floored at fp32 noise
    fdt = jnp.promote_types(raw_heads[0].dtype, jnp.float32)

    lbox = jnp.zeros((), fdt)
    lobj = jnp.zeros((), fdt)
    lcls = jnp.zeros((), fdt)

    b_img = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, T, 1))

    for pi, spec in zip(raw_heads, specs):
        pi = pi.astype(fdt)
        _, na, ny, nx, no = pi.shape
        nc = spec.nc
        anchors = jnp.asarray(spec.anchors_vec)                  # (na, 2)

        # scale normalized labels to this grid (reference utils.py:328-339)
        gxy = targets[..., 1:3].astype(fdt) * jnp.asarray([nx, ny], fdt)  # (B,T,2)
        gwh = targets[..., 3:5].astype(fdt) * jnp.asarray([nx, ny], fdt)
        tcls = targets[..., 0].astype(jnp.int32)

        # anchor-template matching: wh-IoU(anchor, gt) > iou_t
        inter = jnp.minimum(gwh[..., None, :], anchors).prod(-1)     # (B,T,na)
        wh_iou = inter / (gwh.prod(-1)[..., None]
                          + anchors.prod(-1) - inter + 1e-16)
        match = tmask[..., None] & (wh_iou > iou_t)                  # (B,T,na)

        # flatten every (image, target, anchor) candidate
        m = match.reshape(-1)
        w_cnt = jnp.maximum(m.sum(), 1)
        bi = jnp.broadcast_to(b_img, (B, T, na)).reshape(-1)
        ai = jnp.broadcast_to(jnp.arange(na), (B, T, na)).reshape(-1)
        gxy_f = jnp.broadcast_to(gxy[:, :, None, :], (B, T, na, 2)).reshape(-1, 2)
        gwh_f = jnp.broadcast_to(gwh[:, :, None, :], (B, T, na, 2)).reshape(-1, 2)
        cls_f = jnp.broadcast_to(tcls[..., None], (B, T, na)).reshape(-1)

        gij = jnp.floor(gxy_f).astype(jnp.int32)
        gi = jnp.clip(gij[:, 0], 0, nx - 1)
        gj = jnp.clip(gij[:, 1], 0, ny - 1)

        ps = pi[bi, ai, gj, gi]                                       # (M, no)

        if spec.bf_type == "yolov4":
            pxy = jax.nn.sigmoid(ps[:, :2]) * 2.0 - 0.5
            pwh = jnp.square(jax.nn.sigmoid(ps[:, 2:4]) * 2.0) * anchors[ai]
        else:
            pxy = jax.nn.sigmoid(ps[:, :2])
            pwh = jnp.clip(jnp.exp(ps[:, 2:4]), max=1e3) * anchors[ai]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        tbox = jnp.concatenate([gxy_f - gij.astype(fdt), gwh_f], -1)

        iou = bbox_iou(pbox, tbox, xywh=True, ciou=use_ciou,
                       giou=not use_ciou)
        lbox += jnp.where(m, 1.0 - iou, 0.0).sum() / w_cnt

        # objectness soft target: scatter matched IoUs; invalid rows dropped
        # via out-of-bounds indices (reference utils.py:271)
        t_iou = (1.0 - gr) + gr * jnp.clip(jax.lax.stop_gradient(iou), 0.0)
        drop = jnp.where(m, bi, B)  # B is out of bounds -> dropped
        tobj = jnp.zeros((B, na, ny, nx), fdt)
        tobj = tobj.at[drop, ai, gj, gi].set(t_iou, mode="drop")

        obj_l = bce_with_logits(pi[..., 4], tobj, hyp["obj_pw"])
        if fl_gamma > 0:
            obj_l = obj_l * focal_scale(pi[..., 4], tobj, fl_gamma)
        lobj += obj_l.mean()

        if nc > 1:
            t_cls = jnp.full((ps.shape[0], nc), cn, fdt)
            t_cls = t_cls.at[jnp.arange(ps.shape[0]), cls_f].set(cp)
            cls_l = bce_with_logits(ps[:, 5:], t_cls, hyp["cls_pw"])
            if fl_gamma > 0:
                cls_l = cls_l * focal_scale(ps[:, 5:], t_cls, fl_gamma)
            lcls += jnp.where(m[:, None], cls_l, 0.0).sum() / (w_cnt * nc)

    return {"box_loss": lbox * hyp["box"],
            "obj_loss": lobj * hyp["obj"],
            "class_loss": lcls * hyp["cls"]}


def total_loss(loss_dict):
    return loss_dict["box_loss"] + loss_dict["obj_loss"] + loss_dict["class_loss"]


def pad_labels(label_list, max_targets: int):
    """Host-side: list of per-image (n_i, 5) [cls,cx,cy,w,h] arrays ->
    ((B, T, 5), (B, T) mask). Truncates images with more than T labels."""
    B = len(label_list)
    out = np.zeros((B, max_targets, 5), np.float32)
    mask = np.zeros((B, max_targets), bool)
    for i, l in enumerate(label_list):
        n = min(len(l), max_targets)
        if n:
            out[i, :n] = l[:n]
            mask[i, :n] = True
    return out, mask
