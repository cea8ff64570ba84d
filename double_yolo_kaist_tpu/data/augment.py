"""Batched, jittable, RNG-keyed image augmentation — the on-device input
pipeline.

The reference runs its entire augmentation stack per-sample on the host with
OpenCV inside DataLoader worker processes (SURVEY.md §3.4; reference
kaist_dataset.py:321-388, img_utils.py:5-53, snowflake.py:7-93). On TPU the
host is the bottleneck (this box has one CPU core), so every transform here is
a pure batched jnp function over uint8/float NHWC tensors, keyed by
``jax.random`` — the host only decodes JPEGs.

Geometric semantics follow the reference so labels stay aligned:
  * letterbox: aspect-preserving resize + symmetric pad (img_utils.py:5-53);
  * mosaic-4 ("quadra"): 4 image pairs around a random center in a 2s x 2s
    canvas (kaist_dataset.py:213-286);
  * random affine: rotate/scale/translate/shear via inverse-warp bilinear
    sampling, with the reference's degenerate-box filter
    (kaist_dataset.py:408-479);
  * HSV jitter with shared gains across both modalities
    (kaist_dataset.py:482-506);
  * snowflake cutout + label drop by cover-IoU (snowflake.py:54-93);
  * CLAHE (4x4 tiles, clip 1.0) in clahe.py;
  * 50% horizontal flip (kaist_dataset.py:362-369).

All label tensors are fixed-shape (B, T, 5) [cls, cx, cy, w, h] + mask; boxes
are carried in absolute xyxy pixels through the geometric ops and only
converted to normalized xywh at the end (matching the reference's ordering).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


# ----------------------------------------------------- resample as matmuls
#
# TPU-native formulation of the geometric stages. Gathers on TPU run far
# below HBM bandwidth (~55 GB/s measured on canvas-shaped row+column takes,
# tools/archive/layout_probe.py — layout-independent), which made
# resize/mosaic/affine ~90% of the round-3 augment cost (30.6 of 32.5
# ms/batch, tools/fused_train_probe.py --stages). Every one of those stages
# is a SEPARABLE axis resample: out = RowM @ img @ ColM^T per channel,
# where RowM/ColM have <=2 nonzeros per row — bilinear taps (resize,
# axis-aligned affine) or shifted indicators (mosaic paste). As matmuls the
# data movement rides the MXU at a tiny FLOP cost instead of the gather
# unit. Tap positions, index clipping, zero-border masks, and lerp weights
# replicate the gather implementations exactly; the only numeric difference
# is accumulation (f32 matmul accumulate vs chained elementwise lerp) —
# LSB-level, bounded by tests/test_augment_mm.py.


def _matmul_resample(img, rm, cm):
    """img (..., H, W, C) x rm (..., H', H) x cm (..., W', W) ->
    (..., H', W', C); leading dims of rm/cm broadcast against img's.
    f32 accumulation (HIGHEST precision: on TPU the MXU's bf16 passes would
    otherwise truncate f32 pixels; rows have <=2 nonzero taps so this is
    the gather path's lerp arithmetic, f32-accumulated)."""
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("...hwc,...oh->...owc", img, rm, precision=hp,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("...owc,...pw->...opc", y, cm, precision=hp,
                   preferred_element_type=jnp.float32)
    return y.astype(img.dtype)


def _lerp_matrix_resize(out_n: int, in_n: int, scale: float, dtype):
    """Static resize interpolation matrix: EXACTLY resize_bilinear's taps
    (half-pixel centers, clipped base index, weight clipped to [0,1], second
    tap min(i0+1, n-1); coincident taps accumulate to weight 1)."""
    c = (np.arange(out_n, dtype=np.float32) + 0.5) * scale - 0.5
    i0 = np.clip(np.floor(c), 0, in_n - 1)
    w = np.clip(c - i0, 0.0, 1.0)
    i1 = np.minimum(i0 + 1, in_n - 1)
    m = np.zeros((out_n, in_n), np.float32)
    np.add.at(m, (np.arange(out_n), i0.astype(np.int64)), 1.0 - w)
    np.add.at(m, (np.arange(out_n), i1.astype(np.int64)), w)
    return jnp.asarray(m.astype(dtype))


def resize_bilinear_mm(img, out_h: int, out_w: int, dtype=jnp.float32):
    """resize_bilinear as two static-matrix matmuls (same taps/weights)."""
    x = img.astype(dtype)
    h, w = x.shape[-3], x.shape[-2]
    rm = _lerp_matrix_resize(out_h, h, h / out_h, dtype)
    cm = _lerp_matrix_resize(out_w, w, w / out_w, dtype)
    return _matmul_resample(x, rm, cm)


def _lerp_matrix_warp(src_pos, in_n: int, dtype):
    """Dynamic warp interpolation matrix: EXACTLY _warp_bilinear's separable
    taps — floor base (no clip on the weight), taps at clip(i,0,n-1), each
    masked by its own in-bounds test (zero border)."""
    i0 = jnp.floor(src_pos)
    w = (src_pos - i0).astype(dtype)
    ar = jnp.arange(in_n, dtype=jnp.float32)

    def tap(i, tw):
        inb = (i >= 0) & (i < in_n)
        ic = jnp.clip(i, 0, in_n - 1)
        return jnp.where(inb[..., None],
                         (ar == ic[..., None]).astype(dtype) * tw[..., None],
                         jnp.zeros((), dtype))

    return tap(i0, 1.0 - w) + tap(i0 + 1, w)


def _shift_matrix(offset, lo, hi, out_n: int, in_n: int, dtype):
    """Mosaic paste row/col matrix: indicator of src = clip(out - offset)
    masked to out in [lo, hi) — EXACTLY mosaic_place's clipped take +
    rectangular `inside` mask, separated per axis."""
    yy = jnp.arange(out_n, dtype=jnp.int32)
    src = jnp.clip(yy - offset, 0, in_n - 1)
    inr = (yy >= lo) & (yy < hi)
    ar = jnp.arange(in_n, dtype=jnp.int32)
    return ((ar[None, :] == src[:, None]) & inr[:, None]).astype(dtype)


# -------------------------------------------------------------- resize / pad

def resize_bilinear(img, out_h: int, out_w: int, dtype=jnp.float32):
    """cv2.INTER_LINEAR-compatible bilinear resize (half-pixel centers).
    img: (..., H, W, C) float or uint8 -> ``dtype``.

    ``dtype``: pixel compute/storage dtype. bfloat16 halves the HBM bytes
    of the gather+lerp (the train-augment pixel path is bandwidth-bound);
    sample COORDINATES always stay float32 — only the pixel values and
    lerp weights are reduced."""
    x = img.astype(dtype)
    h, w = x.shape[-3], x.shape[-2]
    sy, sx = h / out_h, w / out_w
    yc = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5
    xc = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(yc), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xc), 0, w - 1)
    wy = jnp.clip(yc - y0, 0.0, 1.0).astype(dtype)
    wx = jnp.clip(xc - x0, 0.0, 1.0).astype(dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    top = (x[..., y0i, :, :][..., :, x0i, :] * (1 - wx)[:, None]
           + x[..., y0i, :, :][..., :, x1i, :] * wx[:, None])
    bot = (x[..., y1i, :, :][..., :, x0i, :] * (1 - wx)[:, None]
           + x[..., y1i, :, :][..., :, x1i, :] * wx[:, None])
    return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]


def letterbox_params(src_hw, dst_hw, scale_up: bool = True):
    """Static letterbox math (python floats; shapes are static under jit).
    Returns (ratio, (dw, dh), (new_w, new_h)) as in reference img_utils.py."""
    r = min(dst_hw[0] / src_hw[0], dst_hw[1] / src_hw[1])
    if not scale_up:
        r = min(r, 1.0)
    new_w, new_h = int(round(src_hw[1] * r)), int(round(src_hw[0] * r))
    dw, dh = (dst_hw[1] - new_w) / 2, (dst_hw[0] - new_h) / 2
    return r, (dw, dh), (new_w, new_h)


def letterbox_batch(imgs, dst_hw, scale_up: bool = True, pad_value: float = 0.0):
    """Batched letterbox: (B, H, W, C) -> (B, dst_h, dst_w, C) float32.
    Returns (imgs, ratio, (dw, dh))."""
    src_hw = imgs.shape[1:3]
    r, (dw, dh), (new_w, new_h) = letterbox_params(src_hw, dst_hw, scale_up)
    if (new_h, new_w) != tuple(src_hw):
        x = resize_bilinear(imgs, new_h, new_w)
    else:
        x = imgs.astype(jnp.float32)
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    bottom = dst_hw[0] - new_h - top
    right = dst_hw[1] - new_w - left
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=pad_value)
    return x, r, (dw, dh)


def letterbox_labels(labels, src_hw, ratio, pad):
    """Normalized xywh labels -> absolute xyxy in the letterboxed frame
    (reference kaist_dataset.py:298-306)."""
    h, w = src_hw
    cx, cy = labels[..., 1] * w * ratio, labels[..., 2] * h * ratio
    bw, bh = labels[..., 3] * w * ratio, labels[..., 4] * h * ratio
    return jnp.stack([labels[..., 0],
                      cx - bw / 2 + pad[0], cy - bh / 2 + pad[1],
                      cx + bw / 2 + pad[0], cy + bh / 2 + pad[1]], axis=-1)


# ------------------------------------------------------------- affine warp

def _affine_matrices(key, batch: int, src_hw, degrees, translate, scale,
                     shear, border: int):
    """Per-image forward affine M = S @ T @ R (reference
    kaist_dataset.py:427-444). Returns (M (B,3,3), s (B,))."""
    h, w = src_hw
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    a = jax.random.uniform(k1, (batch,), minval=-degrees, maxval=degrees)
    s = jax.random.uniform(k2, (batch,), minval=1 - scale, maxval=1 + scale)
    tx = jax.random.uniform(k3, (batch,), minval=-translate,
                            maxval=translate) * h + border
    ty = jax.random.uniform(k4, (batch,), minval=-translate,
                            maxval=translate) * w + border
    sh = jax.random.uniform(k5, (batch, 2), minval=-shear, maxval=shear)

    rad = a * math.pi / 180.0
    cos, sin = jnp.cos(rad) * s, jnp.sin(rad) * s
    cx, cy = w / 2.0, h / 2.0
    # cv2.getRotationMatrix2D(center, angle, scale): rotation about center
    r00, r01 = cos, sin
    r10, r11 = -sin, cos
    r02 = (1 - cos) * cx - sin * cy
    r12 = sin * cx + (1 - cos) * cy
    zeros = jnp.zeros_like(cos)
    ones = jnp.ones_like(cos)
    R = jnp.stack([jnp.stack([r00, r01, r02], -1),
                   jnp.stack([r10, r11, r12], -1),
                   jnp.stack([zeros, zeros, ones], -1)], -2)
    T = jnp.stack([jnp.stack([ones, zeros, tx], -1),
                   jnp.stack([zeros, ones, ty], -1),
                   jnp.stack([zeros, zeros, ones], -1)], -2)
    t0 = jnp.tan(sh[:, 0] * math.pi / 180.0)
    t1 = jnp.tan(sh[:, 1] * math.pi / 180.0)
    S = jnp.stack([jnp.stack([ones, t0, zeros], -1),
                   jnp.stack([t1, ones, zeros], -1),
                   jnp.stack([zeros, zeros, ones], -1)], -2)
    return S @ T @ R, s


def _warp_bilinear(img, minv, out_h: int, out_w: int,
                   separable: bool = False):
    """Inverse-warp one image with bilinear sampling, zero border
    (cv2.warpAffine INTER_LINEAR semantics).

    ``separable`` (static): the caller asserts the affine is axis-aligned
    (degrees == shear == 0, so minv[0,1] == minv[1,0] == 0 — true for every
    shipped KAIST hyp). The sample coordinate then factors as
    src_x(gx), src_y(gy) and the 4-tap gather becomes one row gather + one
    column gather with 1-D indices — ~5x faster on TPU than the per-pixel
    2-D gather (which lowers to scalar-granularity HBM traffic) and
    bit-identical: same clipped indices, same lerp order, same zero-border
    mask.

    Pixel dtype follows the input when it is floating (the reduced-precision
    pixel path feeds bf16); u8 input is promoted to float32. Coordinates are
    always float32."""
    x = img if jnp.issubdtype(img.dtype, jnp.floating) \
        else img.astype(jnp.float32)
    h, w = x.shape[0], x.shape[1]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)

    if separable:
        src_x = minv[0, 0] * xs + minv[0, 2]          # (out_w,)
        src_y = minv[1, 1] * ys + minv[1, 2]          # (out_h,)
        x0 = jnp.floor(src_x)
        y0 = jnp.floor(src_y)
        wx = (src_x - x0)[None, :, None].astype(x.dtype)
        wy = (src_y - y0)[:, None, None].astype(x.dtype)

        def take_rows(yi):
            inb = (yi >= 0) & (yi < h)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            return jnp.take(x, yc, axis=0), inb[:, None, None]

        def take_cols(rows, xi):
            inb = (xi >= 0) & (xi < w)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            return jnp.take(rows, xc, axis=1), inb[None, :, None]

        r0, iy0 = take_rows(y0)
        r1, iy1 = take_rows(y0 + 1)
        v00, ix0 = take_cols(r0, x0)
        v01, ix1 = take_cols(r0, x0 + 1)
        v10, _ = take_cols(r1, x0)
        v11, _ = take_cols(r1, x0 + 1)
        z = jnp.zeros_like(v00)
        v00 = jnp.where(iy0 & ix0, v00, z)
        v01 = jnp.where(iy0 & ix1, v01, z)
        v10 = jnp.where(iy1 & ix0, v10, z)
        v11 = jnp.where(iy1 & ix1, v11, z)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    gx, gy = jnp.meshgrid(xs, ys)               # (out_h, out_w)
    src_x = minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]
    src_y = minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = (src_x - x0).astype(x.dtype)
    wy = (src_y - y0).astype(x.dtype)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return jnp.where(inb[..., None], x[yc, xc], 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def random_affine_batch(key, v_imgs, l_imgs, labels, lmask, *,
                        degrees=0.0, translate=0.0, scale=0.0, shear=0.0,
                        border: int = 0, Ms=None, separable=None,
                        resample: str = "gather"):
    """Batched random affine of both modalities + label transform.

    labels: (B, T, 5) [cls, x1, y1, x2, y2] absolute in the source frame.
    Output frame is (H + 2*border, W + 2*border) (border < 0 shrinks, as the
    mosaic path uses border = -s//2). Returns (v, l, labels, mask).

    ``Ms``: optional pre-sampled (M (B,3,3), s (B,)) from _affine_matrices —
    the chunked pipeline samples once at full batch shape and feeds slices
    (pipeline.make_train_augment_fn), keeping the random stream identical to
    the unchunked path; ``key`` is ignored then.

    ``separable`` (static): use the fast axis-aligned warp — valid iff
    degrees == shear == 0. Defaults from the degrees/shear args; callers
    that pre-sample ``Ms`` MUST pass it explicitly (enforced — the
    degrees/shear defaults say nothing about matrices sampled elsewhere,
    and silently taking the separable path would warp pixels axis-aligned
    while the label transform below uses the full rotated M).

    ``resample`` (static): "gather" (the vmapped _warp_bilinear) or
    "matmul" (separable only — per-image lerp matrices applied on the MXU,
    see _matmul_resample; same taps/clips/borders, f32 accumulation)."""
    B, H, W = v_imgs.shape[0], v_imgs.shape[1], v_imgs.shape[2]
    out_h, out_w = H + border * 2, W + border * 2
    if separable is None:
        if Ms is not None:
            raise ValueError(
                "random_affine_batch: pass separable= explicitly when "
                "supplying pre-sampled Ms (whether the matrices are "
                "axis-aligned is not inferable from the degrees/shear "
                "defaults)")
        separable = (degrees == 0.0 and shear == 0.0)
    if Ms is None:
        Ms = _affine_matrices(key, B, (H, W), degrees, translate, scale,
                              shear, border)
    M, s = Ms
    Minv = jnp.linalg.inv(M)
    if resample == "matmul" and separable:
        dtype = (v_imgs.dtype if jnp.issubdtype(v_imgs.dtype, jnp.floating)
                 else jnp.float32)
        xs_c = jnp.arange(out_w, dtype=jnp.float32)
        ys_c = jnp.arange(out_h, dtype=jnp.float32)
        src_x = Minv[:, 0, 0, None] * xs_c + Minv[:, 0, 2, None]   # (B, W')
        src_y = Minv[:, 1, 1, None] * ys_c + Minv[:, 1, 2, None]   # (B, H')
        rm = _lerp_matrix_warp(src_y, H, dtype)                    # (B,H',H)
        cm = _lerp_matrix_warp(src_x, W, dtype)                    # (B,W',W)
        v_out = _matmul_resample(v_imgs.astype(dtype), rm, cm)
        l_out = _matmul_resample(l_imgs.astype(dtype), rm, cm)
    else:
        warp = jax.vmap(partial(_warp_bilinear, out_h=out_h, out_w=out_w,
                                separable=separable))
        v_out = warp(v_imgs, Minv)
        l_out = warp(l_imgs, Minv)

    # transform the 4 corners of every box (reference kaist_dataset.py:452-462)
    x1, y1 = labels[..., 1], labels[..., 2]
    x2, y2 = labels[..., 3], labels[..., 4]
    corners = jnp.stack([
        jnp.stack([x1, y1], -1), jnp.stack([x2, y2], -1),
        jnp.stack([x1, y2], -1), jnp.stack([x2, y1], -1)], axis=-2)  # (B,T,4,2)
    ones = jnp.ones(corners.shape[:-1] + (1,))
    pts = jnp.concatenate([corners, ones], -1)                        # (B,T,4,3)
    warped = jnp.einsum("btki,bji->btkj", pts, M)[..., :2]
    nx1 = jnp.clip(warped[..., 0].min(-1), 0, out_w)
    ny1 = jnp.clip(warped[..., 1].min(-1), 0, out_h)
    nx2 = jnp.clip(warped[..., 0].max(-1), 0, out_w)
    ny2 = jnp.clip(warped[..., 1].max(-1), 0, out_h)

    bw, bh = nx2 - nx1, ny2 - ny1
    area_new = bw * bh
    area_old = (x2 - x1) * (y2 - y1)
    ar = jnp.maximum(bw / (bh + 1e-16), bh / (bw + 1e-16))
    keep = ((bw > 4) & (bh > 4)
            & (area_new / (area_old * s[:, None] + 1e-16) > 0.2) & (ar < 10))
    new_labels = jnp.stack([labels[..., 0], nx1, ny1, nx2, ny2], -1)
    return v_out, l_out, new_labels, lmask & keep


# -------------------------------------------------------------- mosaic-4

def mosaic4(key, v_imgs, l_imgs, labels, lmask, img_size: int,
            partner_idx=None):
    """Mosaic ("quadra") batch transform: group each image with 3 partners
    around a random center in a (2s, 2s) canvas
    (reference kaist_dataset.py:213-286). Inputs are the already size-s
    squares produced by load_image+resize; labels (B, T, 5) absolute xyxy in
    the s x s frame. Output: (B, 2s, 2s, C) canvases + (B, 4T, 5) labels.

    ``partner_idx``: optional (B, 3) int array of partner positions in the
    input arrays (which may then be LONGER than B — canvases are built for
    the first B entries only). The host samples these uniformly over the
    WHOLE epoch, matching the reference's dataset-wide partner draw
    (kaist_dataset.py:230: 3x random.randint(0, n-1) per image) — see
    pipeline.train_batches. Without it, partners are drawn on device from
    the batch itself (self-contained fallback for direct callers)."""
    s = img_size
    if partner_idx is not None:
        B = partner_idx.shape[0]
        centers = jax.random.randint(key, (B, 2), int(s * 0.5),
                                     int(s * 1.5) + 1)
        partners = partner_idx
    else:
        B = v_imgs.shape[0]
        k_center, k_partner = jax.random.split(key)
        centers = jax.random.randint(k_center, (B, 2), int(s * 0.5),
                                     int(s * 1.5) + 1)
        partners = jax.random.randint(k_partner, (B, 3), 0, B)
    idx = jnp.concatenate([jnp.arange(B)[:, None], partners], axis=1)  # (B,4)
    return mosaic_place(v_imgs[idx], l_imgs[idx], labels[idx], lmask[idx],
                        centers, img_size)


def mosaic_place(v4, l4, lab4, lm4, centers, img_size: int):
    """The deterministic half of mosaic4: paste pre-gathered 4-tile groups
    (B, 4, h, w, C) around given centers (B, 2). Split out so the chunked
    pipeline can gather + paste per chunk while centers/partners are sampled
    once at full batch shape (bit-identical streams)."""
    s = img_size

    def place_one(vi, li, lab, lm, center):
        xr, yr = center[0], center[1]
        canvas_v = jnp.zeros((2 * s, 2 * s, vi.shape[-1]), vi.dtype)
        canvas_l = jnp.zeros_like(canvas_v)
        out_lab, out_m = [], []
        h, w = vi.shape[1], vi.shape[2]  # source tiles may be rectangular
        for i in range(4):
            # quadrant corners (reference kaist_dataset.py:239-249)
            if i == 0:
                x1a, y1a = jnp.maximum(xr - w, 0), jnp.maximum(yr - h, 0)
                x2a, y2a = xr, yr
            elif i == 1:
                x1a, y1a = xr, jnp.maximum(yr - h, 0)
                x2a, y2a = jnp.minimum(xr + w, 2 * s), yr
            elif i == 2:
                x1a, y1a = jnp.maximum(xr - w, 0), yr
                x2a, y2a = xr, jnp.minimum(2 * s, yr + h)
            else:
                x1a, y1a = xr, yr
                x2a, y2a = jnp.minimum(xr + w, 2 * s), jnp.minimum(2 * s, yr + h)
            # source offsets: pad = dst_corner - src_corner
            # (reference kaist_dataset.py:239-254 x1b/y1b per quadrant)
            if i == 0:
                padw, padh = x1a - (w - (x2a - x1a)), y1a - (h - (y2a - y1a))
            elif i == 1:
                padw, padh = x1a - 0, y1a - (h - (y2a - y1a))
            elif i == 2:
                padw, padh = x1a - (w - (x2a - x1a)), y1a - 0
            else:
                padw, padh = x1a - 0, y1a - 0

            # paste via dynamic masking (fixed shapes). The shift is an
            # integer translation, so the gather is SEPARABLE: one row
            # gather + one column gather with 1-D indices. A 2-D per-pixel
            # gather here cost 4.0 s/batch on a v5e (the round-3 train-loop
            # regression); the separable form is ~20x faster and
            # bit-identical (same clipped indices, same mask).
            yy = jnp.arange(2 * s)
            xx = jnp.arange(2 * s)
            inside = ((yy[:, None] >= y1a) & (yy[:, None] < y2a)
                      & (xx[None, :] >= x1a) & (xx[None, :] < x2a))
            src_y = jnp.clip(yy - padh, 0, h - 1)
            src_x = jnp.clip(xx - padw, 0, w - 1)
            v_src = jnp.take(jnp.take(vi[i], src_y, axis=0), src_x, axis=1)
            l_src = jnp.take(jnp.take(li[i], src_y, axis=0), src_x, axis=1)
            canvas_v = jnp.where(inside[..., None], v_src, canvas_v)
            canvas_l = jnp.where(inside[..., None], l_src, canvas_l)

            lab_i = lab[i]
            shifted = jnp.stack([
                lab_i[:, 0],
                jnp.clip(lab_i[:, 1] + padw, 0, 2 * s),
                jnp.clip(lab_i[:, 2] + padh, 0, 2 * s),
                jnp.clip(lab_i[:, 3] + padw, 0, 2 * s),
                jnp.clip(lab_i[:, 4] + padh, 0, 2 * s)], -1)
            out_lab.append(shifted)
            out_m.append(lm[i])
        return canvas_v, canvas_l, jnp.concatenate(out_lab, 0), \
            jnp.concatenate(out_m, 0)

    return jax.vmap(place_one)(v4, l4, lab4, lm4, centers)


def mosaic_place_mm(v4, l4, lab4, lm4, centers, img_size: int):
    """mosaic_place on the MXU: each quadrant paste is a row-shift matrix x
    tile x col-shift matrix (indicator matrices carry the clipped source
    take AND the rectangular `inside` range — mosaic_place's jnp.where mask,
    separated per axis); quadrant rectangles are disjoint by construction so
    the where-chain is a sum. Labels/masks: identical code path."""
    s = img_size

    def place_one(vi, li, lab, lm, center):
        xr, yr = center[0], center[1]
        h, w = vi.shape[1], vi.shape[2]
        dtype = (vi.dtype if jnp.issubdtype(vi.dtype, jnp.floating)
                 else jnp.float32)
        canvas_v = jnp.zeros((2 * s, 2 * s, vi.shape[-1]), jnp.float32)
        canvas_l = jnp.zeros_like(canvas_v)
        out_lab, out_m = [], []
        for i in range(4):
            # corner/offset math: verbatim mosaic_place (reference
            # kaist_dataset.py:239-254)
            if i == 0:
                x1a, y1a = jnp.maximum(xr - w, 0), jnp.maximum(yr - h, 0)
                x2a, y2a = xr, yr
            elif i == 1:
                x1a, y1a = xr, jnp.maximum(yr - h, 0)
                x2a, y2a = jnp.minimum(xr + w, 2 * s), yr
            elif i == 2:
                x1a, y1a = jnp.maximum(xr - w, 0), yr
                x2a, y2a = xr, jnp.minimum(2 * s, yr + h)
            else:
                x1a, y1a = xr, yr
                x2a, y2a = jnp.minimum(xr + w, 2 * s), jnp.minimum(2 * s, yr + h)
            if i == 0:
                padw, padh = x1a - (w - (x2a - x1a)), y1a - (h - (y2a - y1a))
            elif i == 1:
                padw, padh = x1a - 0, y1a - (h - (y2a - y1a))
            elif i == 2:
                padw, padh = x1a - (w - (x2a - x1a)), y1a - 0
            else:
                padw, padh = x1a - 0, y1a - 0

            rm = _shift_matrix(padh, y1a, y2a, 2 * s, h, dtype)
            cm = _shift_matrix(padw, x1a, x2a, 2 * s, w, dtype)
            canvas_v = canvas_v + _matmul_resample(vi[i].astype(dtype),
                                                   rm, cm)
            canvas_l = canvas_l + _matmul_resample(li[i].astype(dtype),
                                                   rm, cm)

            lab_i = lab[i]
            shifted = jnp.stack([
                lab_i[:, 0],
                jnp.clip(lab_i[:, 1] + padw, 0, 2 * s),
                jnp.clip(lab_i[:, 2] + padh, 0, 2 * s),
                jnp.clip(lab_i[:, 3] + padw, 0, 2 * s),
                jnp.clip(lab_i[:, 4] + padh, 0, 2 * s)], -1)
            out_lab.append(shifted)
            out_m.append(lm[i])
        dtype = (v4.dtype if jnp.issubdtype(v4.dtype, jnp.floating)
                 else jnp.float32)
        return canvas_v.astype(dtype), canvas_l.astype(dtype), \
            jnp.concatenate(out_lab, 0), jnp.concatenate(out_m, 0)

    return jax.vmap(place_one)(v4, l4, lab4, lm4, centers)


# ------------------------------------------------------------ photometric

def hsv_jitter(key, v_imgs, l_imgs, h_gain, s_gain, v_gain, gains=None):
    """Random HSV gains, same gains for both modalities per image
    (reference kaist_dataset.py:482-506, float math instead of uint8 LUTs).
    imgs: float32 RGB in [0, 255]. ``gains``: optional pre-sampled (B, 3)
    gain factors (chunked pipeline); ``key`` is ignored then."""
    B = v_imgs.shape[0]
    r = gains
    if r is None:
        r = (jax.random.uniform(key, (B, 3), minval=-1.0, maxval=1.0)
             * jnp.asarray([h_gain, s_gain, v_gain]) + 1.0)

    def adjust(img, g):
        # hue sector arithmetic is precision-sensitive (bf16 hue flips
        # sectors); compute in float32 IN-REGISTER — the op is elementwise
        # so XLA fuses the whole chain and the f32 intermediates never
        # touch HBM — and emit at the input's (possibly reduced) dtype
        x = (img / 255.0).astype(jnp.float32)
        hsv = _rgb_to_hsv(x)
        h = (hsv[..., 0] * g[0]) % 1.0
        s = jnp.clip(hsv[..., 1] * g[1], 0.0, 1.0)
        v = jnp.clip(hsv[..., 2] * g[2], 0.0, 1.0)
        return (_hsv_to_rgb(jnp.stack([h, s, v], -1))
                * 255.0).astype(img.dtype)

    return (jax.vmap(adjust)(v_imgs, r), jax.vmap(adjust)(l_imgs, r))


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn + 1e-12
    h = jnp.where(mx == r, ((g - b) / d) % 6.0,
                  jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0))
    h = h / 6.0
    s = jnp.where(mx > 0, d / (mx + 1e-12), 0.0)
    return jnp.stack([h, s, mx], -1)


def _hsv_to_rgb(hsv):
    # Branchless sector formula: c(n) = v - v*s*clamp(min(k, 4-k), 0, 1),
    # k = (n + 6h) mod 6 — algebraically identical to the 6-sector
    # piecewise definition (for each sector the clamp resolves to v, q, p
    # or t), but pure elementwise. The jnp.choose version lowered to
    # per-pixel gathers over a stacked (6, ...) array — 0.9 s/batch on a
    # v5e; this form fuses to nothing.
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]

    def chan(n):
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], -1)


def flip_lr(key, v_imgs, l_imgs, labels_xywh_norm, do=None):
    """50% horizontal flip of both modalities + x-center mirror
    (reference kaist_dataset.py:362-369). labels normalized xywh.
    ``do``: optional pre-sampled (B,) bool (chunked pipeline)."""
    B = v_imgs.shape[0]
    if do is None:
        do = jax.random.bernoulli(key, 0.5, (B,))
    v = jnp.where(do[:, None, None, None], v_imgs[:, :, ::-1], v_imgs)
    l = jnp.where(do[:, None, None, None], l_imgs[:, :, ::-1], l_imgs)
    x = jnp.where(do[:, None], 1.0 - labels_xywh_norm[..., 1],
                  labels_xywh_norm[..., 1])
    labels = labels_xywh_norm.at[..., 1].set(x)
    return v, l, labels


# ---------------------------------------------------------------- cutout

def snowflake_cutout(key, v_imgs, l_imgs, labels_xyxy, lmask, *,
                     n_thr: int = 6, step: int = 16, n_snow: int = 25,
                     label_thr: float = 0.35, u=None):
    """Zero out ``n_snow`` random step x step squares in BOTH modalities and
    drop labels whose cover-IoU vs the cut boxes exceeds ``label_thr``
    (reference snowflake.py:54-93; applied only when an image has <= n_thr
    boxes). labels absolute xyxy. ``u``: optional pre-sampled (B, n_snow, 2)
    uniforms in [0, 1) (chunked pipeline); ``key`` is ignored then."""
    B, H, W = v_imgs.shape[0], v_imgs.shape[1], v_imgs.shape[2]
    # NB: the reference swaps w/h when sampling boxes (snowflake.py:73 uses
    # np.shape(img)[:2] as (w, h)); we sample in the true frame.
    if u is None:
        u = jax.random.uniform(key, (B, n_snow, 2))
    xy = u * jnp.asarray([W - 1, H - 1], jnp.float32)
    xy = jnp.floor(xy)
    x2 = jnp.clip(xy[..., 0] + step - 1, 0, W - 1)
    y2 = jnp.clip(xy[..., 1] + step - 1, 0, H - 1)
    cut = jnp.stack([xy[..., 0], xy[..., 1], x2, y2], -1)      # (B, N, 4)

    active = (lmask.sum(-1) <= n_thr)                           # (B,)

    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]

    def cut_mask(c):  # (N, 4) -> (H, W) True where any cut covers
        inside = ((yy[None] >= c[:, None, None, 1])
                  & (yy[None] <= c[:, None, None, 3])
                  & (xx[None] >= c[:, None, None, 0])
                  & (xx[None] <= c[:, None, None, 2]))
        return inside.any(0)

    masks = jax.vmap(cut_mask)(cut) & active[:, None, None]     # (B, H, W)
    v = jnp.where(masks[..., None], 0.0, v_imgs)
    l = jnp.where(masks[..., None], 0.0, l_imgs)

    # cover-IoU of each label vs all cut boxes (reference snowflake.py:28-43)
    lb = labels_xyxy[..., 1:5]                                   # (B, T, 4)
    ix1 = jnp.maximum(lb[..., None, 0], cut[:, None, :, 0])
    iy1 = jnp.maximum(lb[..., None, 1], cut[:, None, :, 1])
    ix2 = jnp.minimum(lb[..., None, 2], cut[:, None, :, 2])
    iy2 = jnp.minimum(lb[..., None, 3], cut[:, None, :, 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area = jnp.maximum((lb[..., 2] - lb[..., 0])
                       * (lb[..., 3] - lb[..., 1]), 1.0)
    cover = inter.sum(-1) / area                                 # (B, T)
    keep = jnp.where(active[:, None], cover < label_thr, True)
    return v, l, lmask & keep


# ----------------------------------------------------------- label formats

def xyxy_to_norm_xywh(labels_xyxy, lmask, frame_hw):
    """Absolute xyxy -> normalized xywh (reference kaist_dataset.py:351-358);
    masked rows zeroed."""
    h, w = frame_hw
    x1, y1 = labels_xyxy[..., 1], labels_xyxy[..., 2]
    x2, y2 = labels_xyxy[..., 3], labels_xyxy[..., 4]
    out = jnp.stack([labels_xyxy[..., 0],
                     (x1 + x2) / 2 / w, (y1 + y2) / 2 / h,
                     (x2 - x1) / w, (y2 - y1) / h], -1)
    return jnp.where(lmask[..., None], out, 0.0)
