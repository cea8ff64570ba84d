"""Batched CLAHE (contrast-limited adaptive histogram equalization) on device.

The reference calls cv2.createCLAHE(clip 1.0, 4x4 tiles) per channel on the
host (snowflake.py:46-51) — the single most expensive host op in its pipeline.
This is the cv2 algorithm expressed as batched XLA ops: per-tile 256-bin
histograms (one-hot matmul — MXU work), clip + uniform excess redistribution,
CDF -> LUT per tile, then bilinear interpolation between the 4 neighboring
tile LUTs per pixel. Assumes H, W divisible by the tile grid (KAIST 512x640
with 4x4 tiles -> 128x160 exactly; cv2 pads otherwise).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _tile_luts(tiles_u8, clip_limit: float):
    """tiles_u8: (nt, P) uint8 pixels per tile -> (nt, 256) LUTs (f32).

    Bit-exact cv2 semantics: integer clip limit int(clip*P/256) floored at 1,
    excess redistributed as excess//256 to every bin plus the residual to
    bins 0, step, 2*step, ... with step = max(256//residual, 1); LUT =
    round-half-even(cdf * 255 / P)."""
    nt, P = tiles_u8.shape
    onehot = jax.nn.one_hot(tiles_u8, 256, dtype=jnp.float32)     # (nt, P, 256)
    hist = onehot.sum(axis=1).astype(jnp.int32)                   # (nt, 256)

    limit = max(int(clip_limit * P / 256.0), 1)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(-1, keepdims=True)              # (nt, 1)
    batch = excess // 256
    residual = excess - batch * 256                               # < 256
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)        # (nt, 1)
    bins = jnp.arange(256)[None, :]
    bump = ((bins % step == 0) & (bins // step < residual)).astype(jnp.int32)
    clipped = clipped + batch + bump

    cdf = jnp.cumsum(clipped.astype(jnp.float32), axis=-1)
    lut = jnp.clip(jnp.round(cdf * (255.0 / P)), 0, 255)
    return lut                                                    # (nt, 256) f32


def clahe_batch(imgs_u8, clip_limit: float = 1.0, grid: int = 4):
    """imgs_u8: (B, H, W, C) uint8 -> uint8, CLAHE per channel.

    Matches cv2 semantics: tile LUTs + per-pixel bilinear blend of the 4
    nearest tile LUTs with border replication of tile centers."""
    B, H, W, C = imgs_u8.shape
    if H % grid or W % grid:
        # cv2 extends non-divisible images to tile multiples with
        # BORDER_REFLECT_101 and crops after (clahe.cpp); divisible shapes
        # (all KAIST sizes) take the exact-parity path below unchanged
        ph, pw = (-H) % grid, (-W) % grid
        ext = jnp.pad(imgs_u8, ((0, 0), (0, ph), (0, pw), (0, 0)),
                      mode="reflect")
        return clahe_batch(ext, clip_limit, grid)[:, :H, :W]
    th, tw = H // grid, W // grid

    x = imgs_u8.astype(jnp.int32)
    # (B, C, grid, grid, th*tw)
    tiles = (x.transpose(0, 3, 1, 2)
             .reshape(B, C, grid, th, grid, tw)
             .transpose(0, 1, 2, 4, 3, 5)
             .reshape(B * C * grid * grid, th * tw))
    luts = _tile_luts(tiles, clip_limit).reshape(B, C, grid, grid, 256)

    # bilinear interpolation between tile LUTs (cv2 interpolation weights)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    fy = (ys - th / 2.0 + 0.5) / th     # tile-space coordinates
    fx = (xs - tw / 2.0 + 0.5) / tw
    y0 = jnp.clip(jnp.floor(fy), 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    wy = jnp.clip(fy - jnp.floor(fy), 0.0, 1.0)
    wy = jnp.where(fy < 0, 0.0, jnp.where(fy > grid - 1, 1.0, wy))
    wx = jnp.clip(fx - jnp.floor(fx), 0.0, 1.0)
    wx = jnp.where(fx < 0, 0.0, jnp.where(fx > grid - 1, 1.0, wx))

    def apply_one(img_c, luts_c):
        """img_c (H, W) int32, luts_c (grid, grid, 256)."""
        p = img_c
        v00 = luts_c[y0[:, None], x0[None, :], p]
        v01 = luts_c[y0[:, None], x1[None, :], p]
        v10 = luts_c[y1[:, None], x0[None, :], p]
        v11 = luts_c[y1[:, None], x1[None, :], p]
        top = v00 * (1 - wx)[None, :] + v01 * wx[None, :]
        bot = v10 * (1 - wx)[None, :] + v11 * wx[None, :]
        return top * (1 - wy)[:, None] + bot * wy[:, None]

    flat = x.transpose(0, 3, 1, 2).reshape(B * C, H, W)
    luts_flat = luts.reshape(B * C, grid, grid, 256)
    out = jax.vmap(apply_one)(flat, luts_flat)
    out = out.reshape(B, C, H, W).transpose(0, 2, 3, 1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
