"""Pallas TPU kernel: fused YOLO head decode.

Fuses the whole grid decode for one head — sigmoid, grid offsets, anchor
scaling (v3 exp / v4 square formulas, reference models.py:234-252), stride
mapping and conf/cls activation — into a single VMEM pass over the raw
predictor output. XLA fuses most of this chain too; the kernel guarantees
one materialization and keeps the (cells, no) layout lane-aligned, and it
documents the decode as an explicit TPU kernel (SURVEY.md §7 step 9).

Layout: raw (bs, na, ny, nx, no) is reshaped by the caller to
(bs * na * ny * nx, no) rows; the kernel receives a per-row (gx, gy, aw, ah)
table precomputed once per (na, ny, nx) geometry (static), so the inner body
is pure elementwise VPU work.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(p_ref, geom_ref, out_ref, *, bf_type, stride, block):
    p = p_ref[:].astype(jnp.float32)                   # (block, no)
    g = geom_ref[:]                                    # (block, 4) gx gy aw ah
    xy_g = g[:, 0:2]
    wh_a = g[:, 2:4]

    if bf_type == "yolov3":
        xy = jax.nn.sigmoid(p[:, 0:2]) + xy_g
        wh = jnp.exp(p[:, 2:4]) * wh_a
        rest = jax.nn.sigmoid(p[:, 4:])
    else:  # yolov4
        s = jax.nn.sigmoid(p)
        xy = s[:, 0:2] * 2.0 - 0.5 + xy_g
        wh = jnp.square(s[:, 2:4] * 2.0) * wh_a
        rest = s[:, 4:]

    out_ref[:] = jnp.concatenate(
        [xy * stride, wh * stride, rest], axis=1)


def _geometry(na: int, ny: int, nx: int, anchors: np.ndarray,
              stride: int) -> np.ndarray:
    """(na*ny*nx, 4) static per-cell table: grid x, grid y, anchor w, h
    (anchors in grid units)."""
    gy, gx = np.mgrid[0:ny, 0:nx].astype(np.float32)
    cells = np.stack([gx, gy], axis=-1).reshape(1, ny * nx, 2)
    cells = np.broadcast_to(cells, (na, ny * nx, 2))
    aw = (np.asarray(anchors, np.float32) / stride).reshape(na, 1, 2)
    aw = np.broadcast_to(aw, (na, ny * nx, 2))
    return np.concatenate([cells, aw], axis=-1).reshape(na * ny * nx, 4)


@functools.partial(jax.jit,
                   static_argnames=("na", "ny", "nx", "stride", "bf_type",
                                    "interpret"))
def pallas_decode_head(raw, geom, *, na: int, ny: int, nx: int, stride: int,
                       bf_type: str, interpret: bool = False):
    """Decode one head. raw (bs, na, ny, nx, no) -> (bs, na*ny*nx, no) fp32.
    ``geom`` from :func:`_geometry` (pass as a device array)."""
    bs, _, _, _, no = raw.shape
    n = na * ny * nx
    rows = raw.reshape(bs * n, no)
    geom_rows = jnp.broadcast_to(geom[None], (bs, n, 4)).reshape(bs * n, 4)

    block = min(bs * n, 4096)
    grid = (pl.cdiv(bs * n, block),)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, bf_type=bf_type, stride=stride,
                          block=block),
        out_shape=jax.ShapeDtypeStruct((bs * n, no), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((block, no), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, no), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, geom_rows)
    return out.reshape(bs, n, no)


def decode_head_pallas(raw, anchors, stride: int, bf_type: str,
                       interpret: bool = False):
    """Drop-in for models.graph.decode_head using the Pallas kernel."""
    bs, na, ny, nx, no = raw.shape
    geom = jnp.asarray(_geometry(na, ny, nx, anchors, stride))
    return pallas_decode_head(raw, geom, na=na, ny=ny, nx=nx, stride=stride,
                              bf_type=bf_type, interpret=interpret)
