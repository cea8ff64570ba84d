"""Pallas TPU kernel: greedy NMS suppression over a fixed candidate pool.

The XLA version (ops/nms.py) builds a (K, K) IoU matrix and then runs a
``fori_loop`` whose every iteration does an argmax + masked update through
HBM-visible buffers. This kernel keeps boxes, scores, and the IoU matrix
resident in VMEM and runs the whole greedy selection inside one Pallas
program: one VMEM round-trip for the candidate pool instead of ``max_det``
of them.

Semantics identical to ops/nms.nms_indices (greedy by score, suppress
IoU > threshold, ``max_det`` winners), itself index-parity-tested against
torchvision-style numpy NMS. Compiled-validated on v5e hardware:
index-exact vs the XLA path (incl. vmapped over a batch), 200us vs 386us
standalone at K=512; inside the full batched non_max_suppression the XLA
loop pipelines better across vmap (see ops/nms.py for the measured table),
so the production wiring is opt-in via DYK_NMS_PALLAS=1.

K (pool size) and max_det are static; K <= 1024 fits the (K, K) IoU matrix
in scoped VMEM (16 MB). Outputs: idx (max_det,), valid (max_det,) int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _nms_kernel(boxes_ref, scores_ref, idx_ref, valid_ref, *, iou_thres,
                max_det):
    # Everything stays rank-2: Mosaic's vector layout inference aborts on
    # 1-D vector reshapes/argmax (verified on hw: `Check failed:
    # arr.size() >= layout_rank` in inferReshape), so scores travel as
    # (1, K), coordinates as (K, 1), and argmax is a masked-iota min.
    boxes = boxes_ref[:]                      # (K, 4) f32 in VMEM
    k = boxes.shape[0]

    x1 = boxes[:, 0:1]                        # (K, 1)
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = (x2 - x1) * (y2 - y1)              # (K, 1)

    # (K, K) IoU, computed once in VMEM
    ix1 = jnp.maximum(x1, x1.T)
    iy1 = jnp.maximum(y1, y1.T)
    ix2 = jnp.minimum(x2, x2.T)
    iy2 = jnp.minimum(y2, y2.T)
    inter = (jnp.clip(ix2 - ix1, 0.0, None) * jnp.clip(iy2 - iy1, 0.0, None))
    iou = inter / (area + area.T - inter + 1e-16)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def body(n, scores):                      # scores (1, K)
        best = jnp.max(scores)
        # first index attaining the max (matches argmax tie-breaking)
        win = jnp.min(jnp.where(scores == best, col_ids, k)).astype(jnp.int32)
        ok = best > NEG_INF / 2
        idx_ref[n] = jnp.where(ok, win, 0).astype(jnp.int32)
        valid_ref[n] = ok.astype(jnp.int32)
        # winner's IoU row via masked reduction (Mosaic has no dynamic
        # VMEM row slice): exactly one row id matches `win`
        row = jnp.sum(jnp.where(row_ids == win, iou, 0.0), axis=0,
                      keepdims=True)                       # (1, K)
        suppress = (row > iou_thres) | (col_ids == win)
        return jnp.where(suppress, NEG_INF, scores)

    jax.lax.fori_loop(0, max_det, body, scores_ref[:])


@functools.partial(jax.jit, static_argnames=("iou_thres", "max_det",
                                             "interpret"))
def pallas_nms_indices(boxes, scores, iou_thres: float = 0.6,
                       max_det: int = 100, interpret: bool = False):
    """Drop-in for ops.nms.nms_indices on TPU. boxes (K, 4), scores (K,)."""
    k = boxes.shape[0]
    idx, valid = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thres=iou_thres, max_det=max_det),
        out_shape=(jax.ShapeDtypeStruct((max_det,), jnp.int32),
                   jax.ShapeDtypeStruct((max_det,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(boxes.astype(jnp.float32), scores.astype(jnp.float32).reshape(1, k))
    return idx, valid.astype(bool)
