"""Pallas int8 GEMM with a fused dequant -> activation -> requant epilogue.

Why this kernel exists (round-4 HLO census, docs/ROADMAP.md): XLA's TPU conv
emitter will not store s8 from a convolution fusion, so every *quantized*
1x1 conv in the chain program bounces its output through bf16 — the conv
writes bf16, a `multiply_add` fusion re-reads it for scale+bias, and a
`clamp_convert` fusion re-reads THAT to requantize for the next conv:
~9 bytes/element of HBM traffic where 2 would do (read s8 row, write s8
row). A 1x1 stride-1 conv is exactly a GEMM over flattened pixels, so
Pallas can do the whole thing — s8 x s8 -> s32 on the MXU, dequant, the
darknet activation, and the chain requant — in one VMEM-resident pass.

Applies to:
  * plain quantized 1x1 convs (quantize._qconv, kernel 1, stride 1,
    groups 1): x (B, H, W, C) s8, w (1, 1, C, N);
  * s2d-region "i1" kron convs (quantize._qconv_s2d): in the phase-minor
    s2d basis an interior 1x1 conv is still a 1x1 conv with 4C lanes,
    i.e. the same GEMM with K = 4C.

Numerics: the integer matmul is exact, and the epilogue replays the XLA
path's dtype sequence (s32 -> out_dtype multiply-add in out_dtype,
activation in out_dtype, requant round/clip in out_dtype). Exactness vs the
jnp reference is up to XLA's excess-precision freedom on bf16 chains (XLA
may keep the epilogue in f32 registers where the kernel materializes bf16
per step), which can flip requant rounding boundaries by 1 int8 LSB on a
few % of elements — both are valid emissions of the same bf16 program
(tests/test_pallas_qgemm.py pins exactly this contract).

Gated by DYK_PALLAS_QGEMM (default OFF — both scopes measured no faster
than XLA on the chip, see the gate comment below; set DYK_PALLAS_QGEMM=1
[+ DYK_PALLAS_QGEMM_SCOPE=i1|all] to enable). Only used when the input
already arrives s8 (chain edges) — bf16 entries keep the XLA path where
the quantize pass fuses upstream.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default OFF — both scopes were paired-A/B'd on the chip (round 4) and
# neither beats XLA's emission of the same work:
#   * scope "all" (every quantized 1x1): 890.8 vs 920.6 fps — un-fuses the
#     plain 1x1s whose epilogues XLA already folds into conv fusions;
#   * scope "i1" (only the s2d-region kron convs whose epilogues the HLO
#     census shows XLA splitting into standalone multiply_add +
#     clamp_convert passes): 934.9 vs 938.3 — a wash; the MXU GEMM is no
#     faster than XLA's conv there, so the saved epilogue traffic only
#     cancels the kernel's own overheads.
# The kernel stays: its integer core is exact (epilogue within 1 int8 LSB
# of XLA's excess-precision emission), compiled-validated on v5e, and the
# honest record of the VERDICT-r3 "Pallas conv at the s2d seam" lever.
_ENABLED = os.environ.get("DYK_PALLAS_QGEMM", "0") != "0"
_SCOPE = os.environ.get("DYK_PALLAS_QGEMM_SCOPE", "i1")
if _SCOPE not in ("i1", "all"):
    raise ValueError(
        f"DYK_PALLAS_QGEMM_SCOPE={_SCOPE!r}: must be 'i1' (s2d-region kron "
        f"convs only) or 'all' (every quantized 1x1)")

# MXU-aligned tiling; K and N stay whole (region/chain 1x1 convs have
# K, N <= 1024, comfortably VMEM-resident alongside the x/out tiles)
_TILE_M = 1024
_MAX_KN = 2048


def usable(x, w, *, stride, pad, groups) -> bool:
    """True when (x, w, geometry) is the GEMM case this kernel handles."""
    return (_ENABLED
            and jax.default_backend() == "tpu"
            and x.dtype == jnp.int8
            and w.ndim == 4 and w.shape[0] == 1 and w.shape[1] == 1
            and tuple(stride) == (1, 1)
            and (pad == 0 or pad == [(0, 0), (0, 0)])
            and groups == 1
            and w.shape[2] % 128 == 0 and w.shape[3] % 128 == 0
            and w.shape[2] <= _MAX_KN and w.shape[3] <= _MAX_KN)


def _epilogue(acc, scale, bias, act: str, out_inv_s, out_dtype):
    """EXACTLY quantize._qconv's dtype sequence, replayed on one tile."""
    from ..models import layers as L

    y = (acc.astype(out_dtype) * scale.astype(out_dtype)
         + bias.astype(out_dtype))
    y = L.activate(act, y)
    if out_inv_s is not None:
        # the product rounds to out_dtype exactly like the XLA path; the
        # roundeven itself runs in f32 (bf16->f32 is lossless, so the
        # integers match bit for bit) because Mosaic cannot legalize
        # math.roundeven on bf16 vectors
        prod = (y * out_inv_s.astype(y.dtype)).astype(jnp.float32)
        y = jnp.clip(jnp.round(prod), -127, 127).astype(jnp.int8)
    return y


def _kernel(x_ref, w_ref, s_ref, b_ref, inv_ref, o_ref, *, act, requant,
            out_dtype):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    inv = inv_ref[0, 0] if requant else None
    o_ref[:] = _epilogue(acc, s_ref[:], b_ref[:], act, inv, out_dtype)


@functools.partial(jax.jit, static_argnames=("act", "out_dtype"))
def qgemm(xq, wq, scale, bias, act: str, out_inv_s=None,
          out_dtype=jnp.bfloat16):
    """xq (..., K) s8, wq (K, N) s8, scale/bias (N,) -> (..., N).

    Returns s8 when ``out_inv_s`` (a scalar) is given (chain emission),
    else ``out_dtype``. M (= prod of leading dims) is padded to the tile;
    the pad rows are computed and discarded (branch-free, exact)."""
    lead = xq.shape[:-1]
    K = xq.shape[-1]
    N = wq.shape[-1]
    M = 1
    for d in lead:
        M *= d
    x2 = xq.reshape(M, K)
    tm = min(_TILE_M, max(32, M))
    padded = -(-M // tm) * tm
    if padded != M:
        x2 = jnp.pad(x2, ((0, padded - M), (0, 0)))

    requant = out_inv_s is not None
    odt = jnp.int8 if requant else out_dtype
    inv = jnp.asarray(out_inv_s if requant else 0.0,
                      jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, act=act, requant=requant,
                          out_dtype=out_dtype),
        grid=(padded // tm,),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, N), odt),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * K * N,
            bytes_accessed=(padded * K + K * N
                            + padded * N * jnp.dtype(odt).itemsize),
            transcendentals=padded * N if act == "mish" else 0),
        interpret=jax.default_backend() != "tpu",   # CPU: exactness tests
    )(x2, wq, jnp.asarray(scale, jnp.float32).reshape(1, N),
      jnp.asarray(bias, jnp.float32).reshape(1, N), inv)
    if padded != M:
        out = out[:M]
    return out.reshape(*lead, N)
