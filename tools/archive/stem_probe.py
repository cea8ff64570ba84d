"""Ablation probe for the packed Pallas stem kernel: where does time go?

Variants (each a stripped copy of ops/pallas_stem._kernel_packed):
  dma     — DMA the tile, emit a slice of scratch (no compute)
  mm      — DMA + the 3 accumulating matmuls, emit raw acc (no epilogue)
  nocarry — full epilogue minus the roll/carry assembly
  full    — the shipped kernel (reference point)
  fullb16 — full, but epilogue (carry+bias+act) computed in bf16
"""
import argparse
import functools
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from double_yolo_kaist_tpu.ops.pallas_stem import (
    _pack_w_s2, stem_conv_s2_packed)
from tools.stem_ab import timed_loop


def _dma(x_hbm, scratch, sem, TR):
    bi, t = pl.program_id(0), pl.program_id(1)
    nrows = 2 * TR + 1

    @pl.when(t == 0)
    def _():
        scratch[0:1] = jnp.zeros_like(scratch[0:1])
        cp = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(0, nrows - 1)],
                                   scratch.at[pl.ds(1, nrows - 1)], sem)
        cp.start(); cp.wait()

    @pl.when(t != 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(2 * TR * t - 1, nrows)],
                                   scratch.at[pl.ds(0, nrows)], sem)
        cp.start(); cp.wait()


def _mm(scratch, m_ref, TR, G):
    blk = scratch[...]
    rows = blk[:2 * TR + 2].reshape(TR + 1, 2, G, 128)
    acc = None
    for di in range(3):
        if di == 0:
            xd = rows[:TR, 0]
        elif di == 1:
            xd = rows[:TR, 1]
        else:
            xd = rows[1:TR + 1, 0]
        part = jax.lax.dot_general(
            xd.reshape(TR * G, 128), m_ref[di], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def kern_dma(x_hbm, m_ref, b_ref, o_ref, scratch, sem, *, TR, G, O):
    _dma(x_hbm, scratch, sem, TR)
    o_ref[0] = scratch[:TR, :, :2 * O]


def kern_mm(x_hbm, m_ref, b_ref, o_ref, scratch, sem, *, TR, G, O):
    _dma(x_hbm, scratch, sem, TR)
    acc = _mm(scratch, m_ref, TR, G)
    o_ref[0] = acc.reshape(TR, G, 3 * O)[:, :, :2 * O].astype(o_ref.dtype)


def kern_nocarry(x_hbm, m_ref, b_ref, o_ref, scratch, sem, *, TR, G, O):
    _dma(x_hbm, scratch, sem, TR)
    acc = _mm(scratch, m_ref, TR, G)
    y = acc.reshape(TR, G, 3 * O)[:, :, :2 * O] + b_ref[0].astype(jnp.float32)
    y = y * jnp.tanh(jax.nn.softplus(y))
    o_ref[0] = y.astype(o_ref.dtype)


def kern_fullb16(x_hbm, m_ref, b_ref, o_ref, scratch, sem, *, TR, G, O):
    _dma(x_hbm, scratch, sem, TR)
    acc = _mm(scratch, m_ref, TR, G)
    p4 = acc.reshape(TR, G, 3 * O).astype(jnp.bfloat16)
    main = p4[:, :, 0:2 * O]
    carry = jnp.concatenate(
        [p4[:, :, 2 * O:3 * O], jnp.zeros((TR, G, O), jnp.bfloat16)], axis=2)
    carry = pltpu.roll(carry, shift=1, axis=1)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (TR, G, 2 * O), 1)
    y = main + jnp.where(gidx > 0, carry, jnp.bfloat16(0))
    y = y + b_ref[0]
    y = y * jnp.tanh(jax.nn.softplus(y))
    o_ref[0] = y.astype(o_ref.dtype)


def run(kern, x, m, b2, TR, G, O, tag, iters):
    B, H = x.shape[0], x.shape[1]
    Ho = H // 2
    f = pl.pallas_call(
        functools.partial(kern, TR=TR, G=G, O=O),
        grid=(B, Ho // TR),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((3, 128, 3 * O), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 2 * O), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TR, G, 2 * O), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, G, 2 * O), x.dtype),
        scratch_shapes=[pltpu.VMEM((2 * TR + 2, G, 128), x.dtype),
                        pltpu.SemaphoreType.DMA],
    )
    try:
        return timed_loop(lambda xq, mm_, bb: f(xq, mm_, bb),
                          (x, m, b2), iters, tag)
    except Exception as e:
        print(f"{tag} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tr", type=int, default=32)
    args = ap.parse_args()

    B, H, W, C, O = args.batch, 512, 640, 32, 64
    TR, G = args.tr, W * C // 128
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.random((B, H, W, C), np.float32), dt)
    w = jnp.asarray(rng.random((3, 3, C, O), np.float32) * 0.05, dt)
    b = jnp.asarray(rng.random((O,), np.float32), dt)
    xq = x.reshape(B, H, G, 128)
    m = _pack_w_s2(w)
    b2 = jnp.concatenate([b, b]).reshape(1, 2 * O)

    run(kern_dma, xq, m, b2, TR, G, O, "dma-only", args.iters)
    run(kern_mm, xq, m, b2, TR, G, O, "dma+matmul", args.iters)
    run(kern_nocarry, xq, m, b2, TR, G, O, "no-carry", args.iters)
    run(kern_fullb16, xq, m, b2, TR, G, O, "full-bf16-epilogue", args.iters)
    timed_loop(lambda a, ww, bb: stem_conv_s2_packed(a, ww, bb, act="mish",
                                                     TR=TR),
               (x, w, b), args.iters, "full (shipped)")


if __name__ == "__main__":
    main()
