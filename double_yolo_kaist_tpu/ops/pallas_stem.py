"""EXPERIMENTAL Pallas kernel: 3x3 stride-2 conv for small-C_in stems,
fused bias + mish/leaky.

Why: the profile shows the twin low-channel stems (C3->32, C32->64 s2 at
512x640; reference cfg layers 0-1 of each stream) run at 3-12 TF/s under
XLA conv — C_in < 128 fills a fraction of the MXU lanes — and cost ~40% of
the flagship forward. Strategy here: grid (B, row_tiles); each program DMAs
its halo'd row window from HBM, builds the (TR*Wo, 9*C) patch matrix in
VMEM by phase slicing (an in-VMEM im2col, no HBM patch traffic), and runs
one K=9C matmul (fills the MXU depth), fusing bias + activation.

Status (v5e, 2026-08-16): interpret-mode exact vs lax.conv (tests). On
hardware, Mosaic rejects three successive formulations — documented so the
next attempt starts where this one stopped:
  1. lane-concat of the 9 phase slices: "result/input offset mismatch on
     non-concat dimension" (inputs carry different sublane offsets);
  2/3. both the 9-accumulating-matmul variant ("acc") and the
     assemble-via-VMEM-scratch variant ("scratch") die earlier, in the halo
     DMA: "Slice shape along dimension 2 must be aligned to tiling (8), but
     is 642" — the HBM memref is tiled (8,128) on (W, C), so the DMA'd
     window width must be 8-aligned, AND the layout pads C 32->128, making
     the DMA read 4x the useful bytes.
Next steps: (a) pad W+2 up to a multiple of 8 and slice the valid 642 cols
in-VMEM; (b) repack the input as (B, H, W*C) before the kernel so lanes are
fully used by the DMA, and split W*C -> (W, C) in-VMEM (needs a Mosaic-legal
reshape). Expected win if it lands: ~2 ms per stem conv per stream at bs16
(XLA: 2.2 ms conv+mish; bandwidth floor ~0.5 ms).
"""
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pieces(blk, TR, Wo, C):
    out = []
    for di in range(3):
        r = blk[di:di + 2 * TR].reshape(TR, 2, Wo + 1, 2, C)[:, 0]
        for dj in range(3):
            ph, off = dj % 2, dj // 2
            out.append(r[:, off:off + Wo, ph])
    return out


def _finish(y, b_ref, act, o_ref, TR, Wo, O):
    y = y + b_ref[...].astype(jnp.float32)
    if act == "mish":
        y = y * jnp.tanh(jax.nn.softplus(y))
    elif act == "leaky":
        y = jnp.where(y > 0, y, 0.1 * y)
    o_ref[0] = y.reshape(TR, Wo, O).astype(o_ref.dtype)


def _kernel_acc(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *, TR, Wo, C, O, act):
    bi, t = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(2 * t * TR, 2 * TR + 2)],
                               scratch, sem)
    cp.start(); cp.wait()
    blk = scratch[...]
    y = None
    for k, sub in enumerate(_pieces(blk, TR, Wo, C)):
        part = jax.lax.dot_general(
            sub.reshape(TR * Wo, C), w_ref[k * C:(k + 1) * C, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    _finish(y, b_ref, act, o_ref, TR, Wo, O)


def _kernel_scratch(x_hbm, w_ref, b_ref, o_ref, scratch, pbuf, sem,
                    *, TR, Wo, C, O, act):
    bi, t = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(2 * t * TR, 2 * TR + 2)],
                               scratch, sem)
    cp.start(); cp.wait()
    blk = scratch[...]
    for k, sub in enumerate(_pieces(blk, TR, Wo, C)):
        pbuf[:, :, k * C:(k + 1) * C] = sub
    y = jax.lax.dot_general(
        pbuf[...].reshape(TR * Wo, 9 * C), w_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    _finish(y, b_ref, act, o_ref, TR, Wo, O)


@functools.partial(jax.jit,
                   static_argnames=("act", "TR", "variant", "interpret"))
def stem_conv_s2(x, w, b, *, act="mish", TR=8, variant="acc",
                 interpret=False):
    B, H, W, C = x.shape
    O = w.shape[-1]
    Ho, Wo = H // 2, W // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wm = w.reshape(9 * C, O)
    scratch = [pltpu.VMEM((2 * TR + 2, W + 2, C), x.dtype)]
    if variant == "scratch":
        kern = _kernel_scratch
        scratch.append(pltpu.VMEM((TR, Wo, 9 * C), x.dtype))
    else:
        kern = _kernel_acc
    scratch.append(pltpu.SemaphoreType.DMA)
    return pl.pallas_call(
        functools.partial(kern, TR=TR, Wo=Wo, C=C, O=O, act=act),
        grid=(B, Ho // TR),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((9 * C, O), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((O,), lambda b, t: (0,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TR, Wo, O), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, O), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, wm, b)
