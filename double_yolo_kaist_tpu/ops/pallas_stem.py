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
    # blk width Wc is padded to a multiple of 8 for DMA alignment; only the
    # leading 2*(Wo+1) columns are real — the reshape keeps the pad columns
    # in the (phase-split) W axis and the off:off+Wo slices never reach them
    Wc = blk.shape[1]
    out = []
    for di in range(3):
        r = blk[di:di + 2 * TR].reshape(TR, 2, Wc // 2, 2, C)[:, 0]
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


# --------------------------------------------------------------- v2: packed
#
# The v1 kernels above DMA (rows, W, C) windows; Mosaic requires the DMA'd
# slice to be whole (8, 128) tiles, and C=32 < 128 lanes is rejected (and
# would waste 4x bytes if padded). v2 sidesteps the problem: W*C = 640*32 =
# 160*128 exactly, so the conv input is BITCAST-reshaped to (B, H, 160, 128)
# — fully-packed lanes, aligned DMA, zero host-side repack. Each 128-lane
# group then holds 4 pixels x 32 channels, and the 3x3/s2 conv becomes
# THREE accumulating (TR*G, 128) @ (128, 192) matmuls (one per kernel row,
# full MXU K-depth) against block-structured weight matrices:
#   odd outputs  j=2t+1 read cols 4t+1..4t+3 -> group t, offsets p=1..3
#   even outputs j=2t   read cols 4t-1..4t+1 -> group t (p=0,1) + group
#                                               t-1 (p=3, the "carry")
# The kernel assembles y by interleaving (even = main + carry shifted one
# group down).
#
# v3 (this version, the first one that BEATS XLA on hardware): the v2
# manual halo-DMA kernel compiled but ran 3.8 ms vs XLA 2.1 ms at bs16 —
# ablation (tools/archive/stem_probe.py) showed 2.3 ms was the *serialized* DMA
# (start;wait with zero overlap) and 1.3 ms the f32 carry/mish epilogue.
# v3 therefore (a) drops manual DMA entirely: the kernel takes the block
# rows via an auto-pipelined BlockSpec (Pallas double-buffers HBM->VMEM
# copies behind compute) and the single halo row (top tap of kernel row 0)
# via a second, pre-sliced (B, T, G, 128) input, and (b) rolls/masks only
# the O-lane carry slice instead of a 2*O-wide padded copy.


def _pack_w_s2(w):
    """(3,3,32,64) HWIO -> (3, 128, 192) block matrices in the packed-group
    basis (rows p*32+c). Columns: [0:64] even-main (output col 2t from
    group-t offsets p=0,1), [64:128] odd (output col 2t+1 from p=1..3),
    [128:192] even-carry (output col 2t from group (t-1) offset p=3).
    Output cols 0:128 are already in the packed OUTPUT group order
    [even|odd], so the kernel never interleaves. jnp ops: jit-traceable."""
    O = w.shape[-1]
    m = jnp.zeros((3, 128, 2 * O + O), w.dtype)
    for di in range(3):
        for p in range(4):
            for dj in range(3):
                if p <= 1 and dj == p + 1:          # even main: cols 4t,4t+1
                    m = m.at[di, p * 32:(p + 1) * 32, 0:O].set(w[di, dj])
                if p >= 1 and dj == p - 1:          # odd: cols 4t+1..4t+3
                    m = m.at[di, p * 32:(p + 1) * 32, O:2 * O].set(w[di, dj])
                if p == 3 and dj == 0:              # even carry: col 4t-1
                    m = m.at[di, p * 32:(p + 1) * 32,
                             2 * O:3 * O].set(w[di, dj])
    return m


def _kernel_packed(x_ref, h_ref, m_ref, b_ref, o_ref, *, TR, G, O, act):
    t = pl.program_id(1)
    blk = x_ref[0]                            # (2TR, G, 128): abs rows 2TRt..
    rows = blk.reshape(TR, 2, G, 128)
    even, odd = rows[:, 0], rows[:, 1]
    # out row i taps rel rows 2i-1 (halo for i=0), 2i, 2i+1
    halo = jnp.where(t == 0, jnp.zeros_like(h_ref[0]), h_ref[0])  # (1,G,128)
    acc = None
    for di, xd in enumerate((
            jnp.concatenate([halo, odd[:TR - 1]], axis=0),
            even,
            odd)):
        part = jax.lax.dot_general(
            xd.reshape(TR * G, 128), m_ref[di], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part

    p4 = acc.reshape(TR, G, 3 * O)
    main = p4[:, :, 0:2 * O]                 # packed [even|odd], aligned
    # even-carry: group t-1's p=3 tap belongs to group t's even half.
    # Shift one group down (sublane roll within each row; the wrapped
    # group-0 slot is the zero left-halo, masked via iota).
    carry = pltpu.roll(p4[:, :, 2 * O:3 * O], shift=1, axis=1)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (TR, G, O), 1)
    carry = jnp.where(gidx > 0, carry, 0.0)
    y = main + jnp.concatenate(
        [carry, jnp.zeros((TR, G, O), jnp.float32)], axis=2)
    y = y + b_ref[0].astype(jnp.float32)
    if act == "mish":
        y = y * jnp.tanh(jax.nn.softplus(y))
    elif act == "leaky":
        y = jnp.where(y > 0, y, 0.1 * y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "TR", "interpret"))
def stem_conv_s2_packed(x, w, b, *, act="mish", TR=16, interpret=False):
    """3x3 stride-2 pad-1 conv + bias + activation for C_in=32, NHWC.

    Requirements: C == 32, W*C % 128 == 0, (W*C/128) % 8 == 0 (sublane
    tiling), H % (2*TR) == 0. Exact same math as
    lax.conv_general_dilated + bias + act."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    G = W * C // 128                          # groups per row (4 px each)
    assert C == 32 and (W * C) % 128 == 0 and G % 8 == 0 \
        and H % (2 * TR) == 0, (H, W, C, TR)
    Ho, Wo = H // 2, W // 2
    T = Ho // TR
    xq = x.reshape(B, H, G, 128)              # bitcast: packed lanes
    # halo[b, t] = input row 2*TR*t - 1 (top tap of kernel row 0); the t=0
    # entry is a dummy (kernel substitutes zeros for the image's top pad)
    halo = jnp.concatenate(
        [xq[:, :1], xq[:, 2 * TR - 1:H - 1:2 * TR]], axis=1)  # (B, T, G, 128)
    m = _pack_w_s2(w.astype(x.dtype))
    b2 = jnp.concatenate([b, b]).reshape(1, 2 * O)   # [even|odd] halves
    y = pl.pallas_call(
        functools.partial(_kernel_packed, TR=TR, G=G, O=O, act=act),
        grid=(B, T),
        in_specs=[pl.BlockSpec((1, 2 * TR, G, 128), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, G, 128), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, 128, 3 * O), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 2 * O), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TR, G, 2 * O), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        # output stays packed (each 128-lane group = [col 2t | col 2t+1]);
        # the reshape back to NHWC is a free bitcast
        out_shape=jax.ShapeDtypeStruct((B, Ho, G, 2 * O), x.dtype),
        interpret=interpret,
    )(xq, halo, m, b2)
    return y.reshape(B, Ho, Wo, O)


@functools.partial(jax.jit,
                   static_argnames=("act", "TR", "variant", "interpret"))
def stem_conv_s2(x, w, b, *, act="mish", TR=8, variant="acc",
                 interpret=False):
    B, H, W, C = x.shape
    O = w.shape[-1]
    Ho, Wo = H // 2, W // 2
    # pad width to a multiple of 8: HBM DMA slices must be tile-aligned on
    # the sublane dim (Mosaic: "Slice shape along dimension 2 must be
    # aligned to tiling (8)"). Left pad stays 1 (conv padding); the extra
    # right columns are dead weight the kernel never reads.
    Wc = -((-(W + 2)) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wc - W - 1), (0, 0)))
    wm = w.reshape(9 * C, O)
    scratch = [pltpu.VMEM((2 * TR + 2, Wc, C), x.dtype)]
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
