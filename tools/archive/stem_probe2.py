"""Ablation probe #2: pipelined (v3) packed stem kernel, staged variants.

  pass   — auto-pipelined block copy only (pipeline throughput floor)
  mm     — + the 3 accumulating matmuls (di0 uses odd rows: no halo concat)
  halo   — + real di0 halo concat
  act    — + bias + mish (no carry)
  full   — + carry roll/mask (== shipped kernel)
"""
import argparse
import functools
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from double_yolo_kaist_tpu.ops.pallas_stem import _pack_w_s2
from tools.stem_ab import timed_loop


def make(kern, B, Ho, G, O, TR, dt):
    return pl.pallas_call(
        functools.partial(kern, TR=TR, G=G, O=O),
        grid=(B, Ho // TR),
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
        out_shape=jax.ShapeDtypeStruct((B, Ho, G, 2 * O), dt),
    )


def _mm(x_ref, h_ref, m_ref, TR, G, with_halo):
    blk = x_ref[0]
    rows = blk.reshape(TR, 2, G, 128)
    even, odd = rows[:, 0], rows[:, 1]
    if with_halo:
        t = pl.program_id(1)
        halo = jnp.where(t == 0, jnp.zeros_like(h_ref[0]), h_ref[0])
        d0 = jnp.concatenate([halo, odd[:TR - 1]], axis=0)
    else:
        d0 = odd
    acc = None
    for di, xd in enumerate((d0, even, odd)):
        part = jax.lax.dot_general(
            xd.reshape(TR * G, 128), m_ref[di], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def k_pass(x_ref, h_ref, m_ref, b_ref, o_ref, *, TR, G, O):
    o_ref[0] = x_ref[0][:TR, :, :2 * O]


def k_mm(x_ref, h_ref, m_ref, b_ref, o_ref, *, TR, G, O):
    acc = _mm(x_ref, h_ref, m_ref, TR, G, False)
    o_ref[0] = acc.reshape(TR, G, 3 * O)[:, :, :2 * O].astype(o_ref.dtype)


def k_halo(x_ref, h_ref, m_ref, b_ref, o_ref, *, TR, G, O):
    acc = _mm(x_ref, h_ref, m_ref, TR, G, True)
    o_ref[0] = acc.reshape(TR, G, 3 * O)[:, :, :2 * O].astype(o_ref.dtype)


def k_act(x_ref, h_ref, m_ref, b_ref, o_ref, *, TR, G, O):
    acc = _mm(x_ref, h_ref, m_ref, TR, G, True)
    y = acc.reshape(TR, G, 3 * O)[:, :, :2 * O] + b_ref[0].astype(jnp.float32)
    y = y * jnp.tanh(jax.nn.softplus(y))
    o_ref[0] = y.astype(o_ref.dtype)


def k_full(x_ref, h_ref, m_ref, b_ref, o_ref, *, TR, G, O):
    acc = _mm(x_ref, h_ref, m_ref, TR, G, True)
    p4 = acc.reshape(TR, G, 3 * O)
    main = p4[:, :, 0:2 * O]
    carry = pltpu.roll(p4[:, :, 2 * O:3 * O], shift=1, axis=1)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (TR, G, O), 1)
    carry = jnp.where(gidx > 0, carry, 0.0)
    y = main + jnp.concatenate(
        [carry, jnp.zeros((TR, G, O), jnp.float32)], axis=2)
    y = y + b_ref[0].astype(jnp.float32)
    y = y * jnp.tanh(jax.nn.softplus(y))
    o_ref[0] = y.astype(o_ref.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tr", type=int, default=16)
    args = ap.parse_args()

    B, H, W, C, O = args.batch, 512, 640, 32, 64
    TR, G = args.tr, W * C // 128
    Ho = H // 2
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.random((B, H, W, C), np.float32), dt)
    w = jnp.asarray(rng.random((3, 3, C, O), np.float32) * 0.05, dt)
    b = jnp.asarray(rng.random((O,), np.float32), dt)
    xq = x.reshape(B, H, G, 128)
    halo = jnp.concatenate(
        [xq[:, :1], xq[:, 2 * TR - 1:H - 1:2 * TR]], axis=1)
    m = _pack_w_s2(w)
    b2 = jnp.concatenate([b, b]).reshape(1, 2 * O)
    A = (xq, halo, m, b2)

    for name, kern in [("pass", k_pass), ("mm", k_mm), ("halo", k_halo),
                       ("act", k_act), ("full", k_full)]:
        f = make(kern, B, Ho, G, O, TR, dt)
        try:
            timed_loop(lambda a, h, mm_, bb: f(a, h, mm_, bb), A,
                       args.iters, f"{name} TR={TR}")
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
