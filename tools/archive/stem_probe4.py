"""Probe #4: what bounds the Pallas pipeline at ~250 GB/s?

  in-only   — stream input blocks, write one tiny out block per step
  out-only  — tiny input, stream output blocks (write from VMEM constant)
  flat3d    — same copy as probe3 K=1, but on (B, H*G, 128) with fully
              contiguous (RI*G, 128) blocks
  flat2d    — single giant (H*G*B, 128) array, 1-D grid, contiguous blocks
"""
import argparse
import functools
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.stem_ab import timed_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tr", type=int, default=16)
    args = ap.parse_args()

    B, H, W, C = args.batch, 512, 640, 32
    G, TR, Ho = W * C // 128, args.tr, 256
    RI = 2 * TR
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    xq = jnp.asarray(rng.random((B, H, G, 128), np.float32), dt)
    nbytes = xq.size * 2

    # ---- in-only
    def k_in(x_ref, o_ref):
        o_ref[...] = x_ref[0, :8, :8, :] * jnp.bfloat16(2)

    f = pl.pallas_call(
        k_in, grid=(B, H // RI),
        in_specs=[pl.BlockSpec((1, RI, G, 128), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8, 128), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 8, 128), dt))
    ms = timed_loop(lambda a: f(a), (xq,), args.iters, "in-only")
    print(f"  -> {nbytes / ms * 1e3 / 1e9:.0f} GB/s in", flush=True)

    # ---- out-only
    def k_out(x_ref, o_ref):
        o_ref[0] = jnp.broadcast_to(x_ref[0, :1, :1, :],
                                    (RI, G, 128)).astype(dt)

    f = pl.pallas_call(
        k_out, grid=(B, H // RI),
        in_specs=[pl.BlockSpec((1, 8, 8, 128), lambda b, t: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, RI, G, 128), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, G, 128), dt))
    ms = timed_loop(lambda a: f(a), (xq,), args.iters, "out-only")
    print(f"  -> {nbytes / ms * 1e3 / 1e9:.0f} GB/s out", flush=True)

    # ---- flat3d copy
    x3 = xq.reshape(B, H * G, 128)

    def k_cp(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    f = pl.pallas_call(
        k_cp, grid=(B, H // RI),
        in_specs=[pl.BlockSpec((1, RI * G, 128), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, RI * G, 128), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * G, 128), dt))
    ms = timed_loop(lambda a: f(a), (x3,), args.iters, "flat3d copy")
    print(f"  -> {2 * nbytes / ms * 1e3 / 1e9:.0f} GB/s r+w", flush=True)

    # ---- flat2d copy
    x2 = xq.reshape(B * H * G, 128)
    CH = RI * G

    f = pl.pallas_call(
        k_cp, grid=(B * H * G // CH,),
        in_specs=[pl.BlockSpec((CH, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CH, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H * G, 128), dt))
    ms = timed_loop(lambda a: f(a), (x2,), args.iters, "flat2d copy")
    print(f"  -> {2 * nbytes / ms * 1e3 / 1e9:.0f} GB/s r+w", flush=True)


if __name__ == "__main__":
    main()
