"""Probe #3: does splitting a Pallas pipeline into K parallel in/out block
streams raise DMA throughput? Pure pass-through copy, same total bytes.

K=1 is probe2's `pass` variant. K>1 fetches K row-sub-blocks per grid step
via K independent in_specs/out_specs (independent DMA streams).
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


def k_pass(*refs, K, TR, G):
    ins, outs = refs[:K], refs[K:]
    for i in range(K):
        outs[i][0] = ins[i][0][:TR // K, :, :]


def make(B, Ho, G, TR, K, dt):
    RI, RO = 2 * TR // K, TR // K

    def imap(k):
        return lambda b, t: (b, K * t + k, 0, 0)

    return pl.pallas_call(
        functools.partial(k_pass, K=K, TR=TR, G=G),
        grid=(B, Ho // TR),
        in_specs=[pl.BlockSpec((1, RI, G, 128), imap(k),
                               memory_space=pltpu.VMEM) for k in range(K)],
        out_specs=[pl.BlockSpec((1, RO, G, 128), imap(k),
                                memory_space=pltpu.VMEM) for k in range(K)],
        out_shape=[jax.ShapeDtypeStruct((B, Ho, G, 128), dt)
                   for _ in range(K)],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tr", type=int, default=16)
    args = ap.parse_args()

    B, H, W, C = args.batch, 512, 640, 32
    G, TR, Ho = W * C // 128, args.tr, 512 // 2
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    xq = jnp.asarray(rng.random((B, H, G, 128), np.float32), dt)

    for K in (1, 2, 4, 8):
        f = make(B, Ho, G, TR, K, dt)
        def run(a, f=f, K=K):
            outs = f(*([a] * K))
            outs = outs if isinstance(outs, (list, tuple)) else [outs]
            return outs[0]
        try:
            ms = timed_loop(run, (xq,), args.iters, f"pass K={K}")
            gb = (B * H * G * 128 + B * Ho * G * 128 * K / K) * 2 / 1e9
            print(f"  -> {gb / ms * 1e3:.0f} GB/s effective", flush=True)
        except Exception as e:
            print(f"K={K} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
