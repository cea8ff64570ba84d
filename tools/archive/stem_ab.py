"""A/B harness for the flagship stem convs on the real chip.

Isolated timings (device-loop protocol, see docs/ROADMAP.md) of the twin
low-channel stem convolutions that dominate the flagship forward:
  conv1: 3x3 s1 C3->32 + mish @ 512x640   (2.7 ms/stream under XLA, bs16)
  conv2: 3x3 s2 C32->64 + mish @ 512x640  (3.9 ms/stream under XLA, bs16)

Candidates:
  xla        — plain lax.conv_general_dilated NHWC (the production path)
  s2d        — space-to-depth input repack + equivalent dense conv
               (conv2: 2x2 s1 C128; conv1: 3x3 s1 C12 on half-res)
  pallas     — ops/pallas_stem.stem_conv_s2 (conv2 only)

Usage: python tools/stem_ab.py [--batch 16] [--iters 50] [--which all]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def timed_loop(fn, args, iters, tag):
    """One-dispatch fori_loop timing with 1-iter overhead subtraction."""
    def loop(n, *a):
        def body(_, acc):
            x0 = a[0] + (acc * 1e-18).astype(a[0].dtype)
            y = fn(x0, *a[1:])
            return jnp.sum(y, dtype=jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    loop_j = jax.jit(loop, static_argnums=(0,))
    np.asarray(loop_j(1, *args))
    np.asarray(loop_j(1 + iters, *args))
    t0 = time.perf_counter()
    np.asarray(loop_j(1, *args))
    t1 = time.perf_counter()
    np.asarray(loop_j(1 + iters, *args))
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / iters * 1e3
    print(f"{tag}: {ms:.3f} ms/iter", flush=True)
    return ms


def conv_nhwc(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--which", default="all")
    args = ap.parse_args()

    B, H, W = args.batch, 512, 640
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x1 = jnp.asarray(rng.random((B, H, W, 3), np.float32), dt)
    w1 = jnp.asarray(rng.random((3, 3, 3, 32), np.float32) * 0.1, dt)
    b1 = jnp.asarray(rng.random((32,), np.float32), dt)
    x2 = jnp.asarray(rng.random((B, H, W, 32), np.float32), dt)
    w2 = jnp.asarray(rng.random((3, 3, 32, 64), np.float32) * 0.05, dt)
    b2 = jnp.asarray(rng.random((64,), np.float32), dt)

    res = {}

    if args.which in ("all", "xla"):
        res["conv1_xla"] = timed_loop(
            lambda x, w, b: mish(conv_nhwc(x, w, 1) + b), (x1, w1, b1),
            args.iters, "conv1 xla (3x3 s1 C3->32 + mish)")
        res["conv2_xla"] = timed_loop(
            lambda x, w, b: mish(conv_nhwc(x, w, 2) + b), (x2, w2, b2),
            args.iters, "conv2 xla (3x3 s2 C32->64 + mish)")

    if args.which in ("all", "s2d"):
        # conv2 as 2x2 s1 conv on space-to-depth input: exact rewrite.
        # pad x to 513x641 rows/cols? 3x3 s2 with pad 1 needs rows -1..2Ho.
        # S2D(2) of padded (514, 642) -> not divisible; use explicit pad to
        # (514, 642) then slice phases.
        def conv2_s2d(x, w, b):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            # 4x4 kernel embedding (3x3 in top-left), then phase-split:
            # y[i,j] = sum_{di,dj<3} w[di,dj] x[2i+di-1, 2j+dj-1]
            #        = sum_{p,q<2} sum_{u,v<2} w4[2u+p,2v+q]
            #                      xp_phase(p,q)[i+u, j+v]
            xpp = jnp.pad(xp, ((0, 0), (0, 2), (0, 2), (0, 0)))
            phases = [xpp[:, p::2, q::2, :][:, :H // 2 + 1, :W // 2 + 1]
                      for p in range(2) for q in range(2)]   # 4 x (B,257,321,32)
            xs = jnp.concatenate(phases, -1)                 # (B,257,321,128)
            w4 = jnp.zeros((4, 4, 32, 64), w.dtype).at[:3, :3].set(w)
            # kernel for the phase layout: k[u,v, 32*(2p+q)+c, o]
            wk = jnp.zeros((2, 2, 128, 64), w.dtype)
            for p in range(2):
                for q in range(2):
                    wk = wk.at[:, :, 32 * (2 * p + q):32 * (2 * p + q) + 32].set(
                        w4[p::2, q::2].transpose(0, 1, 2, 3))
            y = jax.lax.conv_general_dilated(
                xs, wk, (1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return mish(y + b)

        # parity check first (fp32 on small input)
        xs = jnp.asarray(rng.random((2, 16, 20, 32), np.float32))
        ws = jnp.asarray(rng.random((3, 3, 32, 64), np.float32))
        bs = jnp.asarray(np.zeros(64, np.float32))
        ref = mish(conv_nhwc(xs, ws, 2) + bs)
        def conv2_s2d_any(x, w, b, H, W):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            xpp = jnp.pad(xp, ((0, 0), (0, 2), (0, 2), (0, 0)))
            phases = [xpp[:, p::2, q::2, :][:, :H // 2 + 1, :W // 2 + 1]
                      for p in range(2) for q in range(2)]
            xs_ = jnp.concatenate(phases, -1)
            w4 = jnp.zeros((4, 4) + w.shape[2:], w.dtype).at[:3, :3].set(w)
            wk = jnp.zeros((2, 2, 4 * w.shape[2], w.shape[3]), w.dtype)
            C = w.shape[2]
            for p in range(2):
                for q in range(2):
                    wk = wk.at[:, :, C * (2 * p + q):C * (2 * p + q) + C].set(
                        w4[p::2, q::2])
            y = jax.lax.conv_general_dilated(
                xs_, wk, (1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return mish(y + b)
        got = conv2_s2d_any(xs, ws, bs, 16, 20)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"s2d parity max err: {err:.2e}", flush=True)
        if err < 1e-3:
            res["conv2_s2d"] = timed_loop(
                functools.partial(conv2_s2d_any, H=H, W=W), (x2, w2, b2),
                args.iters, "conv2 s2d (2x2 s1 C128)")

    if args.which in ("all", "pallas"):
        from double_yolo_kaist_tpu.ops.pallas_stem import stem_conv_s2
        try:
            res["conv2_pallas"] = timed_loop(
                lambda x, w, b: stem_conv_s2(x, w, b, act="mish"),
                (x2, w2, b2), args.iters, "conv2 pallas acc")
        except Exception as e:
            print(f"conv2 pallas FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)

    if args.which in ("all", "packed"):
        from double_yolo_kaist_tpu.ops.pallas_stem import stem_conv_s2_packed
        for TR in (4, 8, 16, 32):
            try:
                res[f"conv2_packed_tr{TR}"] = timed_loop(
                    functools.partial(stem_conv_s2_packed, act="mish", TR=TR),
                    (x2, w2, b2), args.iters, f"conv2 pallas packed TR={TR}")
            except Exception as e:
                print(f"conv2 packed TR={TR} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)

    print({k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    main()
