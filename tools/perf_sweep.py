"""TPU inference perf sweep: batch size x conv-output dtype x image size.

Same timing protocol as bench.py (async enqueue, single flush — through the
axon tunnel block_until_ready is a no-op); run on the real chip:
  python tools/perf_sweep.py --model Double-YOLOv4-Fshare-Global-CSE3
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.config.ir import compile_cfg  # noqa: E402
from double_yolo_kaist_tpu.models import graph  # noqa: E402
from double_yolo_kaist_tpu.models import layers as L  # noqa: E402
from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path  # noqa: E402
from double_yolo_kaist_tpu.utils.profiling import flops_estimate  # noqa: E402


def time_fwd(fwd, params, xv, xl, iters: int) -> float:
    np.asarray(fwd(params, xv, xl)[0, 0, 0])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fwd(params, xv, xl)[0, 0, 0])
    t1 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fwd(params, xv, xl)
    np.asarray(o[0, 0, 0])
    t2 = time.perf_counter()
    return (t2 - t1) - (t1 - t0)  # overhead-cancelled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=FLAGSHIP)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--sizes", type=str, nargs="+", default=["512x640"])
    args = ap.parse_args()

    ir = compile_cfg(cfg_path(args.model))
    variables = jax.jit(lambda k: graph.init(ir, k))(jax.random.PRNGKey(0))
    folded32 = jax.jit(lambda v: graph.fold_batchnorm(ir, v))(variables)
    folded16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), folded32)
    rng = np.random.default_rng(0)

    for size in args.sizes:
        h, w = (int(x) for x in size.split("x"))
        gflops = flops_estimate(ir, (h, w)) / 1e9
        for out_dtype in ("f32", "bf16"):
            L.set_conv_out_dtype(jnp.float32 if out_dtype == "f32"
                                 else jnp.bfloat16)

            @jax.jit
            def fwd(params, xv, xl):
                io, _ = graph.apply_folded(ir, params, xv, xl,
                                           compute_dtype=jnp.bfloat16)
                return io

            for B in args.batches:
                x = jnp.asarray(rng.random((B, h, w, 3), np.float32),
                                jnp.bfloat16)
                try:
                    dt = time_fwd(fwd, folded16, x, x, args.iters)
                except Exception as e:  # OOM etc
                    print(f"{size} {out_dtype} B={B}: FAILED {type(e).__name__}",
                          flush=True)
                    continue
                fps = B * args.iters / dt
                tflops = fps * gflops / 1e3
                print(f"{size} conv_out={out_dtype} B={B}: {fps:8.1f} fps  "
                      f"({tflops:.0f} TFLOP/s, {tflops / 394 * 100:.0f}% peak)",
                      flush=True)


if __name__ == "__main__":
    main()
