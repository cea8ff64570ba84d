"""Serving-path throughput: the full Predictor pipeline (host uint8 in →
letterbox → forward → NMS → boxes out) on the real chip.

Unlike bench.py (forward+decode only), this measures what a deployed
server delivers per chip, including pre/post-processing and host↔device
transfers. Usage:
  python tools/serving_bench.py [--batch 16] [--int8] [--n 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from double_yolo_kaist_tpu.config.ir import compile_cfg  # noqa: E402
from double_yolo_kaist_tpu.models import graph  # noqa: E402
from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path  # noqa: E402
from double_yolo_kaist_tpu.serving import Predictor  # noqa: E402
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=FLAGSHIP)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=10, help="timed batches")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--exported", default="",
                    help="time a .dykx AOT artifact (tools/export_model.py) "
                         "instead of a live Predictor; --batch must match "
                         "the artifact's compiled batch")
    args = ap.parse_args()

    import jax

    if args.exported:
        from double_yolo_kaist_tpu.export import ExportedPredictor

        if args.int8:
            raise SystemExit("--int8 with --exported: precision is baked "
                             "into the artifact (meta['int8']); drop the "
                             "flag")
        pred = ExportedPredictor(args.exported)
        if args.batch != pred.batch:
            print(f"# --batch {args.batch} ignored: artifact compiled for "
                  f"batch {pred.batch}", flush=True)
        if tuple(pred.src_hw) != (512, 640):
            print(f"# artifact src_hw {pred.src_hw} (not the KAIST "
                  f"512x640)", flush=True)
        args.batch = pred.batch
        h, w = pred.src_hw
        args.model = os.path.basename(args.exported)
    else:
        h, w = 512, 640
        ir = compile_cfg(cfg_path(args.model))
        variables = jax.jit(
            lambda k: graph.init(ir, k))(jax.random.PRNGKey(0))
        pred = Predictor(ir, variables, img_size=512,
                         batch_buckets=(args.batch,), int8=args.int8,
                         calibration_batches=1)

    rng = np.random.default_rng(0)
    v = rng.integers(0, 255, (args.batch, h, w, 3), dtype=np.uint8)
    l = rng.integers(0, 255, (args.batch, h, w, 3), dtype=np.uint8)

    out = pred(v, l)                       # compile + warm (+ int8 calib)
    while args.int8 and not args.exported and pred._qvars is None:
        out = pred(v, l)                   # finish calibration
    out = pred(v, l)                       # warm the final program
    t0 = time.perf_counter()
    for _ in range(args.n):
        out = pred(v, l)
    dt = (time.perf_counter() - t0) / args.n
    assert len(out) == args.batch
    fps = args.batch / dt
    if args.exported:
        mode = ("int8" if pred.meta.get("int8") else "bf16") + " exported"
    else:
        mode = "int8" if args.int8 else "bf16"
    print(f"serving e2e ({args.model}, {mode}, bs{args.batch}): "
          f"{dt * 1e3:.1f} ms/batch = {fps:.1f} img/s "
          f"(decode excluded; letterbox+forward+NMS+fetch included)")


if __name__ == "__main__":
    main()
