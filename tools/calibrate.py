"""Offline int8 calibration: produce a reusable activation-scale artifact.

Runs representative frames (a dataset split, letterboxed exactly like the
serve/eval path) through the BN-folded model, records the activation
statistics every quantization mode needs, and writes them to an .npz
(models/quantize.save_calibration). Serving then starts fully quantized —
``Predictor(calibration=path)`` / ``cli/serve.py --int8-calib path`` —
instead of depending on the first live requests, and every replica in a
fleet shares ONE frozen calibration (reproducible accuracy; the reference
has no serving/PTQ layer, so there is no counterpart — this is the
deployment half of the int8 path benchmarked in bench.py).

Usage:
  python tools/calibrate.py --cfg <cfg|zoo name> --weights <ckpt dir|.pt|
      .weights> --data m.data [--split valid] [--img-size 512]
      [--batches 8] [--batch-size 8] [--pct 100.0] --out calib.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# the axon TPU plugin pins jax_platforms; honor an explicit
# JAX_PLATFORMS=cpu request (env alone is overridden)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from cli.common import build_model  # noqa: E402
from double_yolo_kaist_tpu.config.parser import parse_data_cfg  # noqa: E402
from double_yolo_kaist_tpu.data.dataset import KaistDataset  # noqa: E402
from double_yolo_kaist_tpu.data.pipeline import eval_batches  # noqa: E402
from double_yolo_kaist_tpu.models import graph  # noqa: E402
from double_yolo_kaist_tpu.models import quantize as Q  # noqa: E402
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--weights", default="")
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="valid",
                   choices=("train", "valid", "test"))
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--batches", type=int, default=8,
                   help="calibration batches (more = wider coverage of the "
                        "activation range; max-abs only ever grows)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--pct", type=float, default=100.0,
                   help="percentile max-abs clipping; 100 = exact max-abs "
                        "(framework default — see serving.Predictor)")
    p.add_argument("--fp32", action="store_true",
                   help="measure in float32 (CPU smoke runs)")
    p.add_argument("--out", required=True, help="output .npz artifact")
    p.add_argument("--quantized-out", default="",
                   help="also export the finished quantized variables "
                        "(.npz, models/quantize.save_quantized) so servers "
                        "skip the startup quantize compile entirely "
                        "(cli/serve.py --int8-qvars)")
    p.add_argument("--int8-mode", default="chain",
                   choices=("seed", "chain", "all", "edge", "spine", "spineall"),
                   help="PTQ plan baked into --quantized-out")
    opt = p.parse_args(argv)

    enable_compile_cache()
    dtype = jnp.float32 if opt.fp32 else jnp.bfloat16
    ir, variables = build_model(opt.cfg, opt.weights)
    folded = jax.jit(lambda v: graph.fold_batchnorm(ir, v))(variables)
    folded = jax.tree.map(lambda a: a.astype(dtype), folded)

    split_txt = parse_data_cfg(opt.data)[opt.split]
    ds = KaistDataset(split_txt, img_size=opt.img_size,
                      batch_size=opt.batch_size, rect=True)

    def frames():
        for i, (xv, xl, _idx, _rp) in enumerate(
                eval_batches(ds, opt.batch_size)):
            if i >= opt.batches:
                return
            yield xv.astype(dtype), xl.astype(dtype)

    stats = Q.calibrate(ir, folded, frames(), compute_dtype=dtype,
                        pct=opt.pct)
    Q.save_calibration(opt.out, stats, pct=opt.pct)
    n_vec = sum(1 for v in stats.values() if getattr(v, "ndim", 0))
    print(f"calibration: {len(stats)} stats ({n_vec} per-channel vectors) "
          f"from {min(opt.batches, len(ds) // opt.batch_size)} batches "
          f"@pct={opt.pct} -> {opt.out}")

    if opt.quantized_out:
        # hw must match the serving Predictor's prepare size
        # ((img_size, img_size)) or its s2d kernels silently fall back to
        # per-call transforms
        hw = (opt.img_size, opt.img_size)
        qvars = jax.jit(lambda f: Q.quantize(
            ir, f, stats, mode=opt.int8_mode, hw=hw))(folded)
        Q.save_quantized(opt.quantized_out, qvars, mode=opt.int8_mode,
                         hw=hw)
        print(f"quantized variables (mode={opt.int8_mode}, hw={hw}) -> "
              f"{opt.quantized_out}")


if __name__ == "__main__":
    main()
