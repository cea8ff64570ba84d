"""Export a one-file AOT serving artifact (.dykx) for a model.

The artifact bundles the compiled request program (letterbox + BN-folded
forward [bf16 or int8 PTQ] + NMS), the parameter tree, and the letterbox
undo constants — serving.ExportedPredictor (or `cli/serve.py --exported`)
runs it with NO model code on the host. See double_yolo_kaist_tpu/export.py.

    python tools/export_model.py --cfg <cfg> --weights runs/exp/best \
        --src-hw 512 640 --batch 8 --out flagship.dykx
    # int8: artifacts must exist (deterministic export)
    python tools/export_model.py ... --int8 --int8-qvars q.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

from cli.common import build_model  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--conf-thres", type=float, default=0.1)
    p.add_argument("--iou-thres", type=float, default=0.5)
    p.add_argument("--src-hw", type=int, nargs=2, default=(512, 640),
                   metavar=("H", "W"),
                   help="native frame size the artifact is compiled for "
                        "(KAIST default 512 640)")
    p.add_argument("--batch", type=int, default=1,
                   help="compiled batch size (partial batches pad)")
    p.add_argument("--out", type=str, required=True, help=".dykx path")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8-mode", default="chain",
                   choices=("seed", "chain", "all", "edge", "spine", "spineall"))
    p.add_argument("--int8-calib", default="",
                   help="calibration artifact (tools/calibrate.py) — "
                        "required with --int8 unless --int8-qvars exists")
    p.add_argument("--int8-qvars", default="",
                   help="finished quantized-variables artifact")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering targets (default: tpu cpu, falling back "
                        "to the current backend)")
    opt = p.parse_args(argv)

    from double_yolo_kaist_tpu.export import export_serving_artifact
    from double_yolo_kaist_tpu.serving import Predictor

    ir, variables = build_model(opt.cfg, opt.weights)
    predictor = Predictor(
        ir, variables, img_size=opt.img_size, conf_thres=opt.conf_thres,
        iou_thres=opt.iou_thres, batch_buckets=(opt.batch,),
        int8=opt.int8, int8_mode=opt.int8_mode,
        calibration=opt.int8_calib or None,
        quantized=opt.int8_qvars or None)
    meta = export_serving_artifact(predictor, tuple(opt.src_hw), opt.batch,
                                   opt.out, platforms=opt.platforms)
    size_mb = os.path.getsize(opt.out) / 1e6
    print(f"wrote {opt.out} ({size_mb:.1f} MB): "
          f"platforms={meta['platforms']} src_hw={meta['src_hw']} "
          f"batch={meta['batch']} int8={meta['int8']}")
    return meta


if __name__ == "__main__":
    main()
