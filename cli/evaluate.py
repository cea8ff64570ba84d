"""Offline evaluation CLI — reference evaluate.py:126-145 surface: COCO
stats + VOC-AP@0.5 + LAMR + FPS on the test / day_test / night_test splits,
optional .npy curve dump."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cli.common import DEFAULT_HYP, build_model  # noqa: E402
from double_yolo_kaist_tpu.config.parser import load_hyp, parse_data_cfg  # noqa: E402
from double_yolo_kaist_tpu.data.dataset import KaistDataset  # noqa: E402
from double_yolo_kaist_tpu.eval.coco_map import summarize  # noqa: E402
from double_yolo_kaist_tpu.eval.evaluator import evaluate_dataset  # noqa: E402
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="data/kaist_data.data")
    p.add_argument("--test-type", type=str, default="test",
                   choices=["test", "day_test", "night_test", "valid"])
    p.add_argument("--hyp", type=str, default=DEFAULT_HYP)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--npy-path", type=str, default="")
    p.add_argument("--conf-thres", type=float, default=0.01)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--merge-nms", action="store_true",
                   help="merge-NMS (weighted box fusion) variant")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="selective post-training int8 inference")
    p.add_argument("--calibration-pct", type=float, default=100.0,
                   help="int8 calibration percentile (100 = exact max-abs)")
    p.add_argument("--int8-mode", default="chain",
                   choices=("seed", "chain", "all", "edge", "spine", "spineall"),
                   help="quantization plan: 3x3-only / int8 chains / all convs")
    p.add_argument("--int8-calib", default="",
                   help="calibration artifact (.npz, tools/calibrate.py): "
                        "evaluate the same frozen quantization deployment "
                        "serves; if missing, this run's stats are saved there")
    p.add_argument("--int8-qvars", default="",
                   help="quantized-variables artifact (.npz, tools/"
                        "calibrate.py --quantized-out): evaluate the LITERAL "
                        "int8 model serving loads (strongest deployment "
                        "certification)")
    p.add_argument("--cache-images", choices=("ram", "disk"), default=None,
                   help="cache decoded pairs (see cli/train.py)")
    p.add_argument("--device-cache", choices=("auto", "on", "off"),
                   default="auto",
                   help="keep the eval split's u8 pairs resident (HBM if it "
                        "fits DYK_DEVICE_CACHE_GB, else pinned host memory) "
                        "and gather batches device-side instead of "
                        "re-uploading them")
    opt = p.parse_args(argv)

    import jax.numpy as jnp

    data_dict = parse_data_cfg(opt.data)
    ds = KaistDataset(data_dict[opt.test_type], opt.img_size, opt.batch_size,
                      hyp=load_hyp(opt.hyp) if os.path.exists(opt.hyp) else {},
                      rect=True, cache_images=opt.cache_images)
    ir, variables = build_model(opt.cfg, opt.weights)
    res = evaluate_dataset(
        ir, variables, ds, batch_size=opt.batch_size,
        conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
        compute_dtype=jnp.float32 if opt.fp32 else jnp.bfloat16,
        int8=opt.int8, int8_mode=opt.int8_mode, merge=opt.merge_nms,
        calibration_pct=opt.calibration_pct,
        calibration=opt.int8_calib or None,
        quantized=opt.int8_qvars or None,
        device_cache={"auto": None, "on": True, "off": False}[opt.device_cache],
        progress=True)

    print(summarize(res["coco_stats"]))
    print(f"VOC Average Precision (VOC-AP)@[IoU = 0.5] = {res['ap'] * 100:.2f}%")
    print(f"Log Average Miss Rate (LAMR)@[IoU = 0.5] = {res['lamr'] * 100:.2f}%")
    print(f"average detecting fps: {res['fps']:.2f} "
          "(forward+NMS+fetch; reference evaluate.py times forward-only)")
    if opt.npy_path:
        np.save(opt.npy_path, {**res["curves"], "ap": res["ap"],
                               "lamr": res["lamr"]})


if __name__ == "__main__":
    main()
