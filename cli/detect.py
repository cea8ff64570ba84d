"""Single-image detection CLI — reference detect.py:26-169 surface: take
``*_visible.jpg`` paths, find the LWIR sibling, run the dual-stream model,
NMS (conf 0.1, iou 0.5, multi-label), draw a 3-panel figure (visible+boxes,
LWIR+boxes, visible raw), report average FPS and miss rate (fraction of
images with no detections)."""

from __future__ import annotations

import argparse
import glob
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cli.common import build_model  # noqa: E402
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()


def get_pair_paths(path: str):
    """One path of either modality -> (visible, lwir)
    (reference detect.py:51-56)."""
    if "_visible" in path:
        return path, path.replace("_visible", "_lwir")
    if "_lwir" in path:
        return path.replace("_lwir", "_visible"), path
    return (path.replace(".jpg", "_visible.jpg"),
            path.replace(".jpg", "_lwir.jpg"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--source", type=str, required=True,
                   help="image path, glob, or directory of *_visible.jpg")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--conf-thres", type=float, default=0.1)
    p.add_argument("--iou-thres", type=float, default=0.5)
    p.add_argument("--merge-nms", action="store_true",
                   help="merge-NMS (weighted box fusion) variant")
    p.add_argument("--max-images", type=int, default=40)
    p.add_argument("--out-dir", type=str, default="runs/detect")
    p.add_argument("--no-figure", action="store_true")
    opt = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from double_yolo_kaist_tpu.data.pipeline import make_letterbox_fn
    from double_yolo_kaist_tpu.models import graph
    from double_yolo_kaist_tpu.ops import nms as NMS
    from double_yolo_kaist_tpu.utils.draw import draw_boxes

    if os.path.isdir(opt.source):
        paths = sorted(glob.glob(os.path.join(opt.source, "*_visible.jpg")))
    else:
        paths = sorted(glob.glob(opt.source))
    random.shuffle(paths)
    paths = paths[:opt.max_images]
    if not paths:
        raise FileNotFoundError(f"no images match {opt.source}")

    ir, variables = build_model(opt.cfg, opt.weights)
    folded = jax.jit(lambda v: graph.prepare_folded(
        ir, graph.fold_batchnorm(ir, v),
        opt.img_size, opt.img_size))(variables)

    @jax.jit
    def infer(params, xv, xl):
        io, _ = graph.apply_folded(ir, params, xv, xl,
                                   compute_dtype=jnp.bfloat16)
        det, valid = NMS.non_max_suppression(
            io.astype(jnp.float32), conf_thres=opt.conf_thres,
            iou_thres=opt.iou_thres, multi_label=True, merge=opt.merge_nms)
        # valid packed as a 7th channel: one host fetch per image
        return jnp.concatenate([det, valid[..., None].astype(det.dtype)], -1)

    os.makedirs(opt.out_dir, exist_ok=True)
    pre_cache = {}
    n_missed, total_time = 0, 0.0
    for path in paths:
        vp, lp = get_pair_paths(path)
        v0 = cv2.imread(vp)[:, :, ::-1]
        l0 = cv2.imread(lp)[:, :, ::-1]
        src_hw = v0.shape[:2]
        # letterbox to a mod-64 rectangle (reference detect.py auto=True)
        s = opt.img_size
        r = s / max(src_hw)
        fit_h = int(np.ceil(src_hw[0] * r / 64) * 64)
        fit_w = int(np.ceil(src_hw[1] * r / 64) * 64)
        sig = (src_hw, (fit_h, fit_w))
        if sig not in pre_cache:
            # single-stage letterbox: the reference detect flow letterboxes
            # the raw frame directly (detect.py:26-48, auto=True mod-64 pad)
            pre_cache[sig] = make_letterbox_fn(src_hw, (fit_h, fit_w),
                                               scale_up=False)
        fn, ratio, pad = pre_cache[sig]
        xv, xl = fn(jnp.asarray(v0[None]), jnp.asarray(l0[None]))

        t0 = time.perf_counter()
        packed = np.asarray(infer(folded, xv, xl))[0]
        det, valid = packed[:, :6], packed[:, 6] > 0.5
        total_time += time.perf_counter() - t0

        d = det[valid]
        if len(d) == 0:
            n_missed += 1
        boxes = d[:, :4].copy()
        if len(boxes):
            boxes[:, [0, 2]] -= pad[0]
            boxes[:, [1, 3]] -= pad[1]
            boxes /= ratio[0]
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, src_hw[1])
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, src_hw[0])

        if not opt.no_figure:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            v_drawn = draw_boxes(np.ascontiguousarray(v0), boxes, d[:, 4],
                                 d[:, 5], ["person"], opt.conf_thres)
            l_drawn = draw_boxes(np.ascontiguousarray(l0), boxes, d[:, 4],
                                 d[:, 5], ["person"], opt.conf_thres)
            fig, axes = plt.subplots(1, 3, figsize=(15, 5))
            for ax, im, title in zip(axes, (v_drawn, l_drawn, v0),
                                     ("visible", "lwir", "original")):
                ax.imshow(im)
                ax.set_title(title)
                ax.axis("off")
            fig.savefig(os.path.join(
                opt.out_dir, os.path.basename(vp).replace(
                    "_visible", "_det")), bbox_inches="tight", dpi=100)
            plt.close(fig)
        print(f"{os.path.basename(vp)}: {len(d)} detections")

    fps = len(paths) / total_time if total_time else 0.0
    print(f"average fps: {fps:.2f}")
    print(f"miss rate (no-detection fraction): {n_missed / len(paths):.3f}")


if __name__ == "__main__":
    main()
