"""Visual smoke check of the augmentation pipeline (reference
dataset_test.py:42-81): render augmented visible/LWIR pairs with their
transformed boxes to verify label alignment through mosaic/cutout/affine.

Usage:
  python tools/dataset_preview.py --data data/kaist_data.data \
      --img-size 512 [--snow] [--n 4] --out preview.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402

# the axon TPU plugin pins jax_platforms; honor an explicit
# JAX_PLATFORMS=cpu request (env alone is overridden)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from double_yolo_kaist_tpu.config.parser import load_hyp, parse_data_cfg  # noqa: E402
from double_yolo_kaist_tpu.data.dataset import KaistDataset  # noqa: E402
from double_yolo_kaist_tpu.data.pipeline import train_batches  # noqa: E402
from double_yolo_kaist_tpu.utils.draw import draw_boxes  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--hyp", default=os.path.join(os.path.dirname(__file__), "..", "configs", "hyp.scratch.4.yaml"))
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--snow", action="store_true")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="dataset_preview.png")
    args = ap.parse_args()

    hyp = load_hyp(args.hyp) if os.path.exists(args.hyp) else {
        "hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36,
        "degrees": 0, "translate": 0, "scale": 0, "shear": 0}
    dd = parse_data_cfg(args.data)
    ds = KaistDataset(dd["train"], args.img_size, args.n, augment=True,
                      hyp=hyp, snowflake=args.snow)
    (batch, idx), = [next(iter(train_batches(
        ds, args.n, jax.random.PRNGKey(args.seed), img_size=args.img_size,
        hyp=hyp, snowflake=args.snow, seed_epoch=args.seed)))]

    v = (np.asarray(batch["v"]) * 255).astype(np.uint8)
    l = (np.asarray(batch["l"]) * 255).astype(np.uint8)
    t = np.asarray(batch["targets"])
    m = np.asarray(batch["tmask"])
    s = args.img_size

    fig, axes = plt.subplots(args.n, 2, figsize=(10, 5 * args.n))
    axes = np.atleast_2d(axes)
    for i in range(args.n):
        lab = t[i][m[i]]
        boxes = np.stack([(lab[:, 1] - lab[:, 3] / 2) * s,
                          (lab[:, 2] - lab[:, 4] / 2) * s,
                          (lab[:, 1] + lab[:, 3] / 2) * s,
                          (lab[:, 2] + lab[:, 4] / 2) * s], 1) \
            if len(lab) else np.zeros((0, 4))
        scores = np.ones(len(boxes))
        axes[i, 0].imshow(draw_boxes(v[i], boxes, scores, lab[:, 0],
                                     ["person"], 0.0))
        axes[i, 1].imshow(draw_boxes(l[i], boxes, scores, lab[:, 0],
                                     ["person"], 0.0))
        axes[i, 0].set_title(f"visible ({len(boxes)} boxes)")
        axes[i, 1].set_title("lwir")
        for ax in axes[i]:
            ax.axis("off")
    fig.savefig(args.out, bbox_inches="tight", dpi=100)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
