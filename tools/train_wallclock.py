"""Measured end-to-end training wall clock (VERDICT r2 item 9).

Runs a REAL multi-epoch Trainer.fit on a synthetic KAIST-shaped dataset
(native 512x640 pairs, disk-cached decode) at production settings and
prints per-epoch and total wall time — replacing the round-2 extrapolation
("50-epoch KAIST well under 2h" from bs8 x K8 = 51 img/s) with a measured
number.

Usage:
  python tools/train_wallclock.py [--images 1024] [--epochs 50]
      [--batch 32] [--img-size 512] [--model <zoo name>] [--spd 4]

The dataset size is configurable so the measurement fits a time budget;
steady-state img/s is size-independent (decode is cached after epoch 1),
so the full-KAIST (7989-image) epoch time printed at the end is measured
steps/s scaled by step count — not a throughput guess.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.config.ir import compile_cfg  # noqa: E402
from double_yolo_kaist_tpu.data.dataset import KaistDataset  # noqa: E402
from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path  # noqa: E402
from double_yolo_kaist_tpu.train.trainer import Trainer  # noqa: E402
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

HYP = {"lr0": 1e-3, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
       "box": 3.54, "obj": 102.88, "cls": 0.468, "cls_pw": 1.0,
       "obj_pw": 1.0, "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0,
       "hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36,
       "degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}

KAIST_TRAIN_IMAGES = 7989   # reference data/kaist_data.data train split


def make_dataset(root: str, n: int, hw=(512, 640)):
    img_dir = os.path.join(root, "images", "set00")
    lab_dir = os.path.join(root, "labels", "set00")
    split = os.path.join(root, "train.txt")
    if os.path.exists(split):          # reuse across sweep runs
        lines = open(split).read().splitlines()
        if len(lines) == n and all(
                os.path.exists(p.replace(".jpg", "_visible.jpg"))
                for p in lines[:2]):
            return split
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    logical = []
    for i in range(n):
        v = rng.integers(0, 256, hw + (3,), dtype=np.uint8)
        stem = f"I{i:05d}"
        cv2.imwrite(os.path.join(img_dir, f"{stem}_visible.jpg"), v)
        cv2.imwrite(os.path.join(img_dir, f"{stem}_lwir.jpg"), v)
        cx, cy = rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7)
        with open(os.path.join(lab_dir, f"{stem}.txt"), "w") as f:
            f.write(f"0 {cx:.4f} {cy:.4f} 0.1 0.3\n")
        logical.append(os.path.join(img_dir, f"{stem}.jpg"))
    split = os.path.join(root, "train.txt")
    with open(split, "w") as f:
        f.write("\n".join(logical) + "\n")
    return split


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--model", default=FLAGSHIP)
    ap.add_argument("--spd", type=int, default=4,
                    help="steps per dispatch (scan multi-step)")
    ap.add_argument("--remat", type=int, default=6)
    ap.add_argument("--root", default="/tmp/dyk_train_wallclock")
    ap.add_argument("--fit", action="store_true",
                    help="run the FULL production loop (Trainer.fit: "
                        "in-train eval each epoch, TB scalars, results.txt, "
                        "best checkpoint) instead of bare train epochs — "
                        "the VERDICT-r4 item-7 configuration")
    ap.add_argument("--val-images", type=int, default=2106,
                    help="--fit validation split size (KAIST val = 2106)")
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir to Trainer.load() before --fit "
                         "('auto' = <root>/runs/exp/last, falling back to "
                         "best) — extends a finished run toward --epochs")
    args = ap.parse_args()

    split = make_dataset(args.root, args.images)
    ds = KaistDataset(split, args.img_size, args.batch, augment=True,
                      hyp=HYP, cache_images="disk")
    val_ds = ds
    if args.fit and args.val_images != args.images:
        vsplit = make_dataset(os.path.join(args.root, "val"),
                              args.val_images)
        val_ds = KaistDataset(vsplit, args.img_size, args.batch,
                              augment=False, hyp=HYP, cache_images="disk",
                              rect=True)
    ir = compile_cfg(cfg_path(args.model))
    tr = Trainer(ir, HYP, epochs=args.epochs, batch_size=args.batch,
                 img_size=args.img_size, train_dataset=ds,
                 val_dataset=val_ds,
                 sgd=True, steps_per_dispatch=args.spd,
                 remat_segments=args.remat,
                 out_dir=os.path.join(args.root, "runs"))

    if args.fit:
        if args.resume:
            path = args.resume
            if path == "auto":
                base = os.path.join(args.root, "runs", "exp")
                path = os.path.join(base, "last")
                if not os.path.isdir(path):
                    path = os.path.join(base, "best")
            tr.load(path)
            print(f"[wallclock] resumed {path}: start_epoch="
                  f"{tr.start_epoch} best_map={tr.best_map:.4f}", flush=True)
        t0 = time.perf_counter()
        best = tr.fit(save_best=True)
        total = time.perf_counter() - t0
        print(f"[wallclock] FULL fit: {args.epochs} epochs x "
              f"{args.images} imgs (bs{args.batch}, {args.img_size}px, "
              f"spd={args.spd}, remat={args.remat}, "
              f"val={args.val_images}): total {total / 3600:.2f} h "
              f"wall; best mAP@[.5:.95]={best:.4f}; artifacts in "
              f"{os.path.join(args.root, 'runs')}")
        return

    t0 = time.perf_counter()
    epoch_times = []
    for epoch in range(args.epochs):
        te = time.perf_counter()
        tr.train_one_epoch(epoch, print_freq=1000)
        epoch_times.append(time.perf_counter() - te)
        if epoch in (0, 1) or epoch == args.epochs - 1:
            print(f"[wallclock] epoch {epoch}: {epoch_times[-1]:.1f}s",
                  flush=True)
    total = time.perf_counter() - t0

    steps_per_epoch = args.images // args.batch
    steady = float(np.median(epoch_times[2:] or epoch_times))
    img_s = args.images / steady
    kaist_epoch = steady * (KAIST_TRAIN_IMAGES // args.batch) / steps_per_epoch
    print(f"[wallclock] {args.epochs} epochs x {args.images} imgs "
          f"(bs{args.batch}, {args.img_size}px, spd={args.spd}, "
          f"remat={args.remat}): total {total / 60:.1f} min "
          f"(epoch0 {epoch_times[0]:.0f}s incl. compile+decode-cache)")
    print(f"[wallclock] steady-state {img_s:.1f} img/s -> "
          f"KAIST {KAIST_TRAIN_IMAGES}-img epoch = {kaist_epoch:.0f}s, "
          f"50 epochs = {50 * kaist_epoch / 3600:.2f} h")


if __name__ == "__main__":
    main()
