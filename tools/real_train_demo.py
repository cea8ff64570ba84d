"""Real-image end-to-end training demo through the shipped CLIs.

Stages a dataset from the bundled reference KAIST pairs
(/root/reference/imgs/ori, 36 visible+lwir pairs — the only real imagery
available in this environment), attaches deterministic pseudo-labels, then
drives the ACTUAL production entry points as subprocesses:

    cli/train.py    (KaistDataset -> CLAHE -> mosaic/affine/HSV augment ->
                     fused jitted train step -> checkpoint)
    cli/evaluate.py (letterbox -> folded forward -> NMS -> scale_coords ->
                     COCO stats + VOC-AP + LAMR)

and reports the final train-split AP. With real KAIST annotations absent,
the labels are seeded pedestrian-shaped boxes: the demo's claim is that the
optimizer drives the FULL production pipeline to high AP on real imagery
(JPEG statistics, CLAHE histograms, mosaic over real scenes) — the
learning-dynamics half of the accuracy story, complementing the
full-eval-stack parity test (tests/test_full_eval_parity.py) which pins the
metric half against the live reference. Reference analogue: train.py ->
evaluate.py over KAIST (reference train.py:33-214, evaluate.py:31-123).

Usage:
    python tools/real_train_demo.py                  # TPU, flagship cfg
    python tools/real_train_demo.py --epochs 150 --img-size 320
    python tools/real_train_demo.py --cpu --cfg tests/fixtures/tiny_dyolov3.cfg
"""

import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMG_DIR = "/root/reference/imgs/ori"


def stage_dataset(root: str, seed: int = 0):
    """Copy the bundled pairs; write seeded pedestrian-shaped labels."""
    img_dir = os.path.join(root, "images", "set00")
    lab_dir = os.path.join(root, "labels", "set00")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    stems = sorted({os.path.basename(p).rsplit("_", 1)[0]
                    for p in glob.glob(os.path.join(IMG_DIR, "*_visible.jpg"))})
    assert stems, f"no bundled pairs under {IMG_DIR}"
    rng = np.random.default_rng(seed)
    logical = []
    for stem in stems:
        for mod in ("visible", "lwir"):
            src = os.path.join(IMG_DIR, f"{stem}_{mod}.jpg")
            shutil.copy(src, os.path.join(img_dir, f"{stem}_{mod}.jpg"))
        rows = []
        for _ in range(int(rng.integers(1, 3))):
            bw, bh = rng.uniform(0.06, 0.12), rng.uniform(0.18, 0.35)
            cx = rng.uniform(bw / 2 + 0.02, 1 - bw / 2 - 0.02)
            cy = rng.uniform(bh / 2 + 0.05, 1 - bh / 2 - 0.05)
            rows.append(f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        with open(os.path.join(lab_dir, f"{stem}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
        logical.append(os.path.join(img_dir, f"{stem}.jpg"))
    split = os.path.join(root, "train.txt")
    with open(split, "w") as f:
        f.write("\n".join(logical))
    data = os.path.join(root, "demo.data")
    with open(data, "w") as f:
        f.write(f"classes=1\ntrain={split}\nvalid={split}\ntest={split}\n")
    return data, len(stems)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        REPO, "configs", "kaist_dyolov4_fshare_global_concat_se3.cfg"))
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--root", default="/tmp/real_train_demo")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--assert-ap", type=float, default=0.0,
                    help="fail unless final train-split VOC-AP >= this")
    args = ap.parse_args()

    env = dict(os.environ)
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"

    data, n = stage_dataset(args.root)
    print(f"# staged {n} real pairs under {args.root}", flush=True)

    run_dir = os.path.join(args.root, "runs")
    t0 = time.perf_counter()
    train = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train.py"),
         "--cfg", args.cfg, "--data", data,
         "--img-size", str(args.img_size),
         "--batch-size", str(args.batch_size),
         "--epochs", str(args.epochs), "--cache-images", "ram",
         "--steps-per-dispatch", "4",
         "--notest", "--name", "demo", "--out-dir", run_dir],
        env=env, text=True, capture_output=True)
    train_s = time.perf_counter() - t0
    sys.stderr.write(train.stdout[-2000:] + train.stderr[-2000:])
    assert train.returncode == 0, "train CLI failed"
    ckpt = os.path.join(run_dir, "demo", "best")
    assert os.path.exists(ckpt), f"no checkpoint at {ckpt}"
    print(f"# train CLI done in {train_s:.0f}s", flush=True)

    t1 = time.perf_counter()
    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "evaluate.py"),
         "--cfg", args.cfg, "--weights", ckpt, "--data", data,
         "--test-type", "test", "--img-size", str(args.img_size),
         "--batch-size", str(args.batch_size)],
        env=env, text=True, capture_output=True)
    sys.stderr.write(ev.stdout[-3000:] + ev.stderr[-1500:])
    assert ev.returncode == 0, "evaluate CLI failed"
    m = re.search(r"\(VOC-AP\)@\[IoU = 0.5\] = ([0-9.]+)%", ev.stdout)
    assert m, "no VOC-AP line in evaluate output"
    ap50 = float(m.group(1)) / 100.0
    lamr = re.search(r"\(LAMR\)@\[IoU = 0.5\] = ([0-9.]+)%", ev.stdout)
    print(json.dumps({
        "pairs": n, "epochs": args.epochs, "img_size": args.img_size,
        "train_wall_s": round(train_s, 1),
        "eval_wall_s": round(time.perf_counter() - t1, 1),
        "train_split_voc_ap": round(ap50, 4),
        "train_split_lamr": (round(float(lamr.group(1)) / 100.0, 4)
                             if lamr else None),
    }), flush=True)
    if ap50 < args.assert_ap:
        sys.exit(f"AP {ap50:.3f} < required {args.assert_ap}")


if __name__ == "__main__":
    main()
