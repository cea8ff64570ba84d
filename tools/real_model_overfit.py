"""Real-zoo-model learning validation: overfit a real cfg (default the
MobileNetv3 dual flagship) on synthetic KAIST-sized pedestrian images and
confirm AP climbs. Validates the full train loop on production configs
(strides, anchors, BN, decode) — the unit suite uses a tiny test cfg.

Usage: python tools/real_model_overfit.py [--steps 150] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.config.ir import compile_cfg  # noqa: E402
from double_yolo_kaist_tpu.models import graph  # noqa: E402
from double_yolo_kaist_tpu.models.zoo import cfg_path  # noqa: E402
from double_yolo_kaist_tpu.ops import nms as NMS  # noqa: E402
from double_yolo_kaist_tpu.eval.metrics import compute_ap_lamr  # noqa: E402
from double_yolo_kaist_tpu.train import loss as LS, optim as OPT  # noqa: E402
from double_yolo_kaist_tpu.train.step import (create_train_state,  # noqa: E402
                                              make_train_step)

HYP = {"lr0": 3e-3, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0,
       "box": 3.54, "obj": 102.88, "cls": 0.468, "cls_pw": 1.0, "obj_pw": 1.0,
       "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0}


def make_data(n=8, h=256, w=320, seed=0):
    """Gray scenes with 1-2 bright 'pedestrian' boxes, visible+lwir."""
    rng = np.random.default_rng(seed)
    v = np.full((n, h, w, 3), 90, np.uint8)
    l = np.full((n, h, w, 3), 70, np.uint8)
    labels = []
    for i in range(n):
        rows = []
        for _ in range(rng.integers(1, 3)):
            cx, cy = rng.uniform(0.2, 0.8), rng.uniform(0.3, 0.75)
            bw, bh = rng.uniform(0.08, 0.14), rng.uniform(0.25, 0.4)
            x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
            x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
            v[i, y1:y2, x1:x2] = rng.integers(160, 255, 3)
            l[i, y1:y2, x1:x2] = 235
            rows.append([0, cx, cy, bw, bh])
        labels.append(np.asarray(rows, np.float32))
    t, m = LS.pad_labels(labels, 8)
    return v, l, t, m, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Double-YOLOv4-MNv3-Fshare-Global-CSE3")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--size", type=int, nargs=2, default=[256, 320])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--min-ap", type=float, default=0.5)
    args = ap.parse_args()

    h, w = args.size
    ir = compile_cfg(cfg_path(args.model))
    v, l, t, m, labels = make_data(h=h, w=w)
    batch = {"v": jnp.asarray(v), "l": jnp.asarray(l),
             "targets": jnp.asarray(t), "tmask": jnp.asarray(m)}

    sched = OPT.cosine_epoch_schedule(HYP["lr0"], HYP["lrf"],
                                      epochs=args.steps, steps_per_epoch=1,
                                      warmup=False)
    tx = OPT.make_optimizer(HYP, sched, sgd=False)
    state = jax.jit(lambda k: create_train_state(ir, k, tx))(
        jax.random.PRNGKey(0))
    step = make_train_step(ir, HYP, tx, compute_dtype=jnp.bfloat16,
                           remat_segments=4)

    @jax.jit
    def infer(params, bn_state, xv, xl):
        (io, _), _ = graph.apply(
            ir, {"params": params, "state": bn_state},
            xv.astype(jnp.float32) / 255.0, xl.astype(jnp.float32) / 255.0,
            train=False, compute_dtype=jnp.bfloat16)
        return NMS.non_max_suppression(io.astype(jnp.float32),
                                       conf_thres=0.01, iou_thres=0.6,
                                       multi_label=False)

    def eval_ap(state):
        det, valid = infer(state.params, state.bn_state,
                           batch["v"], batch["l"])
        det, valid = np.asarray(det), np.asarray(valid)
        preds = []
        for i in range(len(v)):
            for d in det[i][valid[i]]:
                preds.append({"img_id": i, "conf": float(d[4]),
                              "bbox": d[:4]})
        preds.sort(key=lambda p: -p["conf"])
        shapes = np.asarray([[w, h]] * len(v), np.float64)
        return compute_ap_lamr(preds, labels, shapes)["ap"]

    key = jax.random.PRNGKey(1)
    loss = None
    for i in range(args.steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        if (i + 1) % 50 == 0:
            loss = float(metrics["loss"])
            ap = eval_ap(state)
            print(f"step {i + 1}: loss={loss:.2f} AP@0.5={ap * 100:.1f}%",
                  flush=True)
    final_ap = eval_ap(state)
    print(f"final AP@0.5 = {final_ap * 100:.1f}%")
    assert final_ap > args.min_ap, f"real-model overfit failed: {final_ap}"
    print("REAL MODEL OVERFIT PASSED")


if __name__ == "__main__":
    main()
