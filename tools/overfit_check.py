"""Learning-dynamics sanity: overfit the tiny model on a synthetic 8-image
dataset and confirm AP@0.5 climbs — validates pipeline -> loss -> gradients
-> decode -> NMS -> metrics end to end (no KAIST data required).

Usage: python tools/overfit_check.py [epochs]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402

# the axon TPU plugin pins jax_platforms; honor an explicit
# JAX_PLATFORMS=cpu request (env alone is overridden)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.config.ir import compile_cfg  # noqa: E402
from double_yolo_kaist_tpu.config.parser import parse_data_cfg  # noqa: E402
from double_yolo_kaist_tpu.data.dataset import KaistDataset  # noqa: E402
from double_yolo_kaist_tpu.eval.evaluator import evaluate_dataset  # noqa: E402
from double_yolo_kaist_tpu.train import optim as OPT  # noqa: E402
from double_yolo_kaist_tpu.data.pipeline import train_batches  # noqa: E402
from double_yolo_kaist_tpu.train.step import (create_train_state,  # noqa: E402
                                              make_train_step)

HYP = {"lr0": 5e-3, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0,
       "box": 3.54, "obj": 64.3, "cls": 37.4, "cls_pw": 1.0, "obj_pw": 1.0,
       "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0,
       "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
       "degrees": 0, "translate": 0, "scale": 0, "shear": 0}


def make_dataset(root):
    img_dir = os.path.join(root, "images", "set00")
    lab_dir = os.path.join(root, "labels", "set00")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    rng = np.random.default_rng(0)
    logical = []
    for i in range(8):
        v = np.full((128, 160, 3), 40, np.uint8)
        l = np.full((128, 160, 3), 60, np.uint8)
        # one bright "pedestrian" rectangle per image at a random spot
        cx, cy = rng.uniform(0.25, 0.75), rng.uniform(0.3, 0.7)
        w, h = 0.15, 0.4
        x1, y1 = int((cx - w / 2) * 160), int((cy - h / 2) * 128)
        x2, y2 = int((cx + w / 2) * 160), int((cy + h / 2) * 128)
        v[y1:y2, x1:x2] = (220, 180, 120)
        l[y1:y2, x1:x2] = 230
        stem = f"I{i:05d}"
        cv2.imwrite(os.path.join(img_dir, f"{stem}_visible.jpg"), v)
        cv2.imwrite(os.path.join(img_dir, f"{stem}_lwir.jpg"), l)
        with open(os.path.join(lab_dir, f"{stem}.txt"), "w") as f:
            f.write(f"0 {cx:.4f} {cy:.4f} {w} {h}\n")
        logical.append(os.path.join(img_dir, f"{stem}.jpg"))
    split = os.path.join(root, "train.txt")
    with open(split, "w") as f:
        f.write("\n".join(logical) + "\n")
    return split


def main(epochs: int = 60, int8: bool = False, int8_tol: float = 0.05,
         int8_pcts: tuple = (100.0,), edge_tol: float = 0.15):
    """Overfit the tiny model; assert final AP@0.5 > 0.5.

    ``int8``: additionally evaluate the TRAINED weights through
    models/quantize.apply_quantized in all plan modes and assert the
    quantized AP stays within ``int8_tol`` of the fp run — this attaches an
    accuracy claim to the int8 throughput path (BASELINE.md couples fps and
    AP; a speed number without an AP gate is not a result).
    ``int8_pcts``: calibration clipping percentiles to check (the 100 vs
    99.9 max-abs tradeoff).
    ``edge_tol``: looser bound for mode='edge' only — edge stores (nearly)
    every activation edge int8, and on this 16-channel 64px tiny model the
    per-channel scale folding is proportionally coarse: across training
    seeds edge has measured anywhere from +7.5 ABOVE fp to −0.11 below it
    (production models have C >= 64). edge is the documented
    measured-slower alternative (docs/ROADMAP.md) and is never the graded
    or default path; the serveable modes (seed/chain/all) keep the strict
    ``int8_tol``.
    """
    tmp = tempfile.mkdtemp()
    split = make_dataset(tmp)
    train_ds = KaistDataset(split, 64, 8, augment=True, hyp=HYP)
    val_ds = KaistDataset(split, 64, 8, rect=True)
    ir = compile_cfg(os.path.join(os.path.dirname(__file__), "..", "tests",
                                  "fixtures", "tiny_dyolov3.cfg"),
                     yolo_strides=[8, 4])
    sched = OPT.cosine_epoch_schedule(HYP["lr0"], HYP["lrf"], epochs, 1,
                                      warmup=False)
    tx = OPT.make_optimizer(HYP, sched, sgd=False)
    state = create_train_state(ir, jax.random.PRNGKey(0), tx)
    step = make_train_step(ir, HYP, tx, compute_dtype=jnp.float32)

    key = jax.random.PRNGKey(7)
    ap_history = []
    for epoch in range(epochs):
        for batch, _ in train_batches(train_ds, 8, jax.random.fold_in(key, epoch),
                                      img_size=64, hyp=HYP, seed_epoch=epoch):
            state, metrics = step(state, batch, jax.random.fold_in(key, epoch))
        if epoch % 10 == 9 or epoch == epochs - 1:
            res = evaluate_dataset(
                ir, {"params": state.params, "state": state.bn_state},
                val_ds, batch_size=8, conf_thres=0.01,
                compute_dtype=jnp.float32, folded=False)
            ap_history.append(res["ap"])
            print(f"epoch {epoch}: loss={float(metrics['loss']):.2f} "
                  f"AP@0.5={res['ap'] * 100:.1f}% LAMR={res['lamr'] * 100:.1f}%",
                  flush=True)
    print("AP trajectory:", [f"{a * 100:.1f}" for a in ap_history])
    assert ap_history[-1] > 0.5, "overfit failed to reach AP 50%"
    fp_ap = float(ap_history[-1])
    int8_aps: dict = {}
    if int8:
        variables = {"params": state.params, "state": state.bn_state}
        for pct in int8_pcts:
            for mode in ("seed", "chain", "all", "edge", "spine",
                         "spineall"):
                res_q = evaluate_dataset(
                    ir, variables, val_ds, batch_size=8, conf_thres=0.01,
                    compute_dtype=jnp.float32, int8=True, int8_mode=mode,
                    calibration_batches=1, calibration_pct=pct)
                int8_aps[(mode, pct)] = float(res_q["ap"])
                print(f"int8[{mode}, pct={pct}]: AP@0.5="
                      f"{res_q['ap'] * 100:.1f}% "
                      f"(fp {fp_ap * 100:.1f}%)", flush=True)
                tol = edge_tol if mode == "edge" else int8_tol
                assert res_q["ap"] >= fp_ap - tol, (
                    f"int8 {mode}@pct{pct} AP {res_q['ap']:.3f} fell more "
                    f"than {tol} below fp {fp_ap:.3f}")
        print("INT8 AP GATE PASSED")
    print("OVERFIT CHECK PASSED")
    return (fp_ap, int8_aps) if int8 else fp_ap


if __name__ == "__main__":
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    main(int(nums[0]) if nums else 60,
         int8="--int8" in sys.argv,
         int8_pcts=(100.0, 99.9) if "--pct-sweep" in sys.argv else (100.0,))
