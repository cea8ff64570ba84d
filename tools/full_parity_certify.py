"""North-star accuracy certification: full-eval-stack AP parity vs the live
reference at native 512x640 over all 36 bundled KAIST pairs, on TRAINED
weights (BASELINE.md: "AP@0.5 within 0.2 pt of the reference").

Why training is part of the harness: random-init detectors are degenerate
for cross-framework comparison — BN eval-stats (0/1) wash the image signal
out by depth, so every grid cell emits the same box at its own offset with
BIT-EQUAL confidence, and AP becomes pure NMS-tie-order noise that no two
frameworks (not even torchvision CPU vs CUDA) break identically. Round-4
measurements of that regime: 61-89%% detection-set match with ALL matched
pairs agreeing to <=4e-8 in conf and the residual provably tie swaps
(equal-conf IoU>0.5 partners). Briefly self-training the torch reference on
synthesized GT (deterministic person-scale boxes) produces separated,
confident, spatially-localized detections — the regime trained detectors
occupy — after which the two stacks match EXACTLY (round-4 run, 300 steps:
168/168 detections, min matched IoU 1.0000, dAP = 0.00000, dLAMR =
0.00000).

The trained weights + GT are frozen as test fixtures
(tests/fixtures/fullparity/) consumed by tests/test_full_eval_parity.py,
which asserts dAP <= 0.002 in-suite without paying the training cost.
This tool re-derives them from scratch and re-certifies:

  python tools/full_parity_certify.py [--steps 300] [--refresh-fixture]

Reference pipeline exercised end to end: model forward (models.py),
non_max_suppression + clip (build_utils/utils.py:387-464, 83-93),
compute_ap_lamr (other_utils/metrics.py). Ours: KaistDataset(rect) ->
device letterbox -> folded forward -> fixed-shape NMS -> undo ->
eval/metrics.py, all through eval/evaluator.evaluate_dataset.
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import cv2  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.config.ir import compile_cfg  # noqa: E402
from double_yolo_kaist_tpu.data.dataset import KaistDataset  # noqa: E402
from double_yolo_kaist_tpu.eval.evaluator import evaluate_dataset  # noqa: E402
from double_yolo_kaist_tpu.models import layers as _L  # noqa: E402
from double_yolo_kaist_tpu.models.import_weights import (  # noqa: E402
    from_torch_state_dict)

CFG = "kaist_dyolov4_mobilenetv3_fshare_global_cse3.cfg"
IMG_DIR = "/root/reference/imgs/ori"
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures", "fullparity")


def synth_gt(stems):
    """Deterministic person-scale GT boxes (10/image)."""
    g = np.random.default_rng(3)
    labels = []
    for _ in stems:
        rows = []
        for _ in range(10):
            cx, cy = g.uniform(0.08, 0.92), g.uniform(0.1, 0.9)
            bw, bh = g.uniform(0.04, 0.12), g.uniform(0.1, 0.3)
            rows.append([0, cx, cy, bw, bh])
        labels.append(np.asarray(rows, np.float32))
    return labels


def build_eval_root(root, stems, labels):
    os.system(f"rm -rf {root}")
    img_dir, lab_dir = f"{root}/images/set00", f"{root}/labels/set00"
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    logical = []
    for i, st in enumerate(stems):
        os.link(f"{IMG_DIR}/{st}_visible.jpg", f"{img_dir}/{st}_visible.jpg")
        os.link(f"{IMG_DIR}/{st}_lwir.jpg", f"{img_dir}/{st}_lwir.jpg")
        with open(f"{lab_dir}/{st}.txt", "w") as f:
            for r in labels[i]:
                f.write("0 " + " ".join(f"{x:.6f}" for x in r[1:]) + "\n")
        logical.append(f"{img_dir}/{st}.jpg")
    split = f"{root}/mini.txt"
    open(split, "w").write("\n".join(logical) + "\n")
    return split


def run_reference(tm, vs, ls, stems, labels, conf):
    from tests import torch_ref  # noqa: F401  (path setup)
    import test_full_eval_parity as T
    T._patch_torchvision_nms()
    from build_utils.utils import non_max_suppression as ref_nms
    from other_utils.metrics import compute_ap_lamr as ref_ap_lamr

    tm.eval()
    ref_dets = {}
    with torch.no_grad():
        for i0 in range(0, len(stems), 4):
            io, _ = tm(vs[i0:i0 + 4], ls[i0:i0 + 4])
            for k in range(io.shape[0]):
                d = ref_nms(io[k:k + 1], conf_thres=conf, iou_thres=0.6,
                            multi_label=False)[0]
                d = (np.zeros((0, 5), np.float32) if d is None
                     else d.numpy()[:, :5])
                # the reference eval clips to the image (utils.py:83-93)
                d[:, [0, 2]] = d[:, [0, 2]].clip(0, 640)
                d[:, [1, 3]] = d[:, [1, 3]].clip(0, 512)
                ref_dets[i0 + k] = d
    shapes = np.asarray([[640, 512]] * len(stems), np.float64)
    preds = []
    for i in range(len(stems)):
        for b in ref_dets[i]:
            preds.append({"img_id": i, "conf": float(b[4]), "bbox": b[:4]})
    preds.sort(key=lambda p: -p["conf"])
    m = ref_ap_lamr(preds, [x.copy() for x in labels], shapes)
    return ref_dets, m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--conf", type=float, default=0.10)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--refresh-fixture", action="store_true",
                    help="overwrite tests/fixtures/fullparity/ with the "
                         "newly trained weights + GT")
    args = ap.parse_args()

    _L.set_precision("highest")
    from tests.torch_ref import load_reference_yolo
    YOLO = load_reference_yolo()
    import test_full_eval_parity as T
    T._patch_torchvision_nms()
    from build_utils.utils import compute_loss as ref_loss

    stems = sorted(os.path.basename(p)[:-len("_visible.jpg")]
                   for p in glob.glob(f"{IMG_DIR}/*_visible.jpg"))
    labels = synth_gt(stems)
    print(f"{len(stems)} pairs, GT boxes {sum(len(x) for x in labels)}")

    torch.manual_seed(0)
    tm = YOLO(f"/root/reference/config/{CFG}", img_size=(512, 640),
              verbose=False)
    vs, ls = [], []
    for st in stems:
        v0 = cv2.imread(f"{IMG_DIR}/{st}_visible.jpg")
        l0 = cv2.imread(f"{IMG_DIR}/{st}_lwir.jpg")
        vs.append(v0[:, :, ::-1].transpose(2, 0, 1).copy())
        ls.append(l0[:, :, ::-1].transpose(2, 0, 1).copy())
    vs = torch.from_numpy(np.stack(vs)).float() / 255
    ls = torch.from_numpy(np.stack(ls)).float() / 255

    # brief self-training on the synthesized GT (see module docstring)
    tm.hyp = {"box": 3.54, "obj": 64.3, "cls": 37.4, "cls_pw": 1.0,
              "obj_pw": 1.0, "iou_t": 0.20, "fl_gamma": 0.0, "giou": 1.0}
    tm.gr, tm.nc = 1.0, 1
    opt = torch.optim.Adam(tm.parameters(), lr=args.lr)
    tm.train()
    t0 = time.time()
    bs = 6
    for step in range(args.steps):
        i0 = (step * bs) % len(stems)
        idx = [(i0 + k) % len(stems) for k in range(bs)]
        tgt = []
        for bi, ii in enumerate(idx):
            lab = labels[ii]
            t = np.zeros((len(lab), 6), np.float32)
            t[:, 0] = bi
            t[:, 2:] = lab[:, 1:]
            tgt.append(t)
        pred = tm(vs[idx], ls[idx])
        lc = ref_loss(pred, torch.from_numpy(np.concatenate(tgt)), tm)
        loss = lc["box_loss"] + lc["obj_loss"] + lc["class_loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 20 == 0 or step == args.steps - 1:
            print(f"  step {step}: loss={loss.item():.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    tm.eval()

    ref_dets, ref_m = run_reference(tm, vs, ls, stems, labels, args.conf)
    n_ref = sum(len(d) for d in ref_dets.values())
    print(f"ref: n={n_ref} ap={ref_m['ap']:.5f} lamr={ref_m['lamr']:.5f}")

    split = build_eval_root("/tmp/fullparity_certify", stems, labels)
    ir = compile_cfg(f"/root/reference/config/{CFG}")
    variables = from_torch_state_dict(ir, tm.state_dict())
    ds = KaistDataset(split, img_size=640, batch_size=4, rect=True)
    res = evaluate_dataset(ir, variables, ds, batch_size=4,
                           conf_thres=args.conf, iou_thres=0.6,
                           multi_label=False, compute_dtype=jnp.float32)
    dap = abs(res["ap"] - ref_m["ap"])
    print(f"ours: ap={res['ap']:.5f} lamr={res['lamr']:.5f}")
    print(f"dAP={dap:.5f} dLAMR={abs(res['lamr'] - ref_m['lamr']):.5f}")
    assert dap <= 0.002, f"north-star bound violated: dAP={dap}"
    print("CERTIFIED: dAP <= 0.002 (BASELINE.md north star)")

    if args.refresh_fixture:
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        half = {k: v.half().numpy() for k, v in tm.state_dict().items()}
        np.savez_compressed(
            os.path.join(FIXTURE_DIR, "mnv3_selftrained.fp16.npz"), **half)
        np.savez_compressed(os.path.join(FIXTURE_DIR, "gt.npz"),
                            **{st: lab for st, lab in zip(stems, labels)})
        print(f"fixture refreshed under {FIXTURE_DIR}")


if __name__ == "__main__":
    main()
