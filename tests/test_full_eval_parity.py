"""FULL-eval-stack parity against the live reference on the bundled KAIST
pairs: the strongest accuracy proxy available without a KAIST checkout.

Both frameworks run their COMPLETE offline-eval pipelines end to end with
identical imported weights over the same mini-split built from
/root/reference/imgs/ori:
  reference: LoadKaistImagesAndLabels(rect) -> collate -> torch forward ->
    its non_max_suppression -> scale_coords -> other_utils/metrics.py
    compute_ap_lamr (all reference code, in-process)
  ours: KaistDataset(rect) -> device letterbox -> jitted folded forward ->
    fixed-shape NMS -> letterbox undo -> eval/metrics.py
and the printed VOC-AP@0.5 / LAMR must agree. Ground truth is synthesized
from the reference model's OWN confident detections, so the metrics are
far from degenerate (AP ~ high) and the greedy TP/FP matching logic is
genuinely exercised.

The reference's third metric family (pycocotools COCO stats,
train_utils/coco_eval.py) cannot run here — pycocotools is not installed
in this environment (its import fails), which is also why our COCO adapter
(eval/coco_map.py) is validated against hand-computed fixtures instead.
"""

import os

import cv2
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.data.dataset import KaistDataset
from double_yolo_kaist_tpu.eval.evaluator import evaluate_dataset
from double_yolo_kaist_tpu.models import layers as _L
from double_yolo_kaist_tpu.models.import_weights import from_torch_state_dict

from tests.torch_ref import load_reference_yolo

_L.set_precision("highest")


def _torch_nms(boxes, scores, iou_thres):
    """Exact torchvision.ops.nms semantics (greedy by descending score,
    suppress IoU > threshold) — torchvision isn't installed here, and
    tests/torch_ref.py stubs it with None, so the reference's own
    non_max_suppression gets this drop-in when running in-process."""
    order = scores.argsort(descending=True)
    b = boxes[order]
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    alive = torch.ones(len(order), dtype=torch.bool)
    keep = []
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        lt = torch.maximum(b[i, :2], b[:, :2])
        rb = torch.minimum(b[i, 2:], b[:, 2:])
        inter = (rb - lt).clamp(min=0).prod(1)
        iou = inter / (areas[i] + areas - inter)
        alive &= iou <= iou_thres
    return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)


def _patch_torchvision_nms():
    import torchvision
    torchvision.ops.nms = _torch_nms


CFG = "/root/reference/config/kaist_dyolov3_add_sl.cfg"
IMG_DIR = "/root/reference/imgs/ori"
IMG_SIZE = 256
STEMS = ["I00066", "I00070", "I00125", "I00200", "I00304", "I00414",
         "I00647", "I00737"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("fullparity")
    img_dir = root / "images" / "set00"
    lab_dir = root / "labels" / "set00"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)

    YOLO = load_reference_yolo()
    _patch_torchvision_nms()
    torch.manual_seed(0)
    tm = YOLO(CFG, img_size=(IMG_SIZE, IMG_SIZE), verbose=False)
    tm.eval()

    from build_utils.img_utils import letterbox as ref_letterbox
    from build_utils.utils import non_max_suppression as ref_nms
    from build_utils.utils import scale_coords as ref_scale

    logical = []
    for stem in STEMS:
        v0 = cv2.imread(os.path.join(IMG_DIR, f"{stem}_visible.jpg"))
        l0 = cv2.imread(os.path.join(IMG_DIR, f"{stem}_lwir.jpg"))
        assert v0 is not None and l0 is not None, stem
        cv2.imwrite(str(img_dir / f"{stem}_visible.jpg"), v0)
        cv2.imwrite(str(img_dir / f"{stem}_lwir.jpg"), l0)

        # ground truth := the reference model's own confident detections,
        # so both pipelines chase a realistic, non-degenerate target
        h0, w0 = v0.shape[:2]
        v_lb, ratio, pad = ref_letterbox(v0.copy(), (IMG_SIZE, IMG_SIZE),
                                         auto=False, scale_up=False)
        l_lb, _, _ = ref_letterbox(l0.copy(), (IMG_SIZE, IMG_SIZE),
                                   auto=False, scale_up=False)
        tv = torch.from_numpy(
            v_lb[:, :, ::-1].transpose(2, 0, 1).copy()).float()[None] / 255
        tl = torch.from_numpy(
            l_lb[:, :, ::-1].transpose(2, 0, 1).copy()).float()[None] / 255
        with torch.no_grad():
            io, _ = tm(tv, tl)
        det = ref_nms(io, conf_thres=0.008, iou_thres=0.5,
                      multi_label=False)[0]
        lines = []
        if det is not None and len(det):
            boxes = ref_scale(tv.shape[2:], det[:, :4],
                              (h0, w0), (ratio, pad)).numpy()
            for b in boxes[:4]:
                cx, cy = (b[0] + b[2]) / 2 / w0, (b[1] + b[3]) / 2 / h0
                bw, bh = (b[2] - b[0]) / w0, (b[3] - b[1]) / h0
                if bw > 0.01 and bh > 0.01:
                    lines.append(f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        (lab_dir / f"{stem}.txt").write_text("\n".join(lines) + "\n")
        logical.append(str(img_dir / f"{stem}.jpg"))

    split = root / "mini.txt"
    split.write_text("\n".join(logical) + "\n")
    return str(split), tm


def _reference_eval(split, tm):
    """The reference evaluate.py:31-123 pipeline, in-process, minus the
    pycocotools COCO block (unavailable in this env)."""
    from build_utils.kaist_dataset import LoadKaistImagesAndLabels
    from build_utils.utils import non_max_suppression as ref_nms
    from build_utils.utils import scale_coords as ref_scale
    from other_utils.metrics import compute_ap_lamr as ref_ap_lamr
    import torch.utils.data as tdata

    ds = LoadKaistImagesAndLabels(split, img_size=IMG_SIZE, batch_size=4,
                                  rect=True)
    loader = tdata.DataLoader(ds, batch_size=4, num_workers=0,
                              collate_fn=ds.collate_fn)
    preds = []
    with torch.no_grad():
        for v_imgs, l_imgs, targets, paths, shapes, img_index in loader:
            v = v_imgs.float() / 255.0
            l = l_imgs.float() / 255.0
            pred = tm(v, l)[0]
            pred = ref_nms(pred, conf_thres=0.01, iou_thres=0.6,
                           multi_label=False)
            for index, p in enumerate(pred):
                if p is None:
                    continue
                boxes = ref_scale(v[index].shape[1:], p[:, :4],
                                  shapes[index][0], shapes[index][1])
                for i in range(p.shape[0]):
                    preds.append({"img_id": img_index[index],
                                  "conf": p[i, 4].item(),
                                  "bbox": boxes[i].numpy()})
    preds.sort(key=lambda x: -float(x["conf"]))
    labels = [lb.copy() for lb in ds.labels]
    out = ref_ap_lamr(preds, labels, ds.shapes)
    return out, len(preds)


def test_full_eval_stack_matches_reference(setup):
    split, tm = setup
    ref, n_ref = _reference_eval(split, tm)

    ir = compile_cfg(CFG)
    variables = from_torch_state_dict(ir, tm.state_dict())
    ds = KaistDataset(split, img_size=IMG_SIZE, batch_size=4, rect=True)
    res = evaluate_dataset(ir, variables, ds, batch_size=4,
                           conf_thres=0.01, iou_thres=0.6,
                           multi_label=False, compute_dtype=jnp.float32)
    n_ours = sum(len(b) for b, _ in res["predictions"].values())

    print(f"\n[full-eval parity] ref: ap={ref['ap']:.4f} "
          f"lamr={ref['lamr']:.4f} n_preds={n_ref} | "
          f"ours: ap={res['ap']:.4f} lamr={res['lamr']:.4f} "
          f"n_preds={n_ours}")
    # both stacks found a comparable detection population...
    assert n_ref > 10, "reference found nothing; test degenerate"
    assert abs(n_ours - n_ref) <= max(4, 0.1 * n_ref), (n_ours, n_ref)
    # ...and the headline metrics agree end to end. GT is the reference's
    # own confident detections, so ref AP is high and any systematic
    # pipeline divergence (letterbox, NMS, scale_coords, matching, AP/LAMR
    # math) would show up here.
    assert ref["ap"] > 0.5, ref["ap"]
    assert res["ap"] == pytest.approx(ref["ap"], abs=0.02), \
        (res["ap"], ref["ap"])
    assert res["lamr"] == pytest.approx(ref["lamr"], abs=0.03), \
        (res["lamr"], ref["lamr"])


# --------------------------------------------------------------------------
# North-star certification (round 4): 36 pairs, NATIVE 512x640, TRAINED
# weights, dAP <= 0.002 — the bound BASELINE.md promises.
#
# Random-init models are degenerate for cross-framework AP comparison (BN
# eval-stats wash the image signal out; whole grid columns emit BIT-EQUAL
# confidences whose NMS tie-order no two frameworks break identically —
# measured round 4: matched dets agree to <=4e-8 while tie swaps move AP by
# ~0.08). tools/full_parity_certify.py therefore self-trains the torch
# reference briefly on deterministic synthesized GT and freezes the result
# as fixtures/fullparity/ (fp16 weights + GT); with trained weights the two
# stacks matched EXACTLY (300-step run: 168/168 detections, min matched IoU
# 1.0000, dAP = 0.00000). This test replays both FULL eval pipelines on
# those fixtures and enforces the bound plus the per-detection match.

FULLPARITY = os.path.join(os.path.dirname(__file__), "fixtures",
                          "fullparity")
MNV3_CFG = ("/root/reference/config/"
            "kaist_dyolov4_mobilenetv3_fshare_global_cse3.cfg")


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    YOLO = load_reference_yolo()
    _patch_torchvision_nms()
    torch.manual_seed(0)
    tm = YOLO(MNV3_CFG, img_size=(512, 640), verbose=False)
    # fp16 tensors as compressed npz — no pickle execution on load, and
    # ~10% smaller than the .pt it replaced (ADVICE r4)
    sd = np.load(os.path.join(FULLPARITY, "mnv3_selftrained.fp16.npz"))
    tm.load_state_dict({k: torch.from_numpy(sd[k]).float()
                        for k in sd.files})
    tm.eval()

    gt = np.load(os.path.join(FULLPARITY, "gt.npz"))
    stems = sorted(gt.files)
    root = tmp_path_factory.mktemp("fullparity_native")
    img_dir = root / "images" / "set00"
    lab_dir = root / "labels" / "set00"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    logical = []
    for st in stems:
        os.link(f"{IMG_DIR}/{st}_visible.jpg",
                str(img_dir / f"{st}_visible.jpg"))
        os.link(f"{IMG_DIR}/{st}_lwir.jpg", str(img_dir / f"{st}_lwir.jpg"))
        with open(lab_dir / f"{st}.txt", "w") as f:
            for r in gt[st]:
                f.write("0 " + " ".join(f"{x:.6f}" for x in r[1:]) + "\n")
        logical.append(str(img_dir / f"{st}.jpg"))
    split = root / "mini.txt"
    split.write_text("\n".join(logical) + "\n")
    return str(split), tm, stems, [gt[st] for st in stems]


def test_north_star_ap_parity_native(trained_setup):
    split, tm, stems, labels = trained_setup
    from build_utils.utils import non_max_suppression as ref_nms
    from other_utils.metrics import compute_ap_lamr as ref_ap_lamr

    vs, ls = [], []
    for st in stems:
        v0 = cv2.imread(f"{IMG_DIR}/{st}_visible.jpg")
        l0 = cv2.imread(f"{IMG_DIR}/{st}_lwir.jpg")
        assert v0.shape == (512, 640, 3)       # native: letterbox identity
        vs.append(v0[:, :, ::-1].transpose(2, 0, 1).copy())
        ls.append(l0[:, :, ::-1].transpose(2, 0, 1).copy())
    vs = torch.from_numpy(np.stack(vs)).float() / 255
    ls = torch.from_numpy(np.stack(ls)).float() / 255

    ref_dets = {}
    with torch.no_grad():
        for i0 in range(0, len(stems), 4):
            io, _ = tm(vs[i0:i0 + 4], ls[i0:i0 + 4])
            for k in range(io.shape[0]):
                d = ref_nms(io[k:k + 1], conf_thres=0.10, iou_thres=0.6,
                            multi_label=False)[0]
                d = (np.zeros((0, 5), np.float32) if d is None
                     else d.numpy()[:, :5])
                d[:, [0, 2]] = d[:, [0, 2]].clip(0, 640)   # utils.py:83-93
                d[:, [1, 3]] = d[:, [1, 3]].clip(0, 512)
                ref_dets[i0 + k] = d
    n_ref = sum(len(d) for d in ref_dets.values())
    shapes = np.asarray([[640, 512]] * len(stems), np.float64)
    preds = [{"img_id": i, "conf": float(b[4]), "bbox": b[:4]}
             for i in range(len(stems)) for b in ref_dets[i]]
    preds.sort(key=lambda p: -p["conf"])
    ref_m = ref_ap_lamr(preds, [x.copy() for x in labels], shapes)

    ir = compile_cfg(MNV3_CFG)
    variables = from_torch_state_dict(ir, tm.state_dict())
    ds = KaistDataset(split, img_size=640, batch_size=4, rect=True)
    res = evaluate_dataset(ir, variables, ds, batch_size=4, conf_thres=0.10,
                           iou_thres=0.6, multi_label=False,
                           compute_dtype=jnp.float32)

    print(f"\n[north-star] ref: n={n_ref} ap={ref_m['ap']:.5f} "
          f"lamr={ref_m['lamr']:.5f} | ours: ap={res['ap']:.5f} "
          f"lamr={res['lamr']:.5f}")
    assert n_ref >= 100, "fixture degenerate — re-run full_parity_certify"

    # THE bound (BASELINE.md: AP@0.5 within 0.2 pt)
    assert res["ap"] == pytest.approx(ref_m["ap"], abs=0.002), \
        (res["ap"], ref_m["ap"])
    assert res["lamr"] == pytest.approx(ref_m["lamr"], abs=0.002), \
        (res["lamr"], ref_m["lamr"])

    # per-detection set match: every reference detection appears in ours
    # with the same box and confidence (greedy by conf, IoU > 0.99,
    # |dconf| < 1e-3 — fp32 accumulation-order differences only)
    matched = 0
    for i in range(len(stems)):
        rb = ref_dets[i]
        ob, osc = res["predictions"].get(i, (np.zeros((0, 4)), np.zeros(0)))
        if not len(rb):
            continue
        assert len(ob), f"image {i}: ours empty, ref has {len(rb)}"
        ra = (rb[:, 2] - rb[:, 0]) * (rb[:, 3] - rb[:, 1])
        oa = (ob[:, 2] - ob[:, 0]) * (ob[:, 3] - ob[:, 1])
        lt = np.maximum(rb[:, None, :2], ob[None, :, :2])
        rbr = np.minimum(rb[:, None, 2:4], ob[None, :, 2:4])
        inter = np.clip(rbr - lt, 0, None).prod(-1)
        iou = inter / (ra[:, None] + oa[None, :] - inter + 1e-12)
        used = np.zeros(len(ob), bool)
        for ri in np.argsort(-rb[:, 4]):
            j = int(np.argmax(iou[ri] - used * 10))
            if iou[ri, j] > 0.99 and not used[j] \
                    and abs(rb[ri, 4] - osc[j]) < 1e-3:
                used[j] = True
                matched += 1
    assert matched >= 0.99 * n_ref, (matched, n_ref)
