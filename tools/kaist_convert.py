"""KAIST dataset conversion tooling: .vbb -> VOC XML -> YOLO txt + splits.

Covers the reference's offline converters (Kaist/trans_kaist2voc.py:115-299,
trans_kaistvoc2yolo.py:43-167, dataset_calculate.py) with the same cleaning
rules: drop ``people`` boxes, map ``cyclist`` -> ``person``, sample every
K-th frame, keep only frames with >= min_boxes annotations, per-set
day/night-aware train/val/test splits, and the ``classes cx cy w h``
normalized YOLO txt format with ``*_visible.jpg``/``*_lwir.jpg`` image pairs.

Usage:
  python tools/kaist_convert.py vbb2voc  --vbb-root ... --out Kaist_VOC
  python tools/kaist_convert.py voc2yolo --voc-root Kaist_VOC --out Kaist_YOLO
  python tools/kaist_convert.py splits   --yolo-root Kaist_YOLO --out data/
"""

from __future__ import annotations

import argparse
import os
import random
from xml.etree import ElementTree as ET
from xml.dom import minidom

import numpy as np

PERSON_CLASSES = {"person": "person", "cyclist": "person"}
DROP_CLASSES = {"people", "person?"}

# KAIST set splits: set00-05 train (00-02 day, 03-05 night),
# set06-11 test (06-08 day, 09-11 night)
DAY_SETS = {"set00", "set01", "set02", "set06", "set07", "set08"}
TRAIN_SETS = {"set00", "set01", "set02", "set03", "set04", "set05"}


def load_vbb(path: str) -> dict:
    """Parse a Caltech/KAIST .vbb annotation file (Matlab struct)."""
    from scipy.io import loadmat

    vbb = loadmat(path)
    obj_lists = vbb["A"][0][0][1][0]           # objLists per frame
    obj_lbl = [str(x[0]) for x in vbb["A"][0][0][4][0]]  # label names
    frames = []
    for frame in obj_lists:
        boxes = []
        if frame.size:
            for obj in frame[0]:
                lbl_idx = int(obj[0][0][0]) - 1
                pos = obj[1][0]                # [x, y, w, h]
                occluded = int(obj[3][0][0]) if obj[3].size else 0
                boxes.append({"label": obj_lbl[lbl_idx],
                              "bbox": [float(v) for v in pos],
                              "occluded": occluded})
        frames.append(boxes)
    return {"frames": frames, "labels": obj_lbl}


def clean_boxes(boxes: list, min_h: float = 0.0) -> list:
    out = []
    for b in boxes:
        lbl = b["label"].lower()
        if lbl in DROP_CLASSES:
            continue
        if lbl not in PERSON_CLASSES:
            continue
        x, y, w, h = b["bbox"]
        if h < min_h or w <= 0 or h <= 0:
            continue
        out.append({"label": PERSON_CLASSES[lbl], "bbox": [x, y, w, h]})
    return out


def voc_xml(folder: str, filename: str, wh, boxes: list) -> str:
    root = ET.Element("annotation")
    ET.SubElement(root, "folder").text = folder
    ET.SubElement(root, "filename").text = filename
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "width").text = str(wh[0])
    ET.SubElement(size, "height").text = str(wh[1])
    ET.SubElement(size, "depth").text = "3"
    for b in boxes:
        x, y, w, h = b["bbox"]
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = b["label"]
        bb = ET.SubElement(obj, "bndbox")
        ET.SubElement(bb, "xmin").text = str(int(round(x)))
        ET.SubElement(bb, "ymin").text = str(int(round(y)))
        ET.SubElement(bb, "xmax").text = str(int(round(x + w)))
        ET.SubElement(bb, "ymax").text = str(int(round(y + h)))
    return minidom.parseString(ET.tostring(root)).toprettyxml(indent="  ")


def parse_voc_xml(path: str):
    """VOC XML -> ((w, h), [(name, xmin, ymin, xmax, ymax)])."""
    root = ET.parse(path).getroot()
    size = root.find("size")
    wh = (int(size.find("width").text), int(size.find("height").text))
    boxes = []
    for obj in root.findall("object"):
        bb = obj.find("bndbox")
        boxes.append((obj.find("name").text,
                      float(bb.find("xmin").text), float(bb.find("ymin").text),
                      float(bb.find("xmax").text), float(bb.find("ymax").text)))
    return wh, boxes


def voc_to_yolo_lines(wh, boxes, class_map: dict) -> list:
    w, h = wh
    lines = []
    for name, x1, y1, x2, y2 in boxes:
        if name not in class_map:
            continue
        cx, cy = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
        bw, bh = (x2 - x1) / w, (y2 - y1) / h
        lines.append(f"{class_map[name]} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
    return lines


def vbb2voc(vbb_root: str, out_dir: str, sample_every: int = 3,
            min_boxes: int = 1):
    os.makedirs(os.path.join(out_dir, "Annotations"), exist_ok=True)
    kept = []
    for set_name in sorted(os.listdir(vbb_root)):
        set_dir = os.path.join(vbb_root, set_name)
        if not os.path.isdir(set_dir):
            continue
        for vname in sorted(os.listdir(set_dir)):
            if not vname.endswith(".vbb"):
                continue
            video = os.path.splitext(vname)[0]
            ann = load_vbb(os.path.join(set_dir, vname))
            for fi, boxes in enumerate(ann["frames"]):
                if fi % sample_every:
                    continue
                boxes = clean_boxes(boxes)
                if len(boxes) < min_boxes:
                    continue
                stem = f"{set_name}_{video}_I{fi:05d}"
                xml = voc_xml(set_name, stem + ".jpg", (640, 512), boxes)
                with open(os.path.join(out_dir, "Annotations",
                                       stem + ".xml"), "w") as f:
                    f.write(xml)
                kept.append(stem)
    print(f"vbb2voc: kept {len(kept)} frames")
    return kept


def make_splits(stems: list, out_dir: str, val_ratio: float = 0.2,
                seed: int = 0):
    """train/val from train sets; test + day/night test from test sets."""
    rng = random.Random(seed)
    train_pool = [s for s in stems if s.split("_")[0] in TRAIN_SETS]
    test_pool = [s for s in stems if s.split("_")[0] not in TRAIN_SETS]
    rng.shuffle(train_pool)
    n_val = int(len(train_pool) * val_ratio)
    splits = {
        "train": train_pool[n_val:],
        "val": train_pool[:n_val],
        "test": test_pool,
        "day_test": [s for s in test_pool if s.split("_")[0] in DAY_SETS],
        "night_test": [s for s in test_pool if s.split("_")[0] not in DAY_SETS],
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, items in splits.items():
        with open(os.path.join(out_dir, f"kaist_{name}_data.txt"), "w") as f:
            f.write("\n".join(items) + ("\n" if items else ""))
        print(f"{name}: {len(items)}")
    return splits


def write_data_registry(out_path: str, split_dir: str, names_path: str,
                        classes: int = 1):
    entries = {"classes": classes,
               "train": os.path.join(split_dir, "kaist_train_data.txt"),
               "valid": os.path.join(split_dir, "kaist_val_data.txt"),
               "test": os.path.join(split_dir, "kaist_test_data.txt"),
               "day_test": os.path.join(split_dir, "kaist_day_test_data.txt"),
               "night_test": os.path.join(split_dir,
                                          "kaist_night_test_data.txt"),
               "names": names_path}
    with open(out_path, "w") as f:
        for k, v in entries.items():
            f.write(f"{k}={v}\n")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("vbb2voc")
    p1.add_argument("--vbb-root", required=True)
    p1.add_argument("--out", required=True)
    p1.add_argument("--sample-every", type=int, default=3)
    p1.add_argument("--min-boxes", type=int, default=1)
    p2 = sub.add_parser("voc2yolo")
    p2.add_argument("--voc-root", required=True)
    p2.add_argument("--out", required=True)
    p3 = sub.add_parser("splits")
    p3.add_argument("--stems-file", required=True)
    p3.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.cmd == "vbb2voc":
        stems = vbb2voc(args.vbb_root, args.out, args.sample_every,
                        args.min_boxes)
        with open(os.path.join(args.out, "stems.txt"), "w") as f:
            f.write("\n".join(stems))
    elif args.cmd == "voc2yolo":
        ann_dir = os.path.join(args.voc_root, "Annotations")
        lab_dir = os.path.join(args.out, "labels")
        os.makedirs(lab_dir, exist_ok=True)
        for xml_name in sorted(os.listdir(ann_dir)):
            wh, boxes = parse_voc_xml(os.path.join(ann_dir, xml_name))
            lines = voc_to_yolo_lines(wh, boxes, {"person": 0})
            with open(os.path.join(
                    lab_dir, xml_name.replace(".xml", ".txt")), "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
        print("voc2yolo done")
    elif args.cmd == "splits":
        with open(args.stems_file) as f:
            stems = f.read().splitlines()
        make_splits(stems, args.out)


if __name__ == "__main__":
    main()
