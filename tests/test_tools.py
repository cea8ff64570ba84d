"""Offline tooling: plotting and dataset converters."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_plot_pr_fm(tmp_path):
    d = {"recall": np.linspace(0, 0.9, 50),
         "precision": np.linspace(1, 0.5, 50),
         "fppi": np.logspace(-3, 1, 50),
         "mr": np.linspace(1, 0.2, 50),
         "ap": 0.85, "lamr": 0.25}
    npy = tmp_path / "model_a.npy"
    np.save(npy, d)
    import plot_curves
    plot_curves.draw_pr(str(tmp_path / "pr.png"), [str(npy)])
    plot_curves.draw_fppi_mr(str(tmp_path / "fm.png"), [str(npy)])
    assert (tmp_path / "pr.png").exists()
    assert (tmp_path / "fm.png").exists()


def test_plot_training_curves(tmp_path):
    res = tmp_path / "results.txt"
    lines = []
    for e in range(5):
        stats = "  ".join(f"{v:.4f}" for v in np.linspace(0.1 + e / 10, 0.9, 12))
        lines.append(f"epoch:{e} {stats}  {3.0 - e * 0.3:.4f}  0.001000")
    res.write_text("\n".join(lines))
    import plot_curves
    d = plot_curves.parse_results_txt(str(res))
    assert len(d["epoch"]) == 5
    assert d["loss"][0] > d["loss"][-1]
    plot_curves.draw_training(str(tmp_path / "train.png"), [str(res)])
    assert (tmp_path / "train.png").exists()


def test_voc_yolo_roundtrip(tmp_path):
    import kaist_convert as KC
    boxes = [{"label": "person", "bbox": [100, 50, 40, 120]}]
    xml = KC.voc_xml("set00", "a.jpg", (640, 512), boxes)
    xml_path = tmp_path / "a.xml"
    xml_path.write_text(xml)
    wh, parsed = KC.parse_voc_xml(str(xml_path))
    assert wh == (640, 512)
    assert parsed[0][0] == "person"
    lines = KC.voc_to_yolo_lines(wh, parsed, {"person": 0})
    cls, cx, cy, w, h = (float(x) for x in lines[0].split())
    assert cls == 0
    np.testing.assert_allclose([cx * 640, cy * 512, w * 640, h * 512],
                               [120, 110, 40, 120], atol=1.0)


def test_clean_boxes():
    import kaist_convert as KC
    raw = [{"label": "person", "bbox": [1, 2, 10, 20], "occluded": 0},
           {"label": "people", "bbox": [1, 2, 10, 20], "occluded": 0},
           {"label": "cyclist", "bbox": [5, 5, 8, 16], "occluded": 0},
           {"label": "person?", "bbox": [0, 0, 5, 5], "occluded": 0},
           {"label": "person", "bbox": [0, 0, 5, -1], "occluded": 0}]
    out = KC.clean_boxes(raw)
    assert len(out) == 2
    assert all(b["label"] == "person" for b in out)


def test_split_generation(tmp_path):
    import kaist_convert as KC
    stems = ([f"set00_V000_I{i:05d}" for i in range(10)]
             + [f"set04_V000_I{i:05d}" for i in range(10)]
             + [f"set06_V000_I{i:05d}" for i in range(6)]
             + [f"set10_V000_I{i:05d}" for i in range(4)])
    splits = KC.make_splits(stems, str(tmp_path), val_ratio=0.2, seed=0)
    assert len(splits["train"]) + len(splits["val"]) == 20
    assert len(splits["test"]) == 10
    assert len(splits["day_test"]) == 6
    assert len(splits["night_test"]) == 4
    KC.write_data_registry(str(tmp_path / "k.data"), str(tmp_path),
                           "names.txt")
    assert (tmp_path / "k.data").read_text().startswith("classes=1")


def test_plot_activations(tmp_path):
    """Activation-panel plot (reference docs/draw_activation.py analogue)
    renders through the framework's own op library."""
    import plot_curves
    out = tmp_path / "act.png"
    plot_curves.draw_activations(str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_real_train_demo_staging(tmp_path):
    """real_train_demo stages the bundled pairs into a loadable dataset."""
    import pytest
    if not os.path.isdir("/root/reference/imgs/ori"):
        pytest.skip("bundled reference pairs not available")
    import real_train_demo as rtd
    data, n = rtd.stage_dataset(str(tmp_path), seed=0)
    assert n >= 8
    from double_yolo_kaist_tpu.config.parser import parse_data_cfg
    from double_yolo_kaist_tpu.data.dataset import KaistDataset
    dcfg = parse_data_cfg(data)
    ds = KaistDataset(dcfg["train"], img_size=64, batch_size=4, augment=False)
    v, l = ds.load_pair(0)
    assert v.shape == l.shape and v.ndim == 3
    lab = ds.labels[0]
    assert lab.shape[1] == 5 and len(lab) >= 1
    # labels are normalized xywh in (0, 1]
    assert (lab[:, 1:] > 0).all() and (lab[:, 1:] <= 1).all()
