"""The north-star pairing (docs/NORTH_STAR.md) must hold as committed:
the chip-measured bench record shows >= 2000 fps for EXACTLY the model
whose full-eval-stack dAP <= 0.002 is certified by
tests/test_full_eval_parity.py — so neither half can silently rot or
drift to a different model. (BASELINE.md north star; VERDICT r4 item 2.)
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "docs", "north_star_bench_r5.jsonl")
CERTIFIED_MODEL = "Double-YOLOv4-MNv3-Fshare-Global-CSE3"
FPS_BAR = 2000.0


def test_north_star_pairing():
    rows = {}
    with open(BENCH) as f:
        for line in f:
            r = json.loads(line)
            rows[r["model"]] = r

    r = rows[CERTIFIED_MODEL]
    assert r["bf16_fps"] >= FPS_BAR, r
    assert tuple(r["hw"]) == (512, 640) and r["batch"] >= 1

    # the accuracy half: the certification fixture must exist and the
    # certifying test must pin the same cfg and the promised bound
    fix = os.path.join(REPO, "tests", "fixtures", "fullparity")
    assert os.path.exists(os.path.join(fix, "mnv3_selftrained.fp16.npz"))
    assert os.path.exists(os.path.join(fix, "gt.npz"))
    src = open(os.path.join(REPO, "tests",
                            "test_full_eval_parity.py")).read()
    assert "kaist_dyolov4_mobilenetv3_fshare_global_cse3.cfg" in src
    assert "dap <= 0.002" in src or "0.002" in src


def test_north_star_doc_consistent():
    doc = open(os.path.join(REPO, "docs", "NORTH_STAR.md")).read()
    assert CERTIFIED_MODEL in doc
    with open(BENCH) as f:
        fps = {json.loads(l)["model"]: json.loads(l)["bf16_fps"]
               for l in f}
    # the headline number quoted in the doc is the measured one
    assert f"{fps[CERTIFIED_MODEL]:.1f}" in doc
