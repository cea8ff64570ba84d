"""evaluate CLI subprocess smoke: args -> dataset -> checkpoint -> metrics."""

import os
import subprocess
import sys

import cv2
import numpy as np

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(REPO, "tests", "fixtures", "tiny_dyolov3.cfg")


def test_evaluate_cli(tmp_path):
    from double_yolo_kaist_tpu.config.ir import compile_cfg
    from double_yolo_kaist_tpu.models import graph
    from double_yolo_kaist_tpu.utils.checkpoint import save_checkpoint

    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    logical = []
    for i in range(4):
        im = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"I{i}_visible.jpg"), im)
        cv2.imwrite(str(img_dir / f"I{i}_lwir.jpg"), im)
        (lab_dir / f"I{i}.txt").write_text("0 0.5 0.5 0.3 0.4\n")
        logical.append(str(img_dir / f"I{i}.jpg"))
    (tmp_path / "t.txt").write_text("\n".join(logical))
    (tmp_path / "m.data").write_text(
        f"classes=1\ntrain={tmp_path}/t.txt\nvalid={tmp_path}/t.txt\n"
        f"test={tmp_path}/t.txt\n")

    # note: the cfg needs strides [8,4]; the CLI derives [32,16,8] from the
    # filename — copy under a yolov3 name is fine for a smoke run
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), params=variables["params"],
                    bn_state=variables["state"], epoch=0)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "evaluate.py"),
         "--cfg", TINY, "--weights", str(ckpt),
         "--data", str(tmp_path / "m.data"), "--test-type", "test",
         "--img-size", "64", "--batch-size", "4", "--fp32",
         "--npy-path", str(tmp_path / "curves.npy")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-3000:]
    assert "VOC Average Precision" in out.stdout
    assert "Log Average Miss Rate" in out.stdout
    assert os.path.exists(tmp_path / "curves.npy")
