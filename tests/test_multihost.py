"""Multi-host hygiene: process-0 write gating + opt-in distributed init
(VERDICT r1 item #9; reference distributed_utils.py:255-322)."""

import os

import numpy as np

import jax

from double_yolo_kaist_tpu.parallel import multihost as MH
from double_yolo_kaist_tpu.utils import checkpoint as CK
from double_yolo_kaist_tpu.utils import logging as LG


def test_single_process_defaults():
    assert MH.is_main_process()
    assert MH.process_index() == 0
    # no env trigger -> no-op, returns False
    assert MH.maybe_initialize_distributed() is False
    # allgather is identity at process_count 1
    tree = {"a": np.arange(4)}
    out = MH.allgather_predictions(tree)
    np.testing.assert_array_equal(out["a"], tree["a"])


def test_save_checkpoint_gated(tmp_path, monkeypatch):
    monkeypatch.setattr(MH, "is_main_process", lambda: False)
    p = str(tmp_path / "ck")
    CK.save_checkpoint(p, params={"w": np.zeros(2)}, bn_state={})
    assert not os.path.exists(p)
    monkeypatch.setattr(MH, "is_main_process", lambda: True)
    CK.save_checkpoint(p, params={"w": np.zeros(2)}, bn_state={})
    assert os.path.exists(os.path.join(p, "arrays.npz"))


def test_results_writer_gated(tmp_path, monkeypatch):
    monkeypatch.setattr(MH, "is_main_process", lambda: False)
    w = LG.ResultsWriter(str(tmp_path / "r.txt"))
    w.append(0, np.zeros(12), 1.0, 1e-3)
    w.write_text("x")
    assert not os.path.exists(w.path)
    monkeypatch.setattr(MH, "is_main_process", lambda: True)
    w.append(0, np.zeros(12), 1.0, 1e-3)
    assert os.path.exists(w.path)


def test_tb_writer_gated(tmp_path, monkeypatch):
    monkeypatch.setattr(MH, "is_main_process", lambda: False)
    tb = LG.make_tb_writer(str(tmp_path / "tb"))
    tb.add_scalar("x", 1.0, 0)   # must be a no-op stub
    tb.close()
    assert not os.path.exists(str(tmp_path / "tb"))
