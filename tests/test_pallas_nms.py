"""Pallas NMS kernel vs the XLA nms_indices (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from double_yolo_kaist_tpu.ops.nms import nms_indices
from double_yolo_kaist_tpu.ops.pallas_nms import pallas_nms_indices


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    xy = rng.random((n, 2), dtype=np.float32) * 200
    wh = rng.random((n, 2), dtype=np.float32) * 60 + 2
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.random(n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_xla(seed):
    boxes, scores = _rand(128, seed)
    i_ref, v_ref = nms_indices(jnp.asarray(boxes), jnp.asarray(scores),
                               0.5, 32)
    i_pl, v_pl = pallas_nms_indices(jnp.asarray(boxes), jnp.asarray(scores),
                                    iou_thres=0.5, max_det=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_pl))
    np.testing.assert_array_equal(np.asarray(i_ref)[np.asarray(v_ref)],
                                  np.asarray(i_pl)[np.asarray(v_pl)])


def test_pallas_handles_fewer_than_maxdet():
    boxes, scores = _rand(128, 3)
    # mask most candidates out
    scores[10:] = -1e10
    i_pl, v_pl = pallas_nms_indices(jnp.asarray(boxes), jnp.asarray(scores),
                                    iou_thres=0.5, max_det=64, interpret=True)
    v = np.asarray(v_pl)
    assert v.sum() <= 10
    assert not v[v.argmin():].any() or v.all()  # valid prefix then padding
