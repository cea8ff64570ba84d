"""Pallas NMS kernel vs the XLA nms_indices (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
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


def test_pallas_vmapped_matches_xla():
    """The production path vmaps nms_indices over the batch; the Pallas
    kernel must batch identically (jax adds a leading grid dim)."""
    bs = 3
    all_boxes, all_scores = [], []
    for s in range(bs):
        b, sc = _rand(128, 10 + s)
        all_boxes.append(b)
        all_scores.append(sc)
    bb = jnp.asarray(np.stack(all_boxes))
    ss = jnp.asarray(np.stack(all_scores))
    i_ref, v_ref = jax.vmap(lambda b, s: nms_indices(b, s, 0.5, 32))(bb, ss)
    i_pl, v_pl = jax.vmap(lambda b, s: pallas_nms_indices(
        b, s, iou_thres=0.5, max_det=32, interpret=True))(bb, ss)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_pl))
    for k in range(bs):
        vr = np.asarray(v_ref[k])
        np.testing.assert_array_equal(np.asarray(i_ref[k])[vr],
                                      np.asarray(i_pl[k])[vr])
