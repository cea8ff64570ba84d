"""Pallas fused decode == reference decode_head (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from double_yolo_kaist_tpu.models.graph import decode_head
from double_yolo_kaist_tpu.ops.pallas_decode import decode_head_pallas

ANCHORS = np.asarray([[10., 13.], [33., 23.], [62., 45.]], np.float32)


@pytest.mark.parametrize("bf_type,stride", [("yolov3", 32), ("yolov4", 8)])
def test_pallas_decode_matches(bf_type, stride):
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.standard_normal((2, 3, 8, 16, 6)).astype(np.float32))
    ref = np.asarray(decode_head(raw, ANCHORS, stride, bf_type))
    mine = np.asarray(decode_head_pallas(raw, ANCHORS, stride, bf_type,
                                         interpret=True))
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-5)


def test_pallas_decode_block_remainder():
    """Row count not divisible by the block size (masked tail)."""
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.standard_normal((5, 3, 6, 10, 6)).astype(np.float32))
    ref = np.asarray(decode_head(raw, ANCHORS, 16, "yolov3"))
    mine = np.asarray(decode_head_pallas(raw, ANCHORS, 16, "yolov3",
                                         interpret=True))
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-5)
