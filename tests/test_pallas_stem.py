"""Experimental Pallas stem conv (ops/pallas_stem.py): interpret-mode parity
vs lax.conv for both in-kernel formulations and both fused activations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.ops import pallas_stem as PS
from double_yolo_kaist_tpu.ops.pallas_stem import stem_conv_s2


def _ref(x, w, b, act):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    if act == "mish":
        y = y * jnp.tanh(jax.nn.softplus(y))
    else:
        y = jnp.where(y > 0, y, 0.1 * y)
    return np.asarray(y, np.float32)


@pytest.mark.parametrize("variant", ["acc", "scratch"])
@pytest.mark.parametrize("act", ["mish", "leaky"])
def test_stem_conv_interpret_parity(variant, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 96, 32), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 64)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.bfloat16)
    ref = _ref(x, w, b, act)
    got = np.asarray(stem_conv_s2(x, w, b, act=act, variant=variant,
                                  interpret=True), np.float32)
    assert np.abs(ref - got).max() < 2e-2 * max(1.0, np.abs(ref).max())


def test_stem_conv_odd_tile_rows():
    """TR that doesn't divide typical powers still covers H/2 exactly."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 48, 64, 16), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.05, jnp.bfloat16)
    b = jnp.zeros((32,), jnp.bfloat16)
    ref = _ref(x, w, b, "leaky")
    got = np.asarray(stem_conv_s2(x, w, b, act="leaky", TR=4, variant="acc",
                                  interpret=True), np.float32)
    assert np.abs(ref - got).max() < 2e-2 * max(1.0, np.abs(ref).max())


def test_stem_conv_s2_packed_interpret():
    """v2 packed-lane kernel: exact vs lax.conv (+bias+mish), fp32."""
    rng = np.random.default_rng(5)
    B, H, W, C, O = 2, 64, 128, 32, 64
    x = jnp.asarray(rng.random((B, H, W, C), np.float32))
    w = jnp.asarray(rng.random((3, 3, C, O), np.float32) * 0.05)
    b = jnp.asarray(rng.random((O,), np.float32))
    y = np.asarray(PS.stem_conv_s2_packed(x, w, b, act="mish",
                                          interpret=True))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    ref = np.asarray(ref * jnp.tanh(jax.nn.softplus(ref)))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)
