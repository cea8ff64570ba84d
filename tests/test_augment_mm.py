"""Matmul-resample augmentation (augment.py "resample as matmuls") vs the
gather/lerp forms it replaces: same taps, same clips, same zero borders —
pixels agree to accumulation rounding (f32 matmul accumulate vs chained
elementwise lerp), labels and masks bit-identical. The matmul forms exist
because TPU gathers run ~25x below HBM bandwidth (tools/fused_train_probe.py
--stages); they are the DEFAULT train-augment path (DYK_AUG_RESAMPLE)."""

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.data import augment as A
from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn
from double_yolo_kaist_tpu.train.loss import pad_labels

HYP = {"hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36,
       "degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0}
H0, W0 = 128, 160


def _imgs(n, h=H0, w=W0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)


def test_resize_mm_matches_gather():
    x = jnp.asarray(_imgs(4))
    a = np.asarray(A.resize_bilinear(x, 103, 128))
    b = np.asarray(A.resize_bilinear_mm(x, 103, 128))
    np.testing.assert_allclose(b, a, atol=1e-3)
    # upscale + identity-size paths too
    a = np.asarray(A.resize_bilinear(x, 160, 200))
    b = np.asarray(A.resize_bilinear_mm(x, 160, 200))
    np.testing.assert_allclose(b, a, atol=1e-3)


def test_mosaic_mm_matches_gather():
    rng = np.random.default_rng(3)
    s = 64
    v4 = jnp.asarray(rng.integers(0, 256, (2, 4, 51, 64, 3), np.uint8)
                     .astype(np.float32))
    l4 = jnp.asarray(rng.integers(0, 256, (2, 4, 51, 64, 3), np.uint8)
                     .astype(np.float32))
    lab4 = jnp.asarray(rng.uniform(0, s, (2, 4, 5, 5)).astype(np.float32))
    lm4 = jnp.asarray(rng.integers(0, 2, (2, 4, 5)).astype(bool))
    centers = jnp.asarray(
        rng.integers(int(s * 0.5), int(s * 1.5) + 1, (2, 2)), jnp.int32)
    va, la, laba, ma = A.mosaic_place(v4, l4, lab4, lm4, centers, s)
    vb, lb, labb, mb = A.mosaic_place_mm(v4, l4, lab4, lm4, centers, s)
    # pastes are exact shifts of exact values: indicator-matrix products
    # must be EXACT (one nonzero per row, f32 accumulate)
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(va))
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(la))
    np.testing.assert_array_equal(np.asarray(labb), np.asarray(laba))
    np.testing.assert_array_equal(np.asarray(mb), np.asarray(ma))


def test_affine_mm_matches_gather():
    rng = np.random.default_rng(5)
    B, s = 2, 64
    v = jnp.asarray(rng.integers(0, 256, (B, 2 * s, 2 * s, 3), np.uint8)
                    .astype(np.float32))
    l = jnp.asarray(rng.integers(0, 256, (B, 2 * s, 2 * s, 3), np.uint8)
                    .astype(np.float32))
    lab = jnp.asarray(rng.uniform(0, 2 * s, (B, 8, 5)).astype(np.float32))
    lm = jnp.ones((B, 8), bool)
    Ms = A._affine_matrices(jax.random.PRNGKey(2), B, (2 * s, 2 * s),
                            0.0, 0.1, 0.5, 0.0, -s // 2)
    va, la, laba, ma = A.random_affine_batch(
        None, v, l, lab, lm, border=-s // 2, Ms=Ms, separable=True)
    vb, lb, labb, mb = A.random_affine_batch(
        None, v, l, lab, lm, border=-s // 2, Ms=Ms, separable=True,
        resample="matmul")
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(labb), np.asarray(laba))
    np.testing.assert_array_equal(np.asarray(mb), np.asarray(ma))


def test_full_augment_mm_matches_gather():
    """End-to-end make_train_augment_fn: matmul vs gather resample — pixels
    within ~1 u8 LSB on the [0,1] output, label tensors bit-identical;
    covers snowflake+clahe composition and the bf16 pixel path."""
    B = 2
    v = jnp.asarray(_imgs(4 * B, seed=7))
    l = jnp.asarray(_imgs(4 * B, seed=8))
    t, m = pad_labels(
        [np.asarray([[0, 0.5, 0.5, 0.3, 0.4]], np.float32)] * (4 * B), 8)
    key = jax.random.PRNGKey(4)
    args = (key, v, l, jnp.asarray(t), jnp.asarray(m))
    for snow, clahe, pd in ((False, False, jnp.float32),
                            (True, True, jnp.float32),
                            (False, False, jnp.bfloat16)):
        ga = make_train_augment_fn((H0, W0), 64, HYP, snowflake=snow,
                                   clahe=clahe, pix_dtype=pd,
                                   resample="gather")(*args)
        mm = make_train_augment_fn((H0, W0), 64, HYP, snowflake=snow,
                                   clahe=clahe, pix_dtype=pd,
                                   resample="matmul")(*args)
        np.testing.assert_array_equal(np.asarray(mm["targets"]),
                                      np.asarray(ga["targets"]),
                                      err_msg=f"snow={snow} clahe={clahe}")
        np.testing.assert_array_equal(np.asarray(mm["tmask"]),
                                      np.asarray(ga["tmask"]))
        for k in ("v", "l"):
            a = np.asarray(ga[k], np.float32)
            b = np.asarray(mm[k], np.float32)
            # clahe rounds pixels to u8 mid-chain: accumulation-rounding
            # differences at exact .5 boundaries flip a u8 LSB, and the
            # CLAHE LUT amplifies isolated flips a few LSBs further —
            # bound the tail separately from the bulk there
            # bf16: the gather path rounds to bf16 at EVERY lerp while the
            # matmul path accumulates in f32 — compounds like the existing
            # bf16-vs-f32 bound (test_augment_bf16_pixel_path, atol 8/255)
            bf16 = pd == jnp.bfloat16
            atol = 10 / 255 if clahe else (8 / 255 if bf16 else 2.5 / 255)
            np.testing.assert_allclose(b, a, atol=atol,
                                       err_msg=f"{k} snow={snow} "
                                               f"clahe={clahe} {pd}")
            q = 3.0 / 255 if (clahe or bf16) else 1.5 / 255
            assert np.quantile(np.abs(b - a), 0.999) <= q
            assert np.abs(b - a).mean() < (0.5 if bf16 else 0.2) / 255
