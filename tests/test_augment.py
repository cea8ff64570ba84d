"""Device-side augmentation vs the reference's OpenCV host pipeline:
resize/letterbox vs cv2 + reference img_utils, warp vs cv2.warpAffine,
CLAHE vs cv2.createCLAHE, HSV roundtrip, cutout/mosaic structural checks."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.data import augment as A
from double_yolo_kaist_tpu.data.clahe import clahe_batch

from tests.torch_ref import load_reference_yolo

load_reference_yolo()
from build_utils.img_utils import letterbox as ref_letterbox  # noqa: E402


def _img(h=64, w=80, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish image: random low-res upsampled (reduces interp edge cases)
    base = rng.integers(0, 256, (h // 4, w // 4, 3), dtype=np.uint8)
    return cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)


def test_resize_matches_cv2():
    img = _img(64, 80)
    ref = cv2.resize(img, (40, 32), interpolation=cv2.INTER_LINEAR)
    mine = np.asarray(A.resize_bilinear(jnp.asarray(img[None]), 32, 40))[0]
    assert np.abs(mine - ref.astype(np.float32)).max() <= 1.0


def test_letterbox_matches_reference():
    img = _img(512 // 8, 640 // 8)  # 64x80, KAIST aspect
    for scale_up in (True, False):
        ref_img, ref_ratio, ref_pad = ref_letterbox(
            img.copy(), (64, 64), auto=False, scale_up=scale_up)
        mine, r, pad = A.letterbox_batch(jnp.asarray(img[None]), (64, 64),
                                         scale_up=scale_up)
        mine = np.asarray(mine)[0]
        assert mine.shape == ref_img.shape
        assert abs(r - ref_ratio[0]) < 1e-9
        assert abs(pad[0] - ref_pad[0]) < 1e-9 and abs(pad[1] - ref_pad[1]) < 1e-9
        assert np.abs(mine - ref_img.astype(np.float32)).max() <= 1.0


def test_warp_matches_cv2():
    img = _img(64, 64, seed=1).astype(np.float32)
    M = np.asarray(cv2.getRotationMatrix2D((32, 32), 13.0, 1.1))
    M3 = np.eye(3)
    M3[:2] = M
    ref = cv2.warpAffine(img, M, dsize=(64, 64), flags=cv2.INTER_LINEAR,
                         borderValue=(0, 0, 0))
    mine = np.asarray(A._warp_bilinear(jnp.asarray(img),
                                       jnp.asarray(np.linalg.inv(M3)),
                                       64, 64))
    # interior parity; borders differ by <=1 bilinear tap
    diff = np.abs(mine - ref)[2:-2, 2:-2]
    assert np.quantile(diff, 0.999) <= 2.0, diff.max()


def test_warp_separable_matches_general_and_cv2():
    """Axis-aligned affine (degrees=shear=0, any scale/translate): the
    separable fast path must equal the general 2-D gather path bit-for-bit
    (same clipped indices, same lerp order) and cv2 at interior tolerance."""
    img = _img(64, 80, seed=4).astype(np.float32)
    M = np.asarray(cv2.getRotationMatrix2D((40, 32), 0.0, 1.13))
    M[0, 2] += 3.7   # translation
    M[1, 2] -= 2.2
    M3 = np.eye(3)
    M3[:2] = M
    minv = jnp.asarray(np.linalg.inv(M3))
    gen = np.asarray(A._warp_bilinear(jnp.asarray(img), minv, 64, 80))
    sep = np.asarray(A._warp_bilinear(jnp.asarray(img), minv, 64, 80,
                                      separable=True))
    np.testing.assert_allclose(sep, gen, atol=1e-3, rtol=1e-5)
    ref = cv2.warpAffine(img, M, dsize=(80, 64), flags=cv2.INTER_LINEAR,
                         borderValue=(0, 0, 0))
    diff = np.abs(sep - ref)[2:-2, 2:-2]
    assert np.quantile(diff, 0.999) <= 2.0, diff.max()


def test_hsv_to_rgb_matches_sector_table():
    """The branchless sector formula vs the piecewise v/q/p/t table."""
    rng = np.random.default_rng(5)
    hsv = rng.random((257, 3)).astype(np.float32)
    hsv[:64, 0] = np.linspace(0, 1 - 1e-6, 64)   # sweep hue sectors
    h, s, v = hsv[:, 0] * 6.0, hsv[:, 1], hsv[:, 2]
    i = np.floor(h).astype(int) % 6
    f = h - np.floor(h)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    mine = np.asarray(A._hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(mine, np.stack([r, g, b], -1), atol=2e-6)


def test_random_affine_labels_and_mask():
    key = jax.random.PRNGKey(0)
    v = jnp.asarray(np.stack([_img(96, 96, s) for s in range(2)]), jnp.float32)
    labels = jnp.asarray(np.tile(np.asarray(
        [[0, 20, 20, 60, 70], [0, 2, 2, 5, 5]], np.float32), (2, 1, 1)))
    lmask = jnp.ones((2, 2), bool)
    vo, lo, lab, m = A.random_affine_batch(
        key, v, v, labels, lmask, degrees=5, translate=0.05, scale=0.1,
        shear=2, border=-16)
    assert vo.shape == (2, 64, 64, 3)
    m = np.asarray(m)
    lab = np.asarray(lab)
    assert m[:, 0].all()          # big box survives
    assert not m[:, 1].any()      # 3px box fails the w>4 filter
    assert (lab[..., 1:][np.asarray(m)] >= 0).all()
    assert (lab[..., [1, 3]] <= 64 + 1e-3).all()


def test_affine_presampled_ms_requires_explicit_separable():
    """Pre-sampled Ms + defaulted separable must raise: the degrees/shear
    defaults (0.0) say nothing about externally sampled matrices, and
    silently taking the separable warp would rotate labels but not pixels."""
    import pytest

    key = jax.random.PRNGKey(0)
    v = jnp.zeros((2, 32, 32, 3), jnp.float32)
    labels = jnp.zeros((2, 1, 5), jnp.float32)
    lmask = jnp.ones((2, 1), bool)
    Ms = A._affine_matrices(key, 2, (32, 32), 5.0, 0.05, 0.1, 2.0, 0)
    with pytest.raises(ValueError, match="separable"):
        A.random_affine_batch(None, v, v, labels, lmask, Ms=Ms)
    # explicit separable=False works
    A.random_affine_batch(None, v, v, labels, lmask, Ms=Ms, separable=False)


def test_clahe_matches_cv2():
    img = _img(64, 64, seed=2)
    ref_op = cv2.createCLAHE(clipLimit=1.0, tileGridSize=(4, 4))
    ref = cv2.merge([ref_op.apply(c) for c in cv2.split(img)])
    mine = np.asarray(clahe_batch(jnp.asarray(img[None])))[0]
    diff = np.abs(mine.astype(int) - ref.astype(int))
    assert np.mean(diff) < 1.5, np.mean(diff)
    assert np.quantile(diff, 0.99) <= 4, np.quantile(diff, 0.99)


def test_hsv_roundtrip_and_jitter():
    img = _img(32, 32, seed=3).astype(np.float32)
    rt = np.asarray(A._hsv_to_rgb(A._rgb_to_hsv(jnp.asarray(img / 255.0)))) * 255
    assert np.abs(rt - img).max() < 1.0
    v, l = A.hsv_jitter(jax.random.PRNGKey(1), jnp.asarray(img[None]),
                        jnp.asarray(img[None]), 0.0138, 0.678, 0.36)
    v, l = np.asarray(v), np.asarray(l)
    assert v.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(v, l, atol=1e-3)  # same gains, same source
    assert (v >= -1e-3).all() and (v <= 255 + 1e-3).all()


def test_snowflake_cutout():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(50, 200, (2, 64, 64, 3)).astype(np.float32))
    labels = jnp.zeros((2, 30, 5))
    # image 0: 2 labels (cutout active); image 1: 30 labels (inactive, > n_thr)
    lmask = jnp.asarray(np.stack([
        np.r_[np.ones(2, bool), np.zeros(28, bool)], np.ones(30, bool)]))
    vo, lo, keep = A.snowflake_cutout(jax.random.PRNGKey(2), v, v, labels,
                                      lmask, n_thr=6, step=16, n_snow=10)
    vo, lo = np.asarray(vo), np.asarray(lo)
    zeros0 = (vo[0] == 0).all(-1).sum()
    assert zeros0 > 100                      # cuts applied to image 0
    assert (np.asarray(vo[1]) > 0).all()     # image 1 untouched
    np.testing.assert_array_equal(vo == 0, lo == 0)  # both modalities aligned


def test_mosaic4_structure():
    s = 32
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(1, 255, (4, s, s, 3)).astype(np.float32))
    labels = jnp.asarray(np.tile(
        np.asarray([[0, 8, 8, 24, 24]], np.float32), (4, 1, 1)))
    lmask = jnp.ones((4, 1), bool)
    v4, l4, lab4, m4 = A.mosaic4(jax.random.PRNGKey(3), imgs, imgs, labels,
                                 lmask, s)
    assert v4.shape == (4, 2 * s, 2 * s, 3)
    assert lab4.shape == (4, 4, 5) and m4.shape == (4, 4)
    lab4 = np.asarray(lab4)
    assert (lab4[..., 1:] >= 0).all() and (lab4[..., 1:] <= 2 * s).all()
    # some canvas area must be filled from sources (nonzero)
    assert (np.asarray(v4) > 0).mean() > 0.2


def test_letterbox_labels():
    labels = jnp.asarray([[0, 0.5, 0.5, 0.5, 0.25]])  # cls cx cy w h
    out = np.asarray(A.letterbox_labels(labels, (100, 200), ratio=0.5,
                                        pad=(10, 20)))
    # cx*200*0.5 = 50, w*200*0.5 = 50 -> x1 = 50-25+10 = 35, x2 = 85
    # cy*100*0.5 = 25, h*100*0.5 = 12.5 -> y1 = 25-6.25+20, y2 = +12.5
    np.testing.assert_allclose(out[0], [0, 35, 38.75, 85, 51.25], atol=1e-4)


def test_clahe_non_divisible_shape_matches_cv2():
    """Non-tile-divisible shapes follow cv2's reflect-extend-then-crop rule
    (cv2 CLAHE handles arbitrary sizes; KAIST shapes stay on the exact
    divisible path)."""
    import cv2

    from double_yolo_kaist_tpu.data.clahe import clahe_batch

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (42, 63, 3), dtype=np.uint8)
    ours = np.asarray(clahe_batch(jnp.asarray(img[None]))[0])
    cl = cv2.createCLAHE(clipLimit=1.0, tileGridSize=(4, 4))
    ref = np.stack([cl.apply(img[..., c]) for c in range(3)], -1)
    # cv2 extends with BORDER_REFLECT_101 (mirror w/o edge repeat); jnp's
    # "reflect" matches; allow tiny LUT-rounding differences at the border
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.mean(diff) < 1.0, np.mean(diff)
    assert np.quantile(diff, 0.99) <= 2, np.quantile(diff, 0.99)
