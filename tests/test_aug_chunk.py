"""Chunked augmentation == unchunked augmentation, bit-for-bit.

make_train_augment_fn(chunk=k) runs the heavy image work k canvases at a
time through an on-device lax.map to bound the program's temp arena (the
round-3 fix for the HBM thrash when the augment and train-step programs are
co-resident). All randoms are pre-sampled at full batch shape with the
exact draws the unchunked ops make, so the outputs must agree to float
epsilon (XLA fuses the lax.map body differently than the straight-line
program, so the last bits can differ) for every chunk size, in both partner
modes, with and without snowflake/CLAHE; masks must be identical.
"""

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn


def _inputs(n_imgs, hw=(96, 120), T=5, seed=0):
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.integers(0, 256, (n_imgs,) + hw + (3,), np.uint8))
    l = jnp.asarray(rng.integers(0, 256, (n_imgs,) + hw + (3,), np.uint8))
    lab = np.zeros((n_imgs, T, 5), np.float32)
    m = np.zeros((n_imgs, T), bool)
    for i in range(n_imgs):
        k = rng.integers(1, T + 1)
        lab[i, :k, 0] = 0
        lab[i, :k, 1:3] = rng.uniform(0.3, 0.7, (k, 2))
        lab[i, :k, 3:5] = rng.uniform(0.1, 0.25, (k, 2))
        m[i, :k] = True
    return v, l, jnp.asarray(lab), jnp.asarray(m)


HYP = {"degrees": 5.0, "translate": 0.05, "scale": 0.2, "shear": 2.0,
       "hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36}


def _run(chunk, *, epoch_partners, snowflake, nb=8, s=64):
    n = 4 * nb if epoch_partners else nb
    v, l, lab, m = _inputs(n)
    fn = make_train_augment_fn((96, 120), s, HYP, snowflake=snowflake,
                               epoch_partners=epoch_partners, chunk=chunk)
    out = fn(jax.random.PRNGKey(7), v, l, lab, m)
    return jax.device_get(out)


def _assert_same(a, b):
    assert set(a) == set(b)
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        if x.dtype == bool:
            np.testing.assert_array_equal(x, y, err_msg=k)
        else:
            np.testing.assert_allclose(x, y, atol=5e-5, rtol=5e-4,
                                       err_msg=k)


def test_chunked_matches_unchunked_epoch_partners():
    ref = _run(0, epoch_partners=True, snowflake=False)
    for c in (1, 2, 4):
        _assert_same(_run(c, epoch_partners=True, snowflake=False), ref)


def test_chunked_matches_unchunked_batch_partners():
    ref = _run(0, epoch_partners=False, snowflake=False)
    _assert_same(_run(4, epoch_partners=False, snowflake=False), ref)


def test_chunked_matches_unchunked_snowflake():
    ref = _run(0, epoch_partners=True, snowflake=True)
    _assert_same(_run(4, epoch_partners=True, snowflake=True), ref)


def test_nondivisor_chunk_falls_back_to_divisor():
    # nb=8, chunk=3 -> largest divisor <= 3 is 2; still identical
    ref = _run(0, epoch_partners=True, snowflake=False)
    _assert_same(_run(3, epoch_partners=True, snowflake=False), ref)
