"""Scan-based multi-step trainer == sequence of single steps; fused
augment+train dispatch == unfused pipeline."""

import os

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.data.dataset import KaistDataset
from double_yolo_kaist_tpu.train import loss as LS
from double_yolo_kaist_tpu.train import optim as OPT
from double_yolo_kaist_tpu.train.step import (create_train_state,
                                              make_multi_step,
                                              make_train_step)
from double_yolo_kaist_tpu.train.trainer import Trainer

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")

HYP = {"box": 1.0, "obj": 1.0, "cls": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
       "iou_t": 0.2, "fl_gamma": 0.0, "momentum": 0.9, "weight_decay": 0.0}


def _batches(k, bs=2, seed=0):
    rng = np.random.default_rng(seed)
    t, m = LS.pad_labels(
        [np.asarray([[0, 0.5, 0.5, 0.2, 0.4]], np.float32)] * bs, 4)
    return {
        "v": rng.integers(0, 256, (k, bs, 64, 64, 3), dtype=np.uint8),
        "l": rng.integers(0, 256, (k, bs, 64, 64, 3), dtype=np.uint8),
        "targets": np.broadcast_to(t, (k,) + t.shape).copy(),
        "tmask": np.broadcast_to(m, (k,) + m.shape).copy(),
    }


def test_multi_step_matches_sequential():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    tx = OPT.make_optimizer(HYP, lambda s: 1e-3, sgd=True)
    K = 3
    batches = _batches(K)
    rng = jax.random.PRNGKey(5)

    # sequential singles
    s1 = create_train_state(ir, jax.random.PRNGKey(0), tx)
    step = make_train_step(ir, HYP, tx, compute_dtype=jnp.float32,
                           donate=False)
    r = rng
    seq_losses = []
    for i in range(K):
        b = {kk: v[i] for kk, v in batches.items()}
        s1, m = step(s1, b, r)
        seq_losses.append(float(m["loss"]))
        r = jax.random.fold_in(r, 1)

    # one scan dispatch
    s2 = create_train_state(ir, jax.random.PRNGKey(0), tx)
    multi = make_multi_step(ir, HYP, tx, compute_dtype=jnp.float32)
    s2, metrics = multi(s2, {k: jnp.asarray(v) for k, v in batches.items()},
                        rng)
    scan_losses = [float(x) for x in np.asarray(metrics["loss"])]

    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.params["l0"]["w"]),
                               np.asarray(s1.params["l0"]["w"]),
                               rtol=1e-5, atol=1e-6)
    assert int(jax.device_get(s2.step)) == K


FULL_HYP = {"lr0": 1e-3, "lrf": 0.1, "box": 1.0, "obj": 1.0, "cls": 1.0,
            "cls_pw": 1.0, "obj_pw": 1.0, "iou_t": 0.2, "fl_gamma": 0.0,
            "ciou": 1.0, "momentum": 0.9, "weight_decay": 0.0,
            "hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36,
            "degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}


def test_fused_images_in_matches_pool_variant():
    """make_fused_multi_step(images_in=True) — the pinned-host/streaming
    flavor where source rows arrive pre-gathered — must produce exactly the
    state of the pool-gather flavor given the same rows/keys."""
    from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn
    from double_yolo_kaist_tpu.train.step import make_fused_multi_step

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    tx = OPT.make_optimizer(FULL_HYP, lambda s: 1e-3, sgd=True)
    src_hw, K, B, N = (128, 160), 2, 2, 8
    rng = np.random.default_rng(9)
    pool_v = jnp.asarray(rng.integers(0, 256, (N, *src_hw, 3), np.uint8))
    pool_l = jnp.asarray(rng.integers(0, 256, (N, *src_hw, 3), np.uint8))
    load = rng.integers(0, N, (K, 4 * B)).astype(np.int32)
    t, m = LS.pad_labels(
        [np.asarray([[0, 0.5, 0.5, 0.2, 0.4]], np.float32)] * B, 4)
    xs_common = {"b0": np.arange(K, dtype=np.int32) * B,
                 "targets": np.broadcast_to(t, (K,) + t.shape).copy(),
                 "tmask": np.broadcast_to(m, (K,) + m.shape).copy()}
    aug_key, step_rng = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

    aug_pool = make_train_augment_fn(src_hw, 64, FULL_HYP, from_pool=True,
                                     jit=False)
    fused_p = make_fused_multi_step(ir, FULL_HYP, tx, aug_pool,
                                    compute_dtype=jnp.float32)
    s1 = create_train_state(ir, jax.random.PRNGKey(0), tx)
    s1, m1 = fused_p(s1, pool_v, pool_l, {**xs_common, "load": load},
                     aug_key, step_rng)

    aug_img = make_train_augment_fn(src_hw, 64, FULL_HYP, from_pool=False,
                                    jit=False)
    fused_i = make_fused_multi_step(ir, FULL_HYP, tx, aug_img,
                                    compute_dtype=jnp.float32,
                                    images_in=True)
    s2 = create_train_state(ir, jax.random.PRNGKey(0), tx)
    rows = {"v_u8": jnp.take(pool_v, jnp.asarray(load), axis=0),
            "l_u8": jnp.take(pool_l, jnp.asarray(load), axis=0)}
    s2, m2 = fused_i(s2, {**xs_common, **rows}, aug_key, step_rng)

    np.testing.assert_allclose(np.asarray(m2["loss"]), np.asarray(m1["loss"]),
                               rtol=1e-6, atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        s2.params, s1.params)
    assert int(jax.device_get(s2.step)) == K


def test_fused_double_buffer_matches_plain():
    """make_fused_multi_step(double_buffer=True) — the scan-carried
    one-slot augment buffer (overlap experiment, VERDICT r3 item 4) — must
    train exactly the batches of the plain fused path: same augment keys,
    same step rng chain, identical final state and metrics (up to XLA's
    fusion/excess-precision freedom: routing the augment output through
    the scan carry changes fusion boundaries, so isolated f32 ulps may
    differ — same tolerance as the images_in variant)."""
    from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn
    from double_yolo_kaist_tpu.train.step import make_fused_multi_step

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    tx = OPT.make_optimizer(FULL_HYP, lambda s: 1e-3, sgd=True)
    src_hw, K, B, N = (128, 160), 3, 2, 8
    rng = np.random.default_rng(11)
    pool_v = jnp.asarray(rng.integers(0, 256, (N, *src_hw, 3), np.uint8))
    pool_l = jnp.asarray(rng.integers(0, 256, (N, *src_hw, 3), np.uint8))
    t, m = LS.pad_labels(
        [np.asarray([[0, 0.5, 0.5, 0.2, 0.4]], np.float32)] * B, 4)
    xs = {"b0": np.arange(K, dtype=np.int32) * B,
          "load": rng.integers(0, N, (K, 4 * B)).astype(np.int32),
          "targets": np.broadcast_to(t, (K,) + t.shape).copy(),
          "tmask": np.broadcast_to(m, (K,) + m.shape).copy()}
    aug_key, step_rng = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    aug = make_train_augment_fn(src_hw, 64, FULL_HYP, from_pool=True,
                                jit=False)

    states = []
    for db in (False, True):
        fused = make_fused_multi_step(ir, FULL_HYP, tx, aug,
                                      compute_dtype=jnp.float32,
                                      double_buffer=db)
        s = create_train_state(ir, jax.random.PRNGKey(0), tx)
        s, met = fused(s, pool_v, pool_l, xs, aug_key, step_rng)
        states.append((s, met))

    (s1, m1), (s2, m2) = states
    np.testing.assert_allclose(np.asarray(m2["loss"]), np.asarray(m1["loss"]),
                               rtol=1e-6, atol=1e-7)
    # weights after K lr=1e-3 steps: ulp-level augment differences surface
    # as ~1e-7 absolute on small-magnitude leaves (a wrong batch would be
    # ~1e-2); atol dominates the check
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s2.params, s1.params)
    assert int(jax.device_get(s2.step)) == K


def test_fused_trainer_epoch_matches_unfused(tmp_path):
    """The fused augment+train dispatch (device pool + scan, Trainer's
    steps_per_dispatch>1 fast path) produces the same parameters as the
    unfused pipeline (per-batch augment programs + grouped multi-step) —
    same epoch keys, same host sampling, same math."""
    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    logical = []
    for i in range(8):
        v = rng.integers(0, 256, (128, 160, 3), dtype=np.uint8)
        l = rng.integers(0, 256, (128, 160, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"I{i}_visible.jpg"), v)
        cv2.imwrite(str(img_dir / f"I{i}_lwir.jpg"), l)
        (lab_dir / f"I{i}.txt").write_text("0 0.5 0.5 0.25 0.4\n")
        logical.append(str(img_dir / f"I{i}.jpg"))
    split = tmp_path / "t.txt"
    split.write_text("\n".join(logical) + "\n")
    ir = compile_cfg(TINY, yolo_strides=[8, 4])

    def run(device_cache):
        ds = KaistDataset(str(split), img_size=64, batch_size=2,
                          augment=True, hyp=FULL_HYP)
        tr = Trainer(ir, FULL_HYP, epochs=1, batch_size=2, img_size=64,
                     train_dataset=ds, val_dataset=ds, sgd=True,
                     steps_per_dispatch=2, compute_dtype=jnp.float32,
                     out_dir=str(tmp_path / f"runs{device_cache}"),
                     device_cache=device_cache)
        last, _ = tr.train_one_epoch(0, print_freq=1000)
        return tr, last

    tr_f, last_f = run(True)     # pool engages -> fused path
    tr_u, last_u = run(False)    # streaming -> per-batch augment + grouping
    assert tr_f._fused_steps
    assert not tr_u._fused_steps
    assert int(jax.device_get(tr_f.state.step)) == 4
    np.testing.assert_allclose(last_f["loss"], last_u["loss"],
                               rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        tr_f.state.params, tr_u.state.params)


def test_fused_multi_scale_trainer_matches_unfused(tmp_path):
    """Multi-scale on the fused fast path (round 4: the steps_per_dispatch>1
    + multi_scale restriction is lifted): the bucket size is drawn once per
    K-batch dispatch (pipeline.train_batch_plan size_every), each bucket
    compiles its own fused program, and the result must equal the unfused
    multi-scale pipeline batch for batch (same plan rng -> same buckets,
    same augment keys, same math). Reference multi-scale: train.py:46-59."""
    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    logical = []
    for i in range(8):
        v = rng.integers(0, 256, (128, 160, 3), dtype=np.uint8)
        l = rng.integers(0, 256, (128, 160, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"I{i}_visible.jpg"), v)
        cv2.imwrite(str(img_dir / f"I{i}_lwir.jpg"), l)
        (lab_dir / f"I{i}.txt").write_text("0 0.5 0.5 0.25 0.4\n")
        logical.append(str(img_dir / f"I{i}.jpg"))
    split = tmp_path / "t.txt"
    split.write_text("\n".join(logical) + "\n")
    ir = compile_cfg(TINY, yolo_strides=[8, 4])

    from double_yolo_kaist_tpu.train.trainer import multi_scale_buckets
    sizes = multi_scale_buckets(64)
    assert len(sizes) > 1            # the test must exercise >1 program

    def run(device_cache):
        ds = KaistDataset(str(split), img_size=64, batch_size=2,
                          augment=True, hyp=FULL_HYP)
        tr = Trainer(ir, FULL_HYP, epochs=1, batch_size=2, img_size=64,
                     train_dataset=ds, val_dataset=ds, sgd=True,
                     multi_scale=True, steps_per_dispatch=2,
                     compute_dtype=jnp.float32,
                     out_dir=str(tmp_path / f"runs_ms{device_cache}"),
                     device_cache=device_cache)
        last, _ = tr.train_one_epoch(0, print_freq=1000)
        return tr, last

    tr_f, last_f = run(True)
    tr_u, last_u = run(False)
    # the fused trainer compiled one program per bucket actually drawn
    drawn = {size for (_, size) in tr_f._fused_steps}
    assert drawn and drawn <= set(sizes)
    assert int(jax.device_get(tr_f.state.step)) == 4
    np.testing.assert_allclose(last_f["loss"], last_u["loss"],
                               rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        tr_f.state.params, tr_u.state.params)
