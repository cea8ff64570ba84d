"""Dataset reader + device input pipeline on a synthetic on-disk mini-KAIST
(reference directory conventions: *_visible/_lwir pairs, images->labels txt,
.shapes sidecar, rect batch grouping)."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.data.dataset import KaistDataset
from double_yolo_kaist_tpu.data.pipeline import (eval_batches,
                                                 make_eval_preprocess_fn,
                                                 train_batches)
from double_yolo_kaist_tpu.train import optim as OPT
from double_yolo_kaist_tpu.train.step import create_train_state, make_train_step

W0, H0 = 160, 128   # mini native size (KAIST is 640x512; same 1.25 aspect)

HYP = {"box": 3.54, "obj": 64.3, "cls": 37.4, "cls_pw": 1.0, "obj_pw": 1.0,
       "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0, "momentum": 0.9,
       "weight_decay": 0.0, "hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36,
       "degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}


@pytest.fixture(scope="module")
def mini_kaist(tmp_path_factory):
    root = tmp_path_factory.mktemp("kaist")
    img_dir = root / "images" / "set00"
    lab_dir = root / "labels" / "set00"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    logical = []
    for i in range(8):
        v = rng.integers(0, 256, (H0, W0, 3), dtype=np.uint8)
        l = rng.integers(0, 256, (H0, W0, 3), dtype=np.uint8)
        stem = f"I{i:05d}"
        cv2.imwrite(str(img_dir / f"{stem}_visible.jpg"), v)
        cv2.imwrite(str(img_dir / f"{stem}_lwir.jpg"), l)
        with open(lab_dir / f"{stem}.txt", "w") as f:
            f.write("0 0.5 0.5 0.25 0.4\n0 0.25 0.3 0.1 0.2\n")
        logical.append(str(img_dir / f"{stem}.jpg"))
    split = root / "train.txt"
    split.write_text("\n".join(logical) + "\n")
    return str(split)


def test_dataset_loads(mini_kaist):
    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4)
    assert len(ds) == 8
    assert ds.shapes.shape == (8, 2)
    assert (ds.shapes == [W0, H0]).all()
    v, l = ds.load_pair(0)
    assert v.shape == (H0, W0, 3) and l.shape == (H0, W0, 3)
    assert all(lab.shape == (2, 5) for lab in ds.labels)
    gt = ds.coco_ground_truth()
    assert gt[0].shape == (2, 4)
    np.testing.assert_allclose(gt[0][0], [60, 38.4, 100, 89.6], atol=1e-4)


@pytest.mark.parametrize("mode", ["ram", "disk"])
def test_image_cache_modes(mini_kaist, mode):
    """cache_images: cached reads bit-match fresh decodes (reference
    kaist_dataset.py --cache-images; disk mode is this port's addition for
    the 1-core host where JPEG decode bounds the train loop)."""
    ds0 = KaistDataset(mini_kaist, img_size=64)
    ds = KaistDataset(mini_kaist, img_size=64, cache_images=mode)
    for i in (0, 3, 7):
        v0, l0 = ds0.load_pair(i)
        v1, l1 = ds.load_pair(i)     # populates the cache
        v2, l2 = ds.load_pair(i)     # served from the cache
        np.testing.assert_array_equal(v0, v1)
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(l1, l2)
    if mode == "disk":
        assert ds._disk_key(0).exists()
        # a fresh dataset object reuses the on-disk cache
        ds2 = KaistDataset(mini_kaist, img_size=64, cache_images="disk")
        v3, _ = ds2.load_pair(0)
        np.testing.assert_array_equal(v3, ds0.load_pair(0)[0])


def test_disk_cache_survives_split_reorder(mini_kaist, tmp_path):
    """Cache entries are keyed by the image PATH: editing/reordering/
    shrinking the split file in place must never map a cached pair onto a
    different image (the failure mode of position-keyed caches)."""
    lines = open(mini_kaist).read().splitlines()
    split = tmp_path / "reorder.txt"
    split.write_text("\n".join(lines) + "\n")
    ds = KaistDataset(str(split), img_size=64, cache_images="disk")
    ref = {i: ds.load_pair(i) for i in range(len(ds))}   # populate cache
    # edit the split in place: drop the first entry and reverse the rest
    split.write_text("\n".join(reversed(lines[1:])) + "\n")
    ds2 = KaistDataset(str(split), img_size=64, cache_images="disk")
    v, l = ds2.load_pair(0)          # now the formerly-LAST image
    np.testing.assert_array_equal(v, ref[len(lines) - 1][0])
    np.testing.assert_array_equal(l, ref[len(lines) - 1][1])
    assert ds2._disk_key(0).exists()  # and it was served from the cache


def test_rect_batch_shapes(mini_kaist):
    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, rect=True)
    # aspect 128/160 = 0.8 -> batch shape ceil(0.8*64/32)*32 x 64
    assert ds.batch_shapes.shape == (2, 2)
    assert (ds.batch_shapes[:, 1] == 64).all()
    assert (ds.batch_shapes[:, 0] == 64).all()  # ceil(51.2/32)*32 = 64


def test_train_batches_shapes(mini_kaist):
    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, augment=True,
                      hyp=HYP)
    key = jax.random.PRNGKey(0)
    batches = list(train_batches(ds, 4, key, img_size=64, hyp=HYP,
                                 max_targets_per_img=8))
    assert len(batches) == 2
    batch, idx = batches[0]
    assert batch["v"].shape == (4, 64, 64, 3)
    assert batch["l"].shape == (4, 64, 64, 3)
    assert batch["targets"].shape == (4, 32, 5)   # 4x mosaic multiplier
    assert batch["tmask"].shape == (4, 32)
    v = np.asarray(batch["v"])
    assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1.0
    t = np.asarray(batch["targets"])
    m = np.asarray(batch["tmask"])
    assert m.any()
    assert (t[m][:, 1:] >= 0).all() and (t[m][:, 1:] <= 1).all()


def test_device_pool_matches_streaming(mini_kaist):
    """Device-resident image pool (train_batches(device_cache=True)): the
    whole dataset's u8 pairs live on device and each batch is an on-device
    row gather — the yielded batches must be bit-identical to the streaming
    (per-batch upload) path under the same keys/seed."""
    ds_a = KaistDataset(mini_kaist, img_size=64, batch_size=4, augment=True,
                        hyp=HYP)
    ds_b = KaistDataset(mini_kaist, img_size=64, batch_size=4, augment=True,
                        hyp=HYP)
    key = jax.random.PRNGKey(7)
    stream = list(train_batches(ds_a, 4, key, img_size=64, hyp=HYP,
                                max_targets_per_img=8, device_cache=False))
    pooled = list(train_batches(ds_b, 4, key, img_size=64, hyp=HYP,
                                max_targets_per_img=8, device_cache=True))
    assert ds_b._device_pool is not None and ds_a is not ds_b
    assert len(stream) == len(pooled) == 2
    for (ba, ia), (bb, ib) in zip(stream, pooled):
        np.testing.assert_array_equal(ia, ib)
        for k in ("v", "l", "targets", "tmask"):
            np.testing.assert_array_equal(np.asarray(ba[k]),
                                          np.asarray(bb[k]), err_msg=k)


def test_device_pool_budget_gate(mini_kaist, monkeypatch):
    """Auto mode (device_cache=None) respects DYK_DEVICE_CACHE_GB: a budget
    below the dataset size falls back to streaming."""
    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, augment=True,
                      hyp=HYP)
    monkeypatch.setenv("DYK_DEVICE_CACHE_GB", "0.0000001")
    monkeypatch.setenv("DYK_HOST_CACHE_GB", "0")   # pin to pure streaming
    next(iter(train_batches(ds, 4, jax.random.PRNGKey(0), img_size=64,
                            hyp=HYP, max_targets_per_img=8)))
    assert getattr(ds, "_device_pool", None) is None
    assert getattr(ds, "_host_pool", None) is None
    monkeypatch.setenv("DYK_DEVICE_CACHE_GB", "4")
    next(iter(train_batches(ds, 4, jax.random.PRNGKey(0), img_size=64,
                            hyp=HYP, max_targets_per_img=8)))
    assert ds._device_pool is not None


def test_host_pool_matches_streaming(mini_kaist, monkeypatch):
    """Pinned-host middle tier (auto-selected when the dataset exceeds the
    HBM budget but fits DYK_HOST_CACHE_GB): batches must be bit-identical to
    streaming. Skips when the backend has no usable pinned_host memory
    space (the virtual CPU mesh may not)."""
    from double_yolo_kaist_tpu.data.pipeline import host_image_pool

    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, augment=True,
                      hyp=HYP)
    src_hw = tuple(int(x) for x in ds.shapes[0][::-1])
    if host_image_pool(ds, src_hw) is None:
        import pytest
        pytest.skip("backend lacks pinned_host host-offload support")
    monkeypatch.setenv("DYK_DEVICE_CACHE_GB", "0.0000001")  # force off HBM
    key = jax.random.PRNGKey(11)
    hosted = list(train_batches(ds, 4, key, img_size=64, hyp=HYP,
                                max_targets_per_img=8))
    assert getattr(ds, "_device_pool", None) is None
    assert ds._host_pool is not None
    ds2 = KaistDataset(mini_kaist, img_size=64, batch_size=4, augment=True,
                       hyp=HYP)
    stream = list(train_batches(ds2, 4, key, img_size=64, hyp=HYP,
                                max_targets_per_img=8, device_cache=False))
    assert len(stream) == len(hosted) == 2
    for (ba, ia), (bb, ib) in zip(stream, hosted):
        np.testing.assert_array_equal(ia, ib)
        for k in ("v", "l", "targets", "tmask"):
            np.testing.assert_array_equal(np.asarray(ba[k]),
                                          np.asarray(bb[k]), err_msg=k)


def test_augment_bf16_pixel_path():
    """Opt-in reduced-precision pixel path (pix_dtype=bfloat16 /
    DYK_AUG_DTYPE=bf16): label geometry must be EXACTLY the float32 path
    (it always stays f32) and pixels must agree within bf16 lerp rounding
    (~1 u8 LSB on the [0,1] output)."""
    from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn
    from double_yolo_kaist_tpu.train.loss import pad_labels

    src_hw, B = (H0, W0), 2
    rng = np.random.default_rng(5)
    v = rng.integers(0, 256, (4 * B, H0, W0, 3), dtype=np.uint8)
    l = rng.integers(0, 256, (4 * B, H0, W0, 3), dtype=np.uint8)
    t, m = pad_labels(
        [np.asarray([[0, 0.5, 0.5, 0.3, 0.4]], np.float32)] * (4 * B), 8)
    key = jax.random.PRNGKey(2)
    args = (key, jnp.asarray(v), jnp.asarray(l), jnp.asarray(t),
            jnp.asarray(m))
    out32 = make_train_augment_fn(src_hw, 64, HYP,
                                  pix_dtype=jnp.float32)(*args)
    out16 = make_train_augment_fn(src_hw, 64, HYP,
                                  pix_dtype=jnp.bfloat16)(*args)
    assert out16["v"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out16["targets"]),
                                  np.asarray(out32["targets"]))
    np.testing.assert_array_equal(np.asarray(out16["tmask"]),
                                  np.asarray(out32["tmask"]))
    for k in ("v", "l"):
        a = np.asarray(out16[k], np.float32)
        b = np.asarray(out32[k])
        # two chained bf16 lerps (resize -> warp) compound to a few u8 LSB
        # on isolated pixels; the bulk must stay within ~1 LSB
        np.testing.assert_allclose(a, b, atol=8.0 / 255)
        assert np.abs(a - b).mean() < 0.5 / 255


def test_eval_pool_matches_streaming(mini_kaist, monkeypatch):
    """eval_batches residency tiers: the HBM-pooled path (gather fused into
    the jitted preprocess program) must yield bit-identical batches to
    streaming, and the shared-budget accounting must decline a pool that
    would overflow DYK_DEVICE_CACHE_GB combined with already-resident ones."""
    from double_yolo_kaist_tpu.data import pipeline as PL

    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, rect=True)
    stream = list(PL.eval_batches(ds, 3, device_cache=False))
    pooled = list(PL.eval_batches(ds, 3, device_cache=True))
    assert ds._device_pool is not None
    assert len(stream) == len(pooled) == 3     # 8 imgs, bs3 -> 3,3,2
    for (va, la, ia, rpa), (vb, lb, ib, rpb) in zip(stream, pooled):
        np.testing.assert_array_equal(ia, ib)
        assert rpa == rpb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # shared budget: a second dataset whose pool would exceed the remaining
    # budget auto-declines (falls to host tier or streaming), never OOMs
    resident = PL._RESIDENT["bytes"]
    assert resident > 0
    ds2 = KaistDataset(mini_kaist, img_size=64, batch_size=4, rect=True)
    h, w = (int(x) for x in ds2.shapes[0][::-1])
    need = 2 * len(ds2) * h * w * 3
    # budget admits the new pool alone but NOT combined with the resident
    # ones (other tests in the session may have built pools already)
    monkeypatch.setenv("DYK_DEVICE_CACHE_GB",
                       str((resident + need / 2) / 1e9))
    monkeypatch.setenv("DYK_HOST_CACHE_GB", "0")
    list(PL.eval_batches(ds2, 4))              # auto mode
    assert getattr(ds2, "_device_pool", None) is None


def test_resident_budget_released_on_gc(mini_kaist):
    """Pool bytes return to the shared budget when the owning dataset is
    garbage-collected — a long-lived process building pools for many dataset
    objects must not permanently exhaust DYK_DEVICE_CACHE_GB."""
    import gc

    from double_yolo_kaist_tpu.data import pipeline as PL

    before = PL._RESIDENT["bytes"]
    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, rect=True)
    h, w = (int(x) for x in ds.shapes[0][::-1])
    pool = PL.device_image_pool(ds, (h, w), True)
    assert pool is not None
    assert PL._RESIDENT["bytes"] == before + 2 * len(ds) * h * w * 3
    del ds, pool
    gc.collect()
    assert PL._RESIDENT["bytes"] == before


def test_host_pool_tier_sticky_once_pinned(mini_kaist, monkeypatch):
    """A dataset whose pairs are already pinned in the host pool must keep
    the host tier on re-selection even when the SHARED budget has since been
    consumed by other pools (e.g. the in-train eval split pinning after
    epoch 0): its own bytes are already inside _HOST_RESIDENT, so re-running
    the `need + resident <= budget` gate double-counts them and silently
    demotes training to per-batch streaming — observed as a 3.5x epoch-time
    regression on a full-KAIST fit (15.7 GB train pool + 4.1 GB val pool
    vs DYK_HOST_CACHE_GB=24)."""
    from double_yolo_kaist_tpu.data import pipeline as PL

    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, rect=True)
    h, w = (int(x) for x in ds.shapes[0][::-1])
    monkeypatch.setenv("DYK_DEVICE_CACHE_GB", "0")  # force past the HBM tier
    sentinel = ("pv", "pl", lambda pool, idx: None)
    ds._host_pool = sentinel                        # as host_image_pool caches
    nbytes = 2 * len(ds) * h * w * 3
    PL._claim_resident(PL._HOST_RESIDENT, ds, nbytes)
    # another dataset's pool has since filled the shared budget
    monkeypatch.setenv("DYK_HOST_CACHE_GB",
                       str(PL._HOST_RESIDENT["bytes"] / 1e9))
    tier, pool = PL.select_image_pool(ds, (h, w), None)
    assert tier == "host" and pool is sentinel
    # an UNpinned dataset over the exhausted budget still streams
    ds2 = KaistDataset(mini_kaist, img_size=64, batch_size=4, rect=True)
    assert PL.select_image_pool(ds2, (h, w), None) == (None, None)


def test_eval_batches_letterbox(mini_kaist):
    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, rect=True)
    out = list(eval_batches(ds, 4))
    assert len(out) == 2
    v, l, idx, (ratio, pad) = out[0]
    assert v.shape == (4, 64, 64, 3)
    # 128x160 -> resize (51, 64) -> pad to 64: dh = 6.5
    assert abs(ratio[0] - 51 / 128) < 1e-9
    assert abs(pad[1] - 6.5) < 1e-9
    v = np.asarray(v)
    assert (v[:, :6] == 0).all() and (v[:, -6:] == 0).all()  # top/bottom pad
    assert v[:, 7:57].max() > 0.1


def test_end_to_end_train(mini_kaist, tmp_path):
    """3 real optimizer steps through the full pipeline on the tiny model."""
    ds = KaistDataset(mini_kaist, img_size=64, batch_size=4, augment=True,
                      hyp=HYP)
    ir = compile_cfg(os.path.join(os.path.dirname(__file__), "fixtures",
                                  "tiny_dyolov3.cfg"), yolo_strides=[8, 4])
    sched = OPT.cosine_epoch_schedule(1e-3, 0.1, 5, 2, warmup=False)
    tx = OPT.make_optimizer(HYP, sched, sgd=True)
    state = create_train_state(ir, jax.random.PRNGKey(0), tx)
    step = make_train_step(ir, HYP, tx, compute_dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    losses = []
    for epoch in range(2):
        for batch, idx in train_batches(ds, 4, jax.random.fold_in(key, epoch),
                                        img_size=64, hyp=HYP,
                                        max_targets_per_img=8,
                                        seed_epoch=epoch):
            state, metrics = step(state, batch, jax.random.fold_in(key, epoch))
            losses.append(float(metrics["loss"]))
    assert len(losses) == 4
    assert np.isfinite(losses).all()


def test_mosaic_partners_epoch_wide_uniform(tmp_path):
    """Mosaic partners are host-sampled UNIFORMLY over the whole epoch
    (reference kaist_dataset.py:230 draws 3 partners per image from the
    full dataset): from the very first batch, partners outside the batch
    appear, and over many batches every image serves as a partner with
    roughly equal frequency."""
    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    vals = [15 + 25 * i for i in range(8)]     # unique constant per image
    logical = []
    for i, v in enumerate(vals):
        im = np.full((H0, W0, 3), v, np.uint8)
        cv2.imwrite(str(img_dir / f"I{i}_visible.jpg"), im)
        cv2.imwrite(str(img_dir / f"I{i}_lwir.jpg"), im)
        (lab_dir / f"I{i}.txt").write_text("0 0.5 0.5 0.5 0.5\n")
        logical.append(str(img_dir / f"I{i}.jpg"))
    (tmp_path / "t.txt").write_text("\n".join(logical))
    hyp = dict(HYP, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0)
    ds = KaistDataset(str(tmp_path / "t.txt"), img_size=64, batch_size=2,
                      augment=True, hyp=hyp)

    counts = {v: 0 for v in vals}
    first_batch_foreign = 0
    nb = 0
    for epoch in range(6):
        for bi, (batch, idx) in enumerate(train_batches(
                ds, 2, jax.random.PRNGKey(epoch), img_size=64, hyp=hyp,
                seed_epoch=epoch)):
            canvas = np.asarray(batch["v"]) * 255.0
            present = {v for v in vals
                       if np.isclose(canvas, v, atol=2.0).any()}
            own = {vals[j] for j in idx}
            for v in present:
                counts[v] += 1
            if epoch == 0 and bi == 0:
                first_batch_foreign = len(present - own)
            nb += 1
    # epoch-wide from batch 1 (the old recent-batch ring could not do this)
    assert first_batch_foreign > 0, "first batch drew no outside partner"
    # every image appears as partner/member with non-trivial frequency
    assert min(counts.values()) >= nb * 0.2, counts


def test_eval_batches_mixed_shapes(tmp_path):
    """Mixed-shape datasets stream in homogeneous sub-batches (the
    docstring's promised fallback; np.stack would crash on a mixed batch
    and a single letterbox geometry would mis-scale the odd images)."""
    img_dir = tmp_path / "images" / "set00"
    lab_dir = tmp_path / "labels" / "set00"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    shapes = [(64, 96), (64, 96), (48, 80), (64, 96), (48, 80), (48, 80)]
    logical = []
    for i, (h, w) in enumerate(shapes):
        v = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        stem = f"M{i:05d}"
        cv2.imwrite(str(img_dir / f"{stem}_visible.jpg"), v)
        cv2.imwrite(str(img_dir / f"{stem}_lwir.jpg"), v)
        (lab_dir / f"{stem}.txt").write_text("0 0.5 0.5 0.25 0.4\n")
        logical.append(str(img_dir / f"{stem}.jpg"))
    (tmp_path / "t.txt").write_text("\n".join(logical) + "\n")
    ds = KaistDataset(str(tmp_path / "t.txt"), 64, 4, rect=False)

    seen = []
    for v, l, idx, (r, pad) in eval_batches(ds, 4, device_cache=False):
        # every sub-batch is homogeneous in source shape and letterboxed
        # to the square img_size
        srcs = {tuple(ds.shapes[i]) for i in idx}
        assert len(srcs) == 1
        assert v.shape[1:3] == (64, 64) and v.shape == l.shape
        seen.extend(int(i) for i in idx)
    assert seen == list(range(len(shapes)))


def test_train_augment_program_cached_across_epochs(mini_kaist):
    """train_batches reuses ONE jitted augment program across epochs —
    a fresh closure per epoch would retrace the heavy program every time."""
    from double_yolo_kaist_tpu.data import pipeline as P

    ds = KaistDataset(mini_kaist, 64, 4, rect=False, augment=True)
    P._TRAIN_AUG_CACHE.clear()
    key = jax.random.PRNGKey(0)
    for epoch in range(3):
        for _ in train_batches(ds, 4, jax.random.fold_in(key, epoch),
                               img_size=64, hyp=HYP, seed_epoch=epoch,
                               device_cache=False):
            break
    assert len(P._TRAIN_AUG_CACHE) == 1


def test_standalone_clahe_reaches_training(mini_kaist):
    """dataset.clahe=True must change the TRAIN augment output (reference
    kaist_dataset.py:311-313 'elif self.clahe'), and the Trainer follows
    the dataset's flag so train and eval distributions agree."""
    from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn
    from double_yolo_kaist_tpu.train.trainer import Trainer
    from double_yolo_kaist_tpu.config.ir import compile_cfg as _cc

    src_hw = (H0, W0)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.integers(0, 256, (4, H0, W0, 3), np.uint8))
    lab = np.zeros((4, 2, 5), np.float32)
    lab[:, 0] = [0, 0.5, 0.5, 0.25, 0.4]
    labels = jnp.asarray(lab)
    lmask = jnp.asarray(np.array([[True, False]] * 4))
    key = jax.random.PRNGKey(0)
    f0 = make_train_augment_fn(src_hw, 64, HYP, epoch_partners=False)
    f1 = make_train_augment_fn(src_hw, 64, HYP, clahe=True,
                               epoch_partners=False)
    b0 = f0(key, v, v, labels, lmask)
    b1 = f1(key, v, v, labels, lmask)
    assert not np.allclose(np.asarray(b0["v"]), np.asarray(b1["v"]))
    # same geometry/randomness: targets identical, only pixels differ
    np.testing.assert_allclose(np.asarray(b0["targets"]),
                               np.asarray(b1["targets"]))

    ir = _cc(os.path.join(os.path.dirname(__file__), "fixtures",
                          "tiny_dyolov3.cfg"), yolo_strides=[8, 4])
    ds = KaistDataset(mini_kaist, 64, 4, augment=True, hyp=HYP, clahe=True)
    thyp = {**HYP, "lr0": 1e-3, "lrf": 0.1}
    tr = Trainer(ir, thyp, epochs=1, batch_size=4, img_size=64,
                 train_dataset=ds, out_dir="/tmp/clahe_tr",
                 data_parallel=False)
    assert tr.clahe is True
