"""Host->device input pipelines: the reference's per-sample OpenCV
__getitem__ (kaist_dataset.py:321-388) re-staged as one jitted batched device
program per epoch step.

Train path (mosaic "quadra", reference order preserved):
  decode (host) -> resize to max-side=s -> mosaic-4 canvas (2s x 2s)
  -> [CLAHE + snowflake cutout] -> random affine (border=-s//2 -> s x s)
  -> HSV jitter -> xyxy->normalized xywh -> 50% flip -> float [0,1]

Eval path (rect batches): resize max-side=s -> letterbox pad to the batch
shape -> float [0,1]; letterbox params are returned for scale_coords undo.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import augment as A
from .clahe import clahe_batch
from ..train.loss import pad_labels

# distinct PRNG stream for augmentation: train_batches folds the epoch key
# with this tag before the per-batch fold_in(b0), so augment draws never
# collide with the trainer's per-step fold_in(key, i) model rng. NB
# make_fused_multi_step does NOT tag internally — the Trainer folds this
# tag into the aug_key it passes (trainer._train_one_epoch_fused), which is
# what keeps fused == unfused bit-exact; direct callers of the fused step
# must tag their aug_key themselves if they also derive step rng from the
# same base key.
AUG_STREAM_TAG = 0x41554721

# jitted train-augment programs, cached across epochs (keyed by everything
# that changes the traced program — see train_batches); bounded so
# hyp/size sweeps in one process can't pin compiled executables forever
_TRAIN_AUG_CACHE: dict = {}
_TRAIN_AUG_CACHE_MAX = 8


def make_train_augment_fn(src_hw, img_size: int, hyp: dict,
                          snowflake: bool = False, clahe: bool = False,
                          epoch_partners: bool = True,
                          chunk: int | None = None,
                          from_pool: bool = False,
                          jit: bool = True,
                          pix_dtype=None,
                          resample: str | None = None):
    """Build the jitted train-time augmentation program.

    src_hw: native image size (KAIST: (512, 640)); static.
    Returns fn(key, v_u8, l_u8, labels, lmask) -> batch dict for the train
    step, where labels are (B, T, 5) normalized xywh and the output targets
    are (B, 4T, 5) (mosaic multiplies label capacity by 4).

    ``epoch_partners``: the input arrays carry 4B images — B batch images
    followed by 3B host-sampled mosaic partners (drawn uniformly from the
    WHOLE epoch, reference kaist_dataset.py:230) — and image i mosaics with
    partners B+3i..B+3i+2. False: B images, partners drawn on device from
    the batch itself.

    ``chunk``: process the heavy image work ``chunk`` canvases at a time via
    an on-device lax.map, bounding the program's temp arena (unchunked at
    bs32/512px the temps reach ~5.6 GB) and measured slightly faster on a
    v5e (126 vs 146 ms/batch). All randoms are pre-sampled at full batch
    shape with the exact draws of the unchunked path, so chunked and
    unchunked outputs are identical (tests/test_aug_chunk.py). Default: env
    DYK_AUG_CHUNK (0 disables) or 8. (NB: the round-3 train-loop slowdown
    this was first built for turned out to be the per-pixel gathers inside
    the augment ops themselves — see augment.py mosaic_place/_warp_bilinear/
    _hsv_to_rgb — not program co-residency.)

    ``from_pool``: the first two array arguments are the WHOLE dataset's
    device-resident uint8 image pools (N, H, W, 3) plus an int32 index
    vector of the images this batch uses; the batch is gathered on device
    (one contiguous row gather) instead of uploaded. Through the axon
    tunnel host->device runs at ~48 MB/s, so streaming 4B source images
    per batch (~1 GB per 4-step dispatch at bs32) costs ~21 s — with the
    pool the steady-state upload is zero. Outputs are bit-identical to
    the streaming path (same u8 pixels, same randoms).

    ``jit``: False returns the raw traceable function (for embedding inside
    a larger program, e.g. the fused augment+train scan of
    train/step.make_fused_multi_step).

    ``pix_dtype``: PIXEL compute/storage dtype through the augment program
    (None: env DYK_AUG_DTYPE, "bf16" selects bfloat16; default float32).
    bfloat16 halves the HBM bytes of the gather/lerp-heavy image ops —
    label/box geometry always stays float32, and the train step consumes
    bf16 inputs anyway. Opt-in: pixel values differ from the float32 path
    by ~1 u8 LSB (lerp rounding), so parity-vs-reference tests run f32.

    ``resample``: how the geometric stages move pixels — "matmul" (default;
    resize/mosaic/axis-aligned-affine as MXU interpolation-matrix products,
    augment.py "resample as matmuls": TPU gathers run ~25x below HBM
    bandwidth and were ~90% of augment device time) or "gather" (the
    elementwise take/lerp forms — the reference-shaped implementation the
    matmul path is tested against; also the fallback when the affine is
    not axis-aligned). Env DYK_AUG_RESAMPLE overrides when unset. Pixel
    values differ at the accumulation-rounding level only (<=1 u8 LSB,
    tests/test_augment_mm.py); labels/masks are bit-identical.
    """
    s = img_size
    r = s / max(src_hw)
    h1, w1 = int(src_hw[0] * r), int(src_hw[1] * r)
    if pix_dtype is None:
        pix_dtype = (jnp.bfloat16
                     if os.environ.get("DYK_AUG_DTYPE", "") in
                     ("bf16", "bfloat16") else jnp.float32)
    if resample is None:
        resample = os.environ.get("DYK_AUG_RESAMPLE", "matmul")
    if resample not in ("matmul", "gather"):
        raise ValueError(f"resample must be 'matmul' or 'gather', "
                         f"got {resample!r}")
    mm = resample == "matmul"
    if chunk is None:
        chunk = int(os.environ.get("DYK_AUG_CHUNK", "8"))
    n_snow, n_thr, cut_step = 80, 24, 32   # quadra-path cutout settings
    #                                        (reference kaist_dataset.py:276)

    def heavy(v_u8, l_u8, lab, lmask, idx, centers, cut_u, Ms, hsv_r, do):
        """Resize -> mosaic paste -> CLAHE/cutout -> affine -> HSV -> flip
        for one group of canvases; all randomness comes in as arguments."""
        resize = A.resize_bilinear_mm if mm else A.resize_bilinear
        place = A.mosaic_place_mm if mm else A.mosaic_place
        v4t = resize(v_u8[idx], h1, w1,
                     dtype=pix_dtype)                 # (b, 4, h1, w1, 3)
        l4t = resize(l_u8[idx], h1, w1, dtype=pix_dtype)
        v4, l4, lab4, m4 = place(v4t, l4t, lab[idx], lmask[idx],
                                 centers, s)
        if snowflake or clahe:
            # snowflake=True matches the reference (snowflake_cutout
            # applies CLAHE internally, snowflake.py:67-69). Standalone
            # clahe=True on THIS mosaic path is a deliberate deviation:
            # the reference's `elif self.clahe` branch only runs on the
            # non-mosaic load_normal_images path (kaist_dataset.py:311-313),
            # so reference mosaic training never sees standalone CLAHE —
            # which skews train vs eval (eval always CLAHEs). We apply it
            # here to remove that skew; recorded in docs/PARITY.md.
            v4 = clahe_batch(jnp.clip(jnp.round(v4), 0, 255)
                             .astype(jnp.uint8)).astype(pix_dtype)
            l4 = clahe_batch(jnp.clip(jnp.round(l4), 0, 255)
                             .astype(jnp.uint8)).astype(pix_dtype)
        if snowflake:
            v4, l4, m4 = A.snowflake_cutout(None, v4, l4, lab4, m4,
                                            n_thr=n_thr, step=cut_step,
                                            n_snow=n_snow, u=cut_u)

        v4, l4, lab4, m4 = A.random_affine_batch(
            None, v4, l4, lab4, m4, border=-s // 2, Ms=Ms,
            separable=(hyp.get("degrees", 0.0) == 0.0
                       and hyp.get("shear", 0.0) == 0.0),
            resample="matmul" if mm else "gather")

        v4, l4 = A.hsv_jitter(None, v4, l4, 0, 0, 0, gains=hsv_r)

        targets = A.xyxy_to_norm_xywh(lab4, m4, (s, s))
        v4, l4, targets = A.flip_lr(None, v4, l4, targets, do=do)
        targets = jnp.where(m4[..., None], targets, 0.0)
        return v4 / 255.0, l4 / 255.0, targets, m4

    def fn(key, v_u8, l_u8, *rest):
        if from_pool:
            load_idx, labels, lmask = rest
            v_u8 = jnp.take(v_u8, load_idx, axis=0)
            l_u8 = jnp.take(l_u8, load_idx, axis=0)
        else:
            labels, lmask = rest
        k_mosaic, k_cut, k_affine, k_hsv, k_flip = jax.random.split(key, 5)

        # normalized xywh -> absolute xyxy in the resized frame
        # (reference load_quadra_images, kaist_dataset.py:258-264)
        cx, cy = labels[..., 1] * w1, labels[..., 2] * h1
        bw, bh = labels[..., 3] * w1, labels[..., 4] * h1
        lab = jnp.stack([labels[..., 0], cx - bw / 2, cy - bh / 2,
                         cx + bw / 2, cy + bh / 2], -1)

        # --- sample ALL randoms at full batch shape (the exact draws the
        # unchunked ops make, so chunking never changes the streams) ---
        if epoch_partners:
            nb = v_u8.shape[0] // 4
            centers = jax.random.randint(k_mosaic, (nb, 2), int(s * 0.5),
                                         int(s * 1.5) + 1)
            partners = nb + jnp.arange(3 * nb).reshape(nb, 3)
        else:
            nb = v_u8.shape[0]
            k_center, k_partner = jax.random.split(k_mosaic)
            centers = jax.random.randint(k_center, (nb, 2), int(s * 0.5),
                                         int(s * 1.5) + 1)
            partners = jax.random.randint(k_partner, (nb, 3), 0, nb)
        idx = jnp.concatenate([jnp.arange(nb)[:, None], partners], 1)
        cut_u = (jax.random.uniform(k_cut, (nb, n_snow, 2))
                 if snowflake else None)
        Ms = A._affine_matrices(
            k_affine, nb, (2 * s, 2 * s), hyp.get("degrees", 0.0),
            hyp.get("translate", 0.0), hyp.get("scale", 0.0),
            hyp.get("shear", 0.0), -s // 2)
        hsv_r = (jax.random.uniform(k_hsv, (nb, 3), minval=-1.0, maxval=1.0)
                 * jnp.asarray([hyp.get("hsv_h", 0.0), hyp.get("hsv_s", 0.0),
                                hyp.get("hsv_v", 0.0)]) + 1.0)
        do = jax.random.bernoulli(k_flip, 0.5, (nb,))

        c = max((d for d in range(1, nb + 1)
                 if nb % d == 0 and d <= chunk), default=nb) if chunk else nb
        per = (idx, centers, cut_u, Ms, hsv_r, do)
        if c < nb:
            per = jax.tree.map(
                lambda a: a.reshape((nb // c, c) + a.shape[1:]), per)
            v4, l4, targets, m4 = jax.lax.map(
                lambda p: heavy(v_u8, l_u8, lab, lmask, *p), per)
            v4, l4, targets, m4 = (
                x.reshape((nb,) + x.shape[2:]) for x in (v4, l4, targets, m4))
        else:
            v4, l4, targets, m4 = heavy(v_u8, l_u8, lab, lmask, *per)
        return {"v": v4, "l": l4, "targets": targets, "tmask": m4}

    return jax.jit(fn) if jit else fn


def make_eval_preprocess_fn(src_hw, dst_hw, img_size: int,
                            clahe: bool = False, from_pool: bool = False):
    """Jitted eval preprocessing with the reference's exact two stages:
    (1) load_image max-side resize to img_size with int() truncation
    (kaist_dataset.py:203-208), then (2) letterbox pad to dst_hw with
    scale_up=False (img_utils.py:5-53). Returns (fn, ratio, pad) matching the
    reference's ``shapes`` tuple for scale_coords undo.

    ``from_pool``: fn takes the whole dataset's device-resident u8 pools
    plus an index vector and gathers the batch rows inside the same jitted
    program (one dispatch; no per-batch upload)."""
    h0, w0 = src_hw
    r1 = img_size / max(h0, w0)
    h1, w1 = (int(h0 * r1), int(w0 * r1)) if r1 != 1 else (h0, w0)

    r2 = min(dst_hw[0] / h1, dst_hw[1] / w1, 1.0)   # scale_up=False at eval
    new_h, new_w = int(round(h1 * r2)), int(round(w1 * r2))
    dw, dh = (dst_hw[1] - new_w) / 2, (dst_hw[0] - new_h) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    bottom, right = dst_hw[0] - new_h - top, dst_hw[1] - new_w - left

    def core(v_u8, l_u8):
        v = A.resize_bilinear(v_u8, h1, w1)
        l = A.resize_bilinear(l_u8, h1, w1)
        if clahe:
            v = clahe_batch(jnp.clip(jnp.round(v), 0, 255)
                            .astype(jnp.uint8)).astype(jnp.float32)
            l = clahe_batch(jnp.clip(jnp.round(l), 0, 255)
                            .astype(jnp.uint8)).astype(jnp.float32)
        if (new_h, new_w) != (h1, w1):
            v = A.resize_bilinear(v, new_h, new_w)
            l = A.resize_bilinear(l, new_h, new_w)
        pad_widths = ((0, 0), (top, bottom), (left, right), (0, 0))
        v = jnp.pad(v, pad_widths)
        l = jnp.pad(l, pad_widths)
        return v / 255.0, l / 255.0

    if from_pool:
        fn = jax.jit(lambda pool_v, pool_l, idx: core(
            jnp.take(pool_v, idx, axis=0), jnp.take(pool_l, idx, axis=0)))
    else:
        fn = jax.jit(core)

    # reference shapes tuple: ((h0, w0), ((h1/h0, w1/w0), (dw, dh)))
    return fn, (h1 / h0, w1 / w0), (dw, dh)


def make_letterbox_fn(src_hw, dst_hw, scale_up: bool = True,
                      clahe: bool = False):
    """Single-stage letterbox (the detect flow: reference detect.py:26-48
    calls letterbox directly on the original frame, no load_image pre-resize).
    Returns (fn, ratio, (dw, dh)) with reference img_utils.py:5-53 math."""
    r = min(dst_hw[0] / src_hw[0], dst_hw[1] / src_hw[1])
    if not scale_up:
        r = min(r, 1.0)
    new_w, new_h = int(round(src_hw[1] * r)), int(round(src_hw[0] * r))
    dw, dh = (dst_hw[1] - new_w) / 2, (dst_hw[0] - new_h) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    bottom, right = dst_hw[0] - new_h - top, dst_hw[1] - new_w - left

    @jax.jit
    def fn(v_u8, l_u8):
        v = A.resize_bilinear(v_u8, new_h, new_w)
        l = A.resize_bilinear(l_u8, new_h, new_w)
        if clahe:
            v = clahe_batch(jnp.clip(jnp.round(v), 0, 255)
                            .astype(jnp.uint8)).astype(jnp.float32)
            l = clahe_batch(jnp.clip(jnp.round(l), 0, 255)
                            .astype(jnp.uint8)).astype(jnp.float32)
        pad_widths = ((0, 0), (top, bottom), (left, right), (0, 0))
        return (jnp.pad(v, pad_widths) / 255.0,
                jnp.pad(l, pad_widths) / 255.0)

    return fn, (r, r), (dw, dh)


# ------------------------------------------------------------------ iterators

def device_image_pool(dataset, src_hw, force: bool | None = None):
    """Upload the whole dataset's uint8 source pairs to device memory ONCE,
    as two (N, H, W, 3) arrays cached on the dataset object.

    TPU-native dataset residency: host->device bandwidth is the train-loop
    bottleneck when source images stream per batch (the mosaic path reads
    4B images per batch; through the axon tunnel at ~48 MB/s that is ~21 s
    per 4-step dispatch at bs32 — measured, tools/archive/aug_probe.py). With the
    pool, a batch is one on-device row gather and steady-state upload is
    zero. KAIST-scale sets fit comfortably when sharded (10 GB / 8 chips);
    single-chip use is gated by DYK_DEVICE_CACHE_GB (default 4 GB).

    ``force``: True uploads regardless of budget, False disables, None
    auto-enables when 2*N*H*W*3 bytes fit the budget."""
    if force is False:
        return None
    pool = getattr(dataset, "_device_pool", None)
    if pool is not None:
        return pool
    n = len(dataset)
    h, w = src_hw
    need = 2 * n * h * w * 3
    budget = float(os.environ.get("DYK_DEVICE_CACHE_GB", "4")) * 1e9
    # the budget is shared across ALL pools this process builds (train set +
    # in-train eval set + ...): auto mode declines when the new pool would
    # push the combined residency past it, so an eval pool can never OOM a
    # training run that fit
    if force is None and need + _RESIDENT["bytes"] > budget:
        return None
    # write chunks into preallocated pools with DONATED updates so the
    # peak transient is pool + one 64-row chunk — accumulating every chunk
    # and concatenating would briefly hold ~2x the pool in HBM, defeating
    # the budget gate above
    upd = jax.jit(
        lambda p, c, i0: jax.lax.dynamic_update_slice(p, c, (i0, 0, 0, 0)),
        donate_argnums=0)
    pv = jnp.zeros((n, h, w, 3), jnp.uint8)
    pl = jnp.zeros((n, h, w, 3), jnp.uint8)
    for i0 in range(0, n, 64):
        pairs = [dataset.load_pair(i) for i in range(i0, min(i0 + 64, n))]
        pv = upd(pv, jnp.asarray(np.stack([p[0] for p in pairs])),
                 jnp.int32(i0))
        pl = upd(pl, jnp.asarray(np.stack([p[1] for p in pairs])),
                 jnp.int32(i0))
    pool = (pv, pl)
    jax.block_until_ready(pool)
    print(f"device image pool: {n} pairs resident "
          f"({need / 1e9:.2f} GB HBM); batches gather on device", flush=True)
    dataset._device_pool = pool
    _claim_resident(_RESIDENT, dataset, need)
    return pool


# combined HBM bytes of every device_image_pool built by this process, and
# combined pinned-host bytes of every host_image_pool — each entry released
# when its owning dataset is garbage-collected (the pool arrays live on the
# dataset object), so long-lived processes that build pools for many dataset
# objects (sweeps, repeated Trainer constructions) don't permanently exhaust
# the budget
_RESIDENT = {"bytes": 0}
_HOST_RESIDENT = {"bytes": 0}


def _claim_resident(account: dict, owner, nbytes: int) -> None:
    import weakref

    account["bytes"] += nbytes

    def release():
        account["bytes"] -= nbytes

    weakref.finalize(owner, release)


def select_image_pool(dataset, src_hw, device_cache):
    """Residency-tier selection shared by the train and eval input
    pipelines: ("hbm", (pool_v, pool_l)) when the dataset fits the shared
    DYK_DEVICE_CACHE_GB budget (or device_cache=True forces it), else
    ("host", (pool_v, pool_l, gather)) when it fits DYK_HOST_CACHE_GB and
    the backend supports pinned_host host-offload, else (None, None) —
    per-batch streaming."""
    pool = device_image_pool(dataset, src_hw, device_cache)
    if pool is not None:
        return "hbm", pool
    if device_cache is not False:
        cached = getattr(dataset, "_host_pool", None)
        if cached is not None:
            # this dataset's bytes are ALREADY inside _HOST_RESIDENT; the
            # budget check below would double-count them and demote a
            # pinned dataset to streaming as soon as any other pool (e.g.
            # the in-train eval split) pins after it — observed as a 3.5x
            # epoch-time regression from epoch 1 on a full-KAIST fit
            return "host", cached
        n = len(dataset)
        need = 2 * n * src_hw[0] * src_hw[1] * 3
        hbudget = float(os.environ.get("DYK_HOST_CACHE_GB", "16")) * 1e9
        # like the HBM budget, the pinned-host budget is shared across every
        # pool this process builds (train split + in-train eval split + ...)
        # so a second pool can never blow the pinned allocation mid-training
        if need + _HOST_RESIDENT["bytes"] <= hbudget:
            hpool = host_image_pool(dataset, src_hw)
            if hpool is not None:
                return "host", hpool
    return None, None


def host_image_pool(dataset, src_hw):
    """Middle residency tier: the whole dataset's uint8 pairs pinned in the
    TPU *host's* memory (``pinned_host``), gathered per batch by an
    XLA host-offloaded computation and DMA'd to HBM.

    Sits between the HBM pool (fastest: 1.13 ms / 63 MB batch gather,
    tools/archive/host_pool_probe.py) and per-batch streaming (through the axon
    tunnel: ~48 MB/s): measured 0.37 GB/s (172 ms / 63 MB batch) at ZERO
    HBM cost — full KAIST (15.7 GB) fits where the HBM pool cannot.
    Auto-selected by ``train_batches`` when the dataset exceeds
    DYK_DEVICE_CACHE_GB but fits DYK_HOST_CACHE_GB (default 16); returns
    None when the backend has no addressable pinned_host memory space
    (e.g. the CPU test backend) so callers fall back to streaming.

    Returns (pool_v, pool_l, gather_fn) with
    gather_fn(pool, idx_np) -> (B, H, W, 3) uint8 rows in device memory."""
    cached = getattr(dataset, "_host_pool", None)
    if cached is not None:
        return cached
    n = len(dataset)
    h, w = src_hw
    try:
        from jax.experimental.compute_on import compute_on
        from jax.sharding import SingleDeviceSharding

        dev = jax.devices()[0]
        hostm = SingleDeviceSharding(dev, memory_kind="pinned_host")
        devm = SingleDeviceSharding(dev, memory_kind="device")

        @compute_on("device_host")
        @jax.jit
        def _hgather(p, idx):
            # .at[].get spelling: jnp.take rejects promise_in_bounds, and
            # the default clamp traces device-space constants into the host
            # computation, which XLA rejects
            return p.at[idx].get(mode="promise_in_bounds")

        @compute_on("device_host")
        @jax.jit
        def _hgather2(pv, pl, idx):
            return (pv.at[idx].get(mode="promise_in_bounds"),
                    pl.at[idx].get(mode="promise_in_bounds"))

        def upload(stream):
            # assemble in local host RAM, then ONE device_put straight into
            # pinned_host — any jnp op on pinned_host rows (e.g. a
            # concatenate of chunks) would dispatch a device computation
            # and drag the pool through HBM
            buf = np.empty((n, h, w, 3), np.uint8)
            for i in range(n):
                buf[i] = dataset.load_pair(i)[stream]
            out = jax.device_put(buf, hostm)
            jax.block_until_ready(out)
            return out

        def gather(pool, idx_np):
            """pool: one (N,H,W,3) pinned array, or a (pool_v, pool_l)
            tuple — the pair form gathers both streams in ONE host program
            with ONE index upload."""
            idx = jax.device_put(jnp.asarray(idx_np, jnp.int32), hostm)
            if isinstance(pool, tuple):
                rv, rl = _hgather2(pool[0], pool[1], idx)
                return (jax.device_put(rv, devm), jax.device_put(rl, devm))
            return jax.device_put(_hgather(pool, idx), devm)

        pool_v, pool_l = upload(0), upload(1)
        # smoke one row end-to-end before committing to this tier: some
        # backends enumerate pinned_host yet fail at host-offload compile,
        # and the CPU backend "transfers" to device space but leaves the
        # result tagged <host>, which then poisons every downstream gather
        probe = gather(pool_v, np.zeros((2,), np.int32))
        assert np.asarray(probe).shape == (2, h, w, 3)
        # ... and that downstream jitted programs accept the rows as a
        # device-space operand (the CPU backend reports memory_kind
        # "device" on the transfer result yet still traces it as <host>,
        # which poisons every gather inside the augment program)
        jax.block_until_ready(jax.jit(
            lambda r, i: jnp.take(r, i, axis=0))(
                probe, jnp.zeros((1, 2), jnp.int32)))
    except Exception as e:  # noqa: BLE001 — fall back to streaming
        print(f"host image pool unavailable "
              f"({type(e).__name__}: {str(e)[:200]}); streaming instead",
              flush=True)
        return None
    print(f"host image pool: {n} pairs pinned in host memory "
          f"({2 * n * h * w * 3 / 1e9:.2f} GB, zero HBM); batches gather "
          f"host-side", flush=True)
    dataset._host_pool = (pool_v, pool_l, gather)
    _claim_resident(_HOST_RESIDENT, dataset, 2 * n * h * w * 3)
    return dataset._host_pool


def train_batch_plan(dataset, batch_size: int, sizes, *,
                     max_targets_per_img: int = 16, shuffle: bool = True,
                     drop_last: bool = True, seed_epoch: int = 0,
                     epoch_partners: bool = True, size_every: int = 1):
    """Host-side epoch plan shared by the streaming/pooled/fused paths:
    yields (b0, idx, load, targets, tmask, size) per batch with ONE rng
    sequence (shuffle -> per-batch partner draw -> per-batch size draw), so
    every consumer sees identical sampling.

    ``size_every``: draw the multi-scale bucket size once every N batches
    instead of per batch — the K batches of one multi-step dispatch must
    share a shape (one XLA program per bucket), so the trainer plans with
    size_every=steps_per_dispatch. The reference itself resizes only every
    10 batches (kaist_train_eval_utils.py:58-63), so per-dispatch sampling
    is the same granularity trade it already makes. Default 1 keeps the
    per-batch stream bit-identical to previous rounds."""
    n = len(dataset)
    order = np.arange(n)
    rng = np.random.default_rng(seed_epoch)
    if shuffle:
        rng.shuffle(order)
    stop = n - (n % batch_size) if drop_last else n
    size = sizes[0]
    for k, b0 in enumerate(range(0, stop, batch_size)):
        idx = order[b0:b0 + batch_size]
        load = list(idx)
        if epoch_partners:
            load += list(rng.integers(0, n, 3 * len(idx)))
        t, m = pad_labels([dataset.labels[i] for i in load],
                          max_targets_per_img)
        if k % size_every == 0:
            size = sizes[int(rng.integers(len(sizes)))]
        yield b0, idx, np.asarray(load, np.int32), t, m, size


def train_batches(dataset, batch_size: int, key, *, img_size,
                  hyp: dict, snowflake: bool = False, clahe: bool = False,
                  max_targets_per_img: int = 16, shuffle: bool = True,
                  drop_last: bool = True, seed_epoch: int = 0,
                  epoch_partners: bool = True,
                  device_cache: bool | None = None, size_every: int = 1):
    """Yield jitted-augmented device batches for one epoch.

    ``img_size`` may be an int or a list of bucket sizes; with a list, the
    size is drawn per batch (multi-scale training, reference train.py:46-59 /
    kaist_train_eval_utils.py:58-71) — each bucket is a separately cached
    XLA program, so no re-jit churn.

    ``epoch_partners``: mosaic partner indices are host-sampled UNIFORMLY
    over the whole epoch per image (3 per image, with replacement — exactly
    the reference's dataset-wide draw, kaist_dataset.py:230) and the partner
    pairs ride along in the device batch (4B images in, B canvases out).
    Host cost matches the reference (it decodes 4 pairs per mosaic too) and
    is trivial with ``cache_images``. False: partners drawn on device from
    the batch itself (B images in — cheaper host IO, narrower partner
    distribution)."""
    src_hw = tuple(int(x) for x in dataset.shapes[0][::-1])
    tier, tpool = select_image_pool(dataset, src_hw, device_cache)
    pool = tpool if tier == "hbm" else None
    hpool = tpool if tier == "host" else None
    if tier is None and epoch_partners and not getattr(
            dataset, "_warned_stream_partners", False):
        # reference-exact mosaic partner sampling costs 4B pairs per batch;
        # with no resident pool that is 4x the host decode + upload of the
        # narrow-distribution fallback. Surface the cost once rather than
        # silently eating it on the slowest tier.
        dataset._warned_stream_partners = True
        print("train_batches: streaming tier with epoch-wide mosaic "
              "partners loads 4x batch_size pairs per batch (reference-"
              "matching sampling); enable cache_images / raise "
              "DYK_DEVICE_CACHE_GB / DYK_HOST_CACHE_GB, or pass "
              "epoch_partners=False for 1x IO with batch-local partners",
              flush=True)
    sizes = [img_size] if isinstance(img_size, int) else list(img_size)
    # cache the jitted augment programs across epochs: train_batches is
    # called once per epoch, and a fresh closure per call would miss
    # jax.jit's identity-keyed cache and retrace the heavy augment program
    # every epoch (the eval path caches for the same reason)
    augs = {}
    for s in sizes:
        sig = (src_hw, s, tuple(sorted(hyp.items())), snowflake, clahe,
               epoch_partners, pool is not None,
               os.environ.get("DYK_AUG_DTYPE", ""),
               os.environ.get("DYK_AUG_CHUNK", ""),
               os.environ.get("DYK_AUG_RESAMPLE", ""))
        if sig not in _TRAIN_AUG_CACHE:
            while len(_TRAIN_AUG_CACHE) >= _TRAIN_AUG_CACHE_MAX:
                _TRAIN_AUG_CACHE.pop(next(iter(_TRAIN_AUG_CACHE)))
            _TRAIN_AUG_CACHE[sig] = make_train_augment_fn(
                src_hw, s, hyp, snowflake=snowflake, clahe=clahe,
                epoch_partners=epoch_partners, from_pool=pool is not None)
        augs[s] = _TRAIN_AUG_CACHE[sig]
    # augment randomness rides a stream TAGGED apart from the per-step
    # model rng (trainer folds the same epoch key by step index; without
    # the tag, fold_in(key, b0) collides with fold_in(key, i) whenever a
    # batch offset equals a step index). make_fused_multi_step applies the
    # same tag so fused == unfused holds bit-for-bit.
    akey = jax.random.fold_in(key, AUG_STREAM_TAG)
    for b0, idx, load, t, m, size in train_batch_plan(
            dataset, batch_size, sizes,
            max_targets_per_img=max_targets_per_img, shuffle=shuffle,
            drop_last=drop_last, seed_epoch=seed_epoch,
            epoch_partners=epoch_partners, size_every=size_every):
        sub = jax.random.fold_in(akey, b0)
        if pool is not None:
            batch = augs[size](sub, pool[0], pool[1], jnp.asarray(load),
                               jnp.asarray(t), jnp.asarray(m))
        elif hpool is not None:
            pv, pl, gather = hpool
            rows_v, rows_l = gather((pv, pl), load)
            batch = augs[size](sub, rows_v, rows_l,
                               jnp.asarray(t), jnp.asarray(m))
        else:
            vs, ls = zip(*(dataset.load_pair(i) for i in load))
            batch = augs[size](
                sub, jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ls)),
                jnp.asarray(t), jnp.asarray(m))
        yield batch, idx


def prefetch(iterator, depth: int = 2):
    """Run an iterator in a background thread, keeping ``depth`` items ahead —
    overlaps host JPEG decode with device steps (the reference used
    DataLoader worker *processes*, kaist_dataset runs under num_workers<=8;
    here one decode thread suffices because augmentation is on device)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []
    stop = threading.Event()   # consumer gone — drop the pipeline

    def _put(item) -> bool:
        # bounded put that gives up when the consumer has exited, so an
        # aborted epoch (e.g. the non-finite-loss abort) doesn't leave the
        # worker blocked forever holding `depth` device batches + the
        # dataset alive in long-lived processes
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        # drain so a worker mid-put can observe stop and exit
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


# eval preprocess programs, cached across epochs/evaluations (keyed by the
# static resize geometry — rebuilding them per call would re-jit every epoch)
_EVAL_PRE_CACHE: dict = {}


def eval_batches(dataset, batch_size: int, device_cache: bool | None = None):
    """Yield (v, l, indices, ratio_pad) rect-letterboxed device batches.

    ``device_cache``: same residency tiers as train_batches — with an
    HBM-resident pool the row gather happens INSIDE the jitted preprocess
    program (one dispatch, zero upload; in-train eval otherwise re-uploads
    the whole eval split every epoch at tunnel/PCIe speed), with a
    pinned-host pool rows are host-gathered then DMA'd, else per-batch
    streaming. Pooling requires uniformly-shaped source images (KAIST is);
    mixed-shape datasets stream."""
    n = len(dataset)
    fns = _EVAL_PRE_CACHE
    tier = pool = None
    if n and device_cache is not False:
        shapes = np.asarray(dataset.shapes)
        if (shapes == shapes[0]).all():
            src_hw0 = tuple(int(x) for x in shapes[0][::-1])
            tier, pool = select_image_pool(dataset, src_hw0, device_cache)
    for b0 in range(0, n, batch_size):
        idx_full = np.arange(b0, min(b0 + batch_size, n))
        # mixed-shape datasets: np.stack (and the single letterbox geometry
        # below) require a uniform source shape, so split the batch into
        # consecutive same-shape runs and yield one homogeneous sub-batch
        # per run; uniform datasets (KAIST) take the single-run path
        shp = [tuple(int(x) for x in dataset.shapes[i]) for i in idx_full]
        runs, start = [], 0
        for k in range(1, len(idx_full) + 1):
            if k == len(idx_full) or shp[k] != shp[start]:
                runs.append(idx_full[start:k])
                start = k
        yield from _eval_run_batches(dataset, runs, fns, tier, pool)


def _eval_run_batches(dataset, runs, fns, tier, pool):
    for idx in runs:
        src_hw = tuple(int(x) for x in dataset.shapes[idx[0]][::-1])
        if dataset.rect:
            dst = tuple(dataset.batch_shapes[dataset.batch_index[idx[0]]])
        else:
            dst = (dataset.img_size, dataset.img_size)
        sig = (src_hw, dst, len(idx), dataset.img_size, dataset.clahe,
               tier == "hbm")
        if sig not in fns:
            fns[sig] = make_eval_preprocess_fn(src_hw, dst, dataset.img_size,
                                               clahe=dataset.clahe,
                                               from_pool=tier == "hbm")
        fn, r, pad = fns[sig]
        if tier == "hbm":
            v, l = fn(pool[0], pool[1], jnp.asarray(idx, jnp.int32))
        elif tier == "host":
            pv, pl, gather = pool
            rows_v, rows_l = gather((pv, pl), idx)
            v, l = fn(rows_v, rows_l)
        else:
            vs, ls = zip(*(dataset.load_pair(i) for i in idx))
            v, l = fn(jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ls)))
        yield v, l, idx, (r, pad)
