"""Fused augment+train dispatch decomposition probe (VERDICT r3 item 4).

Round-3 measured the fused end-to-end path at 57.6 img/s vs 86.7 img/s
step-only (bs8 spd16 remat0) — augment is ~27% of device time. This probe
localizes WHERE that time goes and A/Bs the candidate cuts, all paired in
one process (tools/int8_ab.py protocol):

  1. step-only multi-step scan (pre-augmented synthetic batches),
  2. the fused augment+train program — pixel dtype f32 (shipped default)
     vs bfloat16 (DYK_AUG_DTYPE=bf16),
  3. the augment program ALONE (per pixel dtype), and its stages
     (gather+resize / mosaic paste / affine / hsv+flip) as separate
     jitted programs so the hot stage is named, not guessed,
  4. optionally the scan-carried double-buffer variant (augment k+1
     hoisted data-independent of step k) to test whether XLA/TPU can
     overlap them at all (single-core TPUs execute fusions serially, so
     the expected honest answer is "no" — this measures it).

  python tools/fused_train_probe.py --batch 8 --spd 16 --img-size 512
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.config.ir import compile_cfg  # noqa: E402
from double_yolo_kaist_tpu.data import augment as A  # noqa: E402
from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn  # noqa: E402
from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path  # noqa: E402
from double_yolo_kaist_tpu.train.optim import (  # noqa: E402
    cosine_epoch_schedule, make_optimizer)
from double_yolo_kaist_tpu.train.step import (  # noqa: E402
    create_train_state, make_fused_multi_step, make_multi_step)
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

HYP = {"lr0": 1e-3, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
       "box": 3.54, "obj": 102.88, "cls": 0.468, "cls_pw": 1.0,
       "obj_pw": 1.0, "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0,
       "hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36,
       "degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}

SRC_HW = (512, 640)


def sync(x):
    """Through the axon tunnel block_until_ready is a no-op — fetch a
    scalar (DEPLOY.md timing trap #2). Scalar-index rather than ravel:
    ravel of a tiled array compiles a linearizing copy (on the u8 pool
    that copy materializes the padded C-minor layout — 21 GB, OOM)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf))


def timeit(fn, n, warmup=1):
    for _ in range(warmup):
        sync(fn())
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t)
    return min(ts), float(np.mean(ts)), max(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=FLAGSHIP)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--spd", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--pool", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtypes", nargs="+", default=["f32", "bf16"])
    ap.add_argument("--resamples", nargs="+", default=["gather", "matmul"],
                    help="augment resample modes to A/B (gather | matmul)")
    ap.add_argument("--stages", action="store_true",
                    help="time the augment stages as separate programs")
    ap.add_argument("--double-buffer", action="store_true",
                    help="A/B the scan-carried double-buffer fused variant")
    ap.add_argument("--legs", nargs="+", default=None,
                    help="subset of legs to run: step fused aug")
    args = ap.parse_args()
    legs = set(args.legs or ["step", "fused", "aug"])

    B, K, s = args.batch, args.spd, args.img_size
    T = 16
    ir = compile_cfg(cfg_path(args.model))
    sched = cosine_epoch_schedule(HYP["lr0"], HYP["lrf"], 50, 100,
                                  warmup=False)
    tx = make_optimizer(HYP, sched, sgd=True)
    state = jax.jit(lambda k: create_train_state(ir, k, tx))(
        jax.random.PRNGKey(0))
    sync(state.params)

    rng = np.random.default_rng(0)
    N = args.pool
    # generate the pool ON DEVICE: a host upload of (N,H,W,3) u8 gets the
    # default C-minor T(8,128) layout — 3 lanes padded to 128, a 42.7x HBM
    # blowup that OOMs outright (21.5 GB for a 0.98 GB pool; measured).
    # The shipped device_image_pool avoids it the same way: the array is
    # produced by a jitted program whose layout XLA assigns sanely.
    gen = jax.jit(lambda k, sh=(N,) + SRC_HW + (3,): jax.random.randint(
        k, sh, 0, 256, jnp.int32).astype(jnp.uint8))
    pool_v = gen(jax.random.PRNGKey(1))
    pool_l = gen(jax.random.PRNGKey(2))
    sync(pool_l)
    print(f"# pool {2 * N * SRC_HW[0] * SRC_HW[1] * 3 / 1e9:.2f} GB resident",
          flush=True)

    xs = {"b0": jnp.asarray(np.arange(K, dtype=np.int32) * B),
          "load": jnp.asarray(rng.integers(0, N, (K, 4 * B), np.int32)),
          "targets": jnp.asarray(
              np.concatenate([
                  np.full((K, B, T, 1), 0.0, np.float32),
                  rng.uniform(0.3, 0.7, (K, B, T, 2)).astype(np.float32),
                  rng.uniform(0.05, 0.3, (K, B, T, 2)).astype(np.float32),
              ], -1)),
          "tmask": jnp.asarray(np.ones((K, B, T), bool))}
    akey = jax.random.PRNGKey(7)
    key = jax.random.PRNGKey(11)
    imgs_per_dispatch = K * B
    results = {}

    def report(name, tri):
        lo, mean, hi = tri
        ips = imgs_per_dispatch / lo
        results[name] = ips
        print(f"{name:34s} {lo * 1e3:9.1f} ms/dispatch "
              f"({lo * 1e3 / K:6.1f} ms/step)  {ips:6.1f} img/s "
              f"[mean {mean * 1e3:.1f}, max {hi * 1e3:.1f}]", flush=True)

    # ---- leg 1: step-only multi-step scan on pre-augmented batches
    if "step" in legs:
        multi = make_multi_step(ir, HYP, tx, remat_segments=0)
        genf = jax.jit(lambda k, sh=(K, B, s, s, 3): jax.random.uniform(
            k, sh, jnp.float32))
        batches = {
            "v": genf(jax.random.PRNGKey(3)),
            "l": genf(jax.random.PRNGKey(4)),
            "targets": jnp.tile(xs["targets"][:, :, :, :], (1, 1, 4, 1)),
            "tmask": jnp.tile(xs["tmask"], (1, 1, 4))}
        st = [state]

        def run_step():
            st[0], m = multi(st[0], batches, key)
            return m["loss"]
        report("step-only scan", timeit(run_step, args.iters))
        del st
        state = jax.jit(lambda k: create_train_state(ir, k, tx))(
            jax.random.PRNGKey(0))
        sync(state.params)

    # ---- leg 2: fused augment+train per (pixel dtype x resample)
    for dt in args.dtypes if "fused" in legs else []:
      for rs in args.resamples:
        pd = jnp.bfloat16 if dt == "bf16" else jnp.float32
        aug = make_train_augment_fn(SRC_HW, s, HYP, from_pool=True,
                                    jit=False, pix_dtype=pd, resample=rs)
        fused = make_fused_multi_step(ir, HYP, tx, aug, remat_segments=0)
        st = [state]

        def run_fused():
            st[0], m = fused(st[0], pool_v, pool_l, xs, akey, key)
            return m["loss"]
        report(f"fused aug+train pix={dt} {rs}",
               timeit(run_fused, args.iters))
        del st, fused
        state = jax.jit(lambda k: create_train_state(ir, k, tx))(
            jax.random.PRNGKey(0))
        sync(state.params)

    # ---- leg 3: augment alone (once per dispatch = K batch programs)
    for dt in args.dtypes if "aug" in legs else []:
      for rs in args.resamples:
        pd = jnp.bfloat16 if dt == "bf16" else jnp.float32
        aug = make_train_augment_fn(SRC_HW, s, HYP, from_pool=True,
                                    jit=False, pix_dtype=pd, resample=rs)

        @jax.jit
        def aug_k(pool_v, pool_l, xs, akey):
            def one(_, x):
                b = aug(jax.random.fold_in(akey, x["b0"]), pool_v, pool_l,
                        x["load"], x["targets"], x["tmask"])
                return None, (b["v"].sum() + b["l"].sum())
            _, sums = jax.lax.scan(one, None, xs)
            return sums.sum()

        report(f"augment-only x{K} pix={dt} {rs}",
               timeit(lambda: aug_k(pool_v, pool_l, xs, akey), args.iters))

    # ---- leg 4: augment stages, each scanned xK in ONE dispatch (the ~100
    # ms tunnel dispatch latency swamps a single small program — a naive
    # per-stage timing is meaningless; scanning K copies amortizes it to
    # the same noise floor as the fused legs)
    if args.stages:
        h1 = int(SRC_HW[0] * s / max(SRC_HW))
        w1 = int(SRC_HW[1] * s / max(SRC_HW))
        for dt in args.dtypes:
            pd = jnp.bfloat16 if dt == "bf16" else jnp.float32

            def scanK(body, xs_iter, *consts):
                """Scan body over PER-ITERATION inputs (a (K, ...) pytree):
                loop-invariant bodies get hoisted out of the scan by XLA
                (LICM) and time as a single execution — every stage input
                that can vary per step must."""
                @jax.jit
                def run(xk, *cs):
                    def one(c, x):
                        return c, body(x, *cs)
                    _, out = jax.lax.scan(one, 0, xk)
                    return out
                o = run(xs_iter, *consts)
                sync(o)
                lo, _, _ = timeit(lambda: run(xs_iter, *consts), args.iters)
                return lo / K * 1e3

            def st_resize(idx, pv, pl):
                v = A.resize_bilinear(jnp.take(pv, idx, 0), h1, w1, dtype=pd)
                l = A.resize_bilinear(jnp.take(pl, idx, 0), h1, w1, dtype=pd)
                return v.sum() + l.sum()

            t_rs = scanK(st_resize, xs["load"], pool_v, pool_l)

            mk = jax.jit(lambda pv, pl, idx: (
                A.resize_bilinear(jnp.take(pv, idx, 0), h1, w1, dtype=pd),
                A.resize_bilinear(jnp.take(pl, idx, 0), h1, w1, dtype=pd)))
            v4t, l4t = mk(pool_v, pool_l, xs["load"][0])
            sync(v4t)
            gidx = jnp.clip(jnp.arange(B)[:, None] + jnp.arange(4)[None, :],
                            0, 4 * B - 1)
            centersK = jnp.asarray(
                rng.integers(int(s * 0.5), int(s * 1.5) + 1, (K, B, 2)),
                jnp.int32)
            lab = jnp.zeros((4 * B, T, 5), jnp.float32)
            lm = jnp.ones((4 * B, T), bool)

            def st_mosaic(centers, v4t, l4t):
                v4, l4, _, _ = A.mosaic_place(v4t[gidx], l4t[gidx],
                                              lab[gidx], lm[gidx],
                                              centers, s)
                return v4.sum() + l4.sum()

            t_mo = scanK(st_mosaic, centersK, v4t, l4t)

            mk2 = jax.jit(lambda v, l: A.mosaic_place(
                v[gidx], l[gidx], lab[gidx], lm[gidx], centersK[0], s))
            v4, l4, lab4, m4 = mk2(v4t, l4t)
            sync(v4)
            MsK = jax.vmap(lambda k: A._affine_matrices(
                k, B, (2 * s, 2 * s), 0.0, 0.1, 0.5, 0.0, -s // 2))(
                    jax.random.split(jax.random.PRNGKey(3), K))

            def st_affine(Ms, v4, l4):
                va, la, _, _ = A.random_affine_batch(
                    None, v4, l4, lab4, m4, border=-s // 2, Ms=Ms,
                    separable=True)
                return va.sum() + la.sum()

            t_af = scanK(st_affine, MsK, v4, l4)

            mk3 = jax.jit(lambda v, l: A.random_affine_batch(
                None, v, l, lab4, m4, border=-s // 2,
                Ms=jax.tree.map(lambda a: a[0], MsK), separable=True)[:2])
            va, la = mk3(v4, l4)
            sync(va)
            gainsK = jnp.asarray(
                rng.uniform(0.9, 1.1, (K, B, 3)).astype(np.float32))
            doK = jnp.asarray(rng.integers(0, 2, (K, B)).astype(bool))

            def st_photo(gd, va, la):
                gains, do = gd
                v, l = A.hsv_jitter(None, va, la, 0, 0, 0, gains=gains)
                t = A.xyxy_to_norm_xywh(lab4, m4, (s, s))
                v, l, t = A.flip_lr(None, v, l, t, do=do)
                return (v / 255.0).sum() + (l / 255.0).sum() + t.sum()

            t_ph = scanK(st_photo, (gainsK, doK), va, la)
            tot = t_rs + t_mo + t_af + t_ph
            print(f"stages pix={dt} (scan x{K}): gather+resize {t_rs:6.2f} "
                  f"ms  mosaic {t_mo:6.2f}  affine {t_af:6.2f}  hsv+flip "
                  f"{t_ph:6.2f}  sum {tot:6.2f}   (per {B}-img batch)",
                  flush=True)

    # ---- leg 5: double-buffer fused variant
    if args.double_buffer:
        for dt in args.dtypes:
            pd = jnp.bfloat16 if dt == "bf16" else jnp.float32
            aug = make_train_augment_fn(SRC_HW, s, HYP, from_pool=True,
                                        jit=False, pix_dtype=pd)
            fused = make_fused_multi_step(ir, HYP, tx, aug,
                                          remat_segments=0,
                                          double_buffer=True)
            st = [state]

            def run_db():
                st[0], m = fused(st[0], pool_v, pool_l, xs, akey, key)
                return m["loss"]
            report(f"fused DOUBLE-BUF pix={dt}", timeit(run_db, args.iters))
            del st, fused
            state = jax.jit(lambda k: create_train_state(ir, k, tx))(
                jax.random.PRNGKey(0))
            sync(state.params)

    if "step-only scan" in results:
        base = results["step-only scan"]
        for k, v in results.items():
            if k != "step-only scan":
                print(f"# {k}: {100 * v / base:.0f}% of step-only", flush=True)


if __name__ == "__main__":
    main()
