"""Device-side augment program timing: alone and interleaved with the step.

The round-3 wallclock regression hunt: at bs32/512px the interleaved train
loop runs ~23 s/dispatch where the raw step is ~2 s. This probe times, in
ONE process (paired-measurement protocol, see tools/int8_ab.py):

  1. the augment program alone (per chunk size),
  2. the multi-step train program alone,
  3. strict alternation augment -> step (the trainer's steady state),

so the interleave penalty (allocator/workspace interaction) is isolated
from transfer and host effects.

  python tools/aug_probe.py --batch 32 --img-size 512 --chunks 0 8 2
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
from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn  # noqa: E402
from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path  # noqa: E402
from double_yolo_kaist_tpu.train.optim import (  # noqa: E402
    cosine_epoch_schedule, make_optimizer)
from double_yolo_kaist_tpu.train.step import (  # noqa: E402
    create_train_state, make_multi_step)
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

HYP = {"lr0": 1e-3, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
       "box": 3.54, "obj": 102.88, "cls": 0.468, "cls_pw": 1.0,
       "obj_pw": 1.0, "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0,
       "hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36,
       "degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}


def time_leg(fn, n=3):
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--spd", type=int, default=4)
    ap.add_argument("--remat", type=int, default=6)
    ap.add_argument("--chunks", type=int, nargs="+", default=[0, 8, 2])
    ap.add_argument("--no-step", action="store_true",
                    help="augment-only (skip the train-step legs)")
    args = ap.parse_args()
    bs, s, K = args.batch, args.img_size, args.spd

    rng = np.random.default_rng(0)
    nimg = 4 * bs                       # epoch-partner mode: 4B images in
    v_u8 = jnp.asarray(rng.integers(0, 256, (nimg, 512, 640, 3), np.uint8))
    l_u8 = jnp.asarray(rng.integers(0, 256, (nimg, 512, 640, 3), np.uint8))
    lab = jnp.asarray(
        np.tile(np.array([[0, 0.5, 0.5, 0.1, 0.3]], np.float32),
                (nimg, 16, 1)))
    lm = jnp.asarray(np.ones((nimg, 16), bool))
    jax.block_until_ready((v_u8, l_u8))
    key = jax.random.PRNGKey(0)

    augs = {}
    for c in args.chunks:
        t = time.perf_counter()
        fn = make_train_augment_fn((512, 640), s, HYP, chunk=c)
        out = fn(key, v_u8, l_u8, lab, lm)
        jax.block_until_ready(out)
        print(f"# aug[chunk={c}] compile+first {time.perf_counter()-t:.1f}s",
              flush=True)
        augs[c] = fn
        # block_until_ready is a no-op through the axon tunnel: fetching an
        # output is the only honest sync (it waits for the whole program)
        dt = time_leg(lambda: np.asarray(
            fn(key, v_u8, l_u8, lab, lm)["tmask"]))
        print(f"aug[chunk={c}] alone: {dt*1e3:.0f} ms/batch "
              f"({bs/dt:.1f} canvases/s)", flush=True)

    if args.no_step:
        return

    ir = compile_cfg(cfg_path(FLAGSHIP))
    sched = cosine_epoch_schedule(1e-3, 0.1, 50, 100, warmup=False)
    tx = make_optimizer(HYP, sched, sgd=True)
    t = time.perf_counter()
    st = jax.jit(lambda k: create_train_state(ir, k, tx))(key)
    jax.block_until_ready(st.params)
    step = make_multi_step(ir, HYP, tx, compute_dtype=jnp.bfloat16,
                           remat_segments=args.remat)
    batch0 = augs[args.chunks[0]](key, v_u8, l_u8, lab, lm)
    sbatch = {k2: jnp.stack([v] * K) for k2, v in batch0.items()}
    st, m = step(st, sbatch, key)
    float(np.asarray(m["loss"]).ravel()[-1])
    print(f"# step compile+first {time.perf_counter()-t:.1f}s", flush=True)

    def step_once():
        nonlocal st
        st, m = step(st, sbatch, key)
        float(np.asarray(m["loss"]).ravel()[-1])

    dt = time_leg(step_once)
    print(f"step alone: {dt*1e3:.0f} ms/dispatch "
          f"({bs*K/dt:.1f} img/s)", flush=True)

    for c in args.chunks:
        fn = augs[c]

        def inter():
            nonlocal st, sbatch
            outs = [fn(key, v_u8, l_u8, lab, lm) for _ in range(K)]
            sb = {k2: jnp.stack([o[k2] for o in outs]) for k2 in outs[0]}
            st, m = step(st, sb, key)
            float(np.asarray(m["loss"]).ravel()[-1])
            sbatch = sb

        inter()   # warm any re-layouts
        dt = time_leg(inter)
        print(f"interleaved[chunk={c}]: {dt*1e3:.0f} ms/dispatch "
              f"({bs*K/dt:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
