"""Raw train-step timing probe: batch size x remat segments, one process.

Times ONLY the jitted train step (synthetic device-resident batch, no input
pipeline) with the bench.py dispatch-cancelled protocol, to localize train
throughput anomalies (e.g. the round-3 wallclock regression hunt).

  python tools/train_step_probe.py --configs 8:0 8:6 32:0 32:6
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
from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path  # noqa: E402
from double_yolo_kaist_tpu.train.optim import (  # noqa: E402
    cosine_epoch_schedule, make_optimizer)
from double_yolo_kaist_tpu.train.step import (  # noqa: E402
    create_train_state, make_train_step)
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

HYP = {"lr0": 1e-3, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
       "box": 3.54, "obj": 102.88, "cls": 0.468, "cls_pw": 1.0,
       "obj_pw": 1.0, "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=FLAGSHIP)
    ap.add_argument("--configs", nargs="+", default=["8:0", "32:6"],
                    help="batch:remat_segments pairs")
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--multi-step", type=int, default=0,
                    help="K>0: probe make_multi_step scan-of-K instead")
    ap.add_argument("--mesh", action="store_true",
                    help="run through the Trainer's DP mesh path")
    args = ap.parse_args()

    ir = compile_cfg(cfg_path(args.model))
    sched = cosine_epoch_schedule(HYP["lr0"], HYP["lrf"], 50, 100,
                                  warmup=False)
    tx = make_optimizer(HYP, sched, sgd=True)
    make_state = jax.jit(lambda k: create_train_state(ir, k, tx))
    t = time.perf_counter()
    jax.block_until_ready(make_state(jax.random.PRNGKey(0)).params)
    print(f"# init {time.perf_counter() - t:.1f}s", flush=True)

    s = args.img_size
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    mesh = None
    if args.mesh:
        from double_yolo_kaist_tpu.parallel import mesh as M
        mesh = M.make_mesh()
    K = args.multi_step
    for cfg in args.configs:
        bs, remat = (int(x) for x in cfg.split(":"))
        if K > 0:
            from double_yolo_kaist_tpu.train.step import make_multi_step
            step = make_multi_step(ir, HYP, tx, compute_dtype=jnp.bfloat16,
                                   remat_segments=remat)
        else:
            step = make_train_step(ir, HYP, tx, compute_dtype=jnp.bfloat16,
                                   remat_segments=remat)
        batch = {
            "v": jnp.asarray(rng.random((bs, s, s, 3), np.float32),
                             jnp.float32),
            "l": jnp.asarray(rng.random((bs, s, s, 3), np.float32),
                             jnp.float32),
            "targets": jnp.asarray(
                np.tile(np.array([[0, 0.5, 0.5, 0.1, 0.3]], np.float32),
                        (bs, 16, 1))),
            "tmask": jnp.asarray(np.ones((bs, 16), bool)),
        }
        if K > 0:                          # stacked (K, B, ...) batches
            batch = {k2: jnp.stack([v] * K) for k2, v in batch.items()}
        if mesh is not None:
            from double_yolo_kaist_tpu.parallel import mesh as M
            batch = M.shard_batch(batch, mesh,
                                  batch_dim=1 if K > 0 else 0)
        # the step donates its state arg: thread st through every call
        st = make_state(jax.random.PRNGKey(0))
        if mesh is not None:
            from double_yolo_kaist_tpu.parallel import mesh as M
            from double_yolo_kaist_tpu.train.step import TrainState
            st = TrainState(*[M.replicate(x, mesh) if x is not None else None
                              for x in st])
        t = time.perf_counter()
        st, m = step(st, batch, key)
        float(np.asarray(m["loss"]).ravel()[-1])
        print(f"# [{cfg}] compile+first {time.perf_counter() - t:.1f}s",
              flush=True)
        # timed: 1-step leg vs N-step leg, dispatch-cancelled (bench.py
        # protocol); the loss fetch flushes the enqueued chain
        t0 = time.perf_counter()
        st, m = step(st, batch, key)
        float(np.asarray(m["loss"]).ravel()[-1])
        t1 = time.perf_counter()
        for _ in range(args.iters):
            st, m = step(st, batch, key)
        float(np.asarray(m["loss"]).ravel()[-1])
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / max(args.iters - 1, 1)
        imgs = bs * max(K, 1)
        unit = f"ms/dispatch (K={K})" if K > 0 else "ms/step"
        print(f"[{cfg}] {dt * 1e3:.0f} {unit} = {imgs / dt:.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
