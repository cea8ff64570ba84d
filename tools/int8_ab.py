"""Paired A/B of int8 PTQ plan modes in ONE process.

Builds the quantized programs for each requested mode once, then runs the
timed fori_loop legs in alternating order (A,B,A,B,...) so both modes see
identical chip/tunnel conditions — cross-process bench runs on this box
vary by ~2-3% session to session, which can swamp a small mode delta.

Usage: python tools/int8_ab.py [--modes edge chain] [--rounds 4]
       [--batch 16] [--height 512] [--width 640] [--iters 20]
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
from double_yolo_kaist_tpu.models import graph  # noqa: E402
from double_yolo_kaist_tpu.models import quantize as Q  # noqa: E402
from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path  # noqa: E402
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()


def build(ir, mode, args, folded, stats):
    """``mode`` may carry a ``+fpstem`` suffix: quantize as the base mode,
    then strip the stem-pair quantization entries so the program runs the
    fused bf16 stem (layers.fused_stem_pair) inside the otherwise-int8
    graph — the A/B for whether the int8 stem's standalone mid-activation
    quantize pass (1.03 GB/step at bs16, HLO round-4 profile) pays for the
    int8 stem convs."""
    base = mode.replace("+qgemm", "").replace("-qgemm", "").split("+")[0]
    qvars = jax.jit(lambda f: Q.quantize(
        ir, f, stats, mode=base, hw=(args.height, args.width)))(folded)
    jax.block_until_ready(qvars)
    if mode.endswith("+fpstem"):
        qvars = {"params": {k: {kk: vv for kk, vv in v.items()
                                if kk not in ("amax_in", "amax_mid",
                                              "stem_q")}
                            for k, v in qvars["params"].items()}}
    mode = base

    def loop(params, xv, xl, n):
        def body(_, acc):
            io = Q.apply_quantized(
                ir, params, xv + (acc * 1e-18).astype(xv.dtype), xl,
                compute_dtype=jnp.bfloat16, mode=mode)[0]
            return jnp.sum(io[..., 4], dtype=jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    return qvars, jax.jit(loop, static_argnums=(3,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=FLAGSHIP)
    ap.add_argument("--modes", nargs="+", default=["edge", "chain"])
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    ir = compile_cfg(cfg_path(args.model))
    t = time.perf_counter()
    variables = jax.jit(lambda k: graph.init(ir, k))(jax.random.PRNGKey(0))
    folded = jax.jit(lambda v: graph.fold_batchnorm(ir, v))(variables)
    folded = jax.tree.map(lambda a: a.astype(jnp.bfloat16), folded)
    jax.block_until_ready(folded)
    rng0 = np.random.default_rng(1)
    cal = jnp.asarray(rng0.random((8, args.height, args.width, 3),
                                  np.float32), jnp.bfloat16)
    stats = Q.calibrate(ir, folded, [(cal, cal)])
    print(f"# init+fold+cal {time.perf_counter() - t:.1f}s", flush=True)

    progs = {}
    for m in args.modes:
        t = time.perf_counter()
        progs[m] = build(ir, m, args, folded, stats)
        print(f"# build[{m}] {time.perf_counter() - t:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    shape = (args.batch, args.height, args.width, 3)
    xv = jnp.asarray(rng.random(shape, dtype=np.float32), jnp.bfloat16)
    xl = jnp.asarray(rng.random(shape, dtype=np.float32), jnp.bfloat16)

    from double_yolo_kaist_tpu.ops import pallas_qgemm as PQ

    qgemm_env = PQ._ENABLED       # DYK_PALLAS_QGEMM default, captured once
    for m in args.modes:                      # compile+warm both loop lengths
        # "+qgemm"/"-qgemm" suffixes flip the Pallas 1x1-GEMM gate for THIS
        # leg's trace (the gate is read at trace time, i.e. during warm).
        # Derived purely from the CURRENT mode string + the captured env
        # default — a '+qgemm' mode must not leave the gate sticky-on for a
        # plain mode warmed after it.
        PQ._ENABLED = "+qgemm" in m or (qgemm_env and "-qgemm" not in m)
        qv, lj = progs[m]
        t = time.perf_counter()
        np.asarray(lj(qv, xv, xl, 1))
        np.asarray(lj(qv, xv, xl, 1 + args.iters))
        print(f"# warm[{m}] {time.perf_counter() - t:.1f}s "
              f"(qgemm={PQ._ENABLED})", flush=True)

    # alternating paired legs; min-over-rounds per (mode, leg)
    base_t = {m: [] for m in args.modes}
    full_t = {m: [] for m in args.modes}
    for r in range(args.rounds):
        for m in args.modes:
            qv, lj = progs[m]
            t0 = time.perf_counter()
            float(np.asarray(lj(qv, xv, xl, 1)))
            base_t[m].append(time.perf_counter() - t0)
            t1 = time.perf_counter()
            float(np.asarray(lj(qv, xv, xl, 1 + args.iters)))
            full_t[m].append(time.perf_counter() - t1)
        line = " ".join(
            f"{m}={args.batch * args.iters / (full_t[m][-1] - base_t[m][-1]):.1f}"
            for m in args.modes)
        print(f"# round {r}: {line} fps", flush=True)

    for m in args.modes:
        dt = min(full_t[m]) - min(base_t[m])
        print(f"{m}: {args.batch * args.iters / dt:.1f} fps "
              f"(dt {dt * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
