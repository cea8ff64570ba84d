"""Benchmark: dual-stream 640x512 frames/sec/chip on the flagship model.

Methodology mirrors the reference's FPS measurement (evaluate.py:70-74,
122-123: forward + head decode, no NMS, wall clock) but batched — the
reference reports bs=1 GPU latency; the production metric here is per-chip
throughput (BASELINE.md north star: >= 2000 fps/chip on v5e).

Pipeline under test: BN-folded NHWC forward + grid decode on
Double-YOLOv4-Fshare-Global-CSE3 (reference README.md:132, 29.04 FPS on a
Quadro RTX 6000). By default BOTH precision paths run — bf16 and int8 PTQ
(chain plan) — and the GRADED number is the int8 path: its accuracy is
gated by tests (synthetic-overfit AP through apply_quantized within
tolerance of fp — tools/overfit_check.py --int8 / tests/test_quantize.py —
and int8-vs-bf16 detection parity on the bundled KAIST pairs,
tests/test_e2e_detect_parity.py), so the throughput claim carries an AP
claim. Prints ONE JSON line; the bf16 number rides along as an extra key.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph
from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path, reference_fps
from double_yolo_kaist_tpu.utils.general import enable_compile_cache

enable_compile_cache()


def measure_fps(ir, args, int8: bool):
    """BN-fold (+quantize), jit the N-forward loop, time it on device.
    Returns (fps, spread) where fps is the graded min-time number and
    spread carries the per-repeat min/mean/max fps."""
    t = time.perf_counter()
    # init + BN-fold as single jitted programs: the axon tunnel dispatches
    # op-by-op with high latency, and params must travel as *arguments* (a
    # closure would embed 100M+ fp32 constants into the serialized HLO)
    variables = jax.jit(lambda k: graph.init(ir, k))(jax.random.PRNGKey(0))
    folded = jax.jit(lambda v: graph.fold_batchnorm(ir, v))(variables)
    folded = jax.tree.map(lambda a: a.astype(jnp.bfloat16), folded)
    if not int8:
        # hoist the stem/s2d weight transforms out of the per-call program
        folded = jax.jit(lambda v: graph.prepare_folded(
            ir, v, args.height, args.width))(folded)
    jax.block_until_ready(folded)
    print(f"# init+fold {time.perf_counter() - t:.1f}s",
          file=sys.stderr, flush=True)

    if int8:
        import os

        from double_yolo_kaist_tpu.models import quantize as Q

        # the quantize() output is fully deterministic here (PRNGKey(0)
        # init, seeded calibration batch), and its jit compile (~13 min
        # fresh through the tunnel) is NOT covered by the persistent XLA
        # cache — so cache the finished artifact itself across runs
        cdir = os.path.join(os.path.expanduser("~"), ".cache",
                            "dyk_tpu_jax")
        # key the artifact by the FULL PLAN, so a planner change (e.g. the
        # thin-input stem exclusion) invalidates stale cached variables;
        # edge plans depend on hw (s2d-region veto), so hash the resolved
        # edge plan, not the hw-free summary
        import hashlib
        if args.int8_mode == "edge":
            tset, int8_out, folded_in = Q.plan_edges(
                ir, (args.height, args.width))
            sig = (sorted(tset),
                   sorted(i for i, v in int8_out.items() if v),
                   sorted(folded_in))
        else:
            targets, emits = Q.plan_quantization(ir, args.int8_mode)
            sig = (sorted(targets), sorted(emits))
        # the implementation version rides in the key too: a numeric change
        # in quantize.py that keeps the plan identical must not silently
        # benchmark stale cached variables
        sig = (Q.IMPL_VERSION,) + tuple(sig)
        qplan = hashlib.md5(repr(sig).encode()).hexdigest()[:10]
        qpath = os.path.join(
            cdir, f"bench_qvars_{args.model}_{args.int8_mode}_{qplan}_"
                  f"{args.height}x{args.width}.npz")
        if os.path.exists(qpath):
            qv, _m, _hw = Q.load_quantized(qpath)
            folded = jax.tree.map(jnp.asarray, qv)
            print(f"# quantized vars loaded from {qpath}",
                  file=sys.stderr, flush=True)
        else:
            rng0 = np.random.default_rng(1)
            cal = jnp.asarray(rng0.random((8, args.height, args.width, 3),
                                          np.float32), jnp.bfloat16)
            stats = Q.calibrate(ir, folded, [(cal, cal)])
            folded = jax.jit(lambda f: Q.quantize(
                ir, f, stats, mode=args.int8_mode,
                hw=(args.height, args.width)))(folded)
            try:
                os.makedirs(cdir, exist_ok=True)
                Q.save_quantized(qpath, folded, mode=args.int8_mode,
                                 hw=(args.height, args.width))
            except OSError:
                pass
        apply_fn = lambda p, a, b: Q.apply_quantized(  # noqa: E731
            ir, p, a, b, compute_dtype=jnp.bfloat16,
            mode=args.int8_mode)[0]
    else:
        apply_fn = lambda p, a, b: graph.apply_folded(  # noqa: E731
            ir, p, a, b, compute_dtype=jnp.bfloat16)[0]

    # N forwards inside one jitted fori_loop, returning a scalar: through the
    # axon tunnel block_until_ready is a no-op and per-call dispatch costs
    # ~100ms, so honest timing = one device-side loop + one scalar fetch.
    # The carry feeds back into the input so XLA cannot hoist the body.
    def loop(params, xv, xl, n):
        def body(_, acc):
            # * 1e-18 (not * 0.0): XLA algebraically simplifies x + y*0 to x,
            # which would unchain the carry and let it hoist the body
            io = apply_fn(params, xv + (acc * 1e-18).astype(xv.dtype), xl)
            return jnp.sum(io[..., 4], dtype=jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    loop_j = jax.jit(loop, static_argnums=(3,))

    rng = np.random.default_rng(0)
    shape = (args.batch, args.height, args.width, 3)
    xv = jnp.asarray(rng.random(shape, dtype=np.float32), jnp.bfloat16)
    xl = jnp.asarray(rng.random(shape, dtype=np.float32), jnp.bfloat16)

    t = time.perf_counter()
    # compile + warm up both loop lengths (distinct static n -> two programs)
    np.asarray(loop_j(folded, xv, xl, 1))
    np.asarray(loop_j(folded, xv, xl, 1 + args.iters))
    print(f"# compile+warmup {time.perf_counter() - t:.1f}s",
          file=sys.stderr, flush=True)

    # subtract the 1-iteration run to cancel dispatch/fetch overhead; take
    # the min over repeats of each leg independently — host-side stalls
    # (CPU contention, GC) only ever ADD wall time, and a stall inside the
    # 1-iter baseline would otherwise INFLATE the reported fps
    base_t, full_t = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        base = float(np.asarray(loop_j(folded, xv, xl, 1)))
        base_t.append(time.perf_counter() - t0)
        t1 = time.perf_counter()
        full = float(np.asarray(loop_j(folded, xv, xl, 1 + args.iters)))
        full_t.append(time.perf_counter() - t1)
        assert np.isfinite(full) and np.isfinite(base)
    # graded number = min-over-repeats (stalls only add wall time), but
    # report the per-repeat spread too so round-over-round drift is
    # attributable to noise vs regression; each repeat is paired with the
    # min baseline leg (a stalled baseline would inflate that repeat's fps)
    per_repeat = sorted(args.batch * args.iters / (ft - min(base_t))
                        for ft in full_t)
    dt = min(full_t) - min(base_t)
    fps = args.batch * args.iters / dt
    spread = {"min": round(per_repeat[0], 2),
              "mean": round(float(np.mean(per_repeat)), 2),
              "max": round(per_repeat[-1], 2)}
    return fps, spread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=FLAGSHIP)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--int8", action="store_true",
                    help="int8 PTQ path only (skip the bf16 leg)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 path only (skip the int8 leg)")
    ap.add_argument("--int8-mode", default="chain",
                    choices=("seed", "chain", "all", "edge", "spine", "spineall"),
                    help="PTQ plan: 3x3-only / int8 chains / all convs")
    ap.add_argument("--check-ap", action="store_true",
                    help="synthetic-data AP sanity instead of fps: overfit "
                         "the tiny model and report final AP@0.5 — fp AND "
                         "through apply_quantized in all 3 modes (validates "
                         "pipeline->loss->grad->decode->NMS->metrics plus "
                         "the int8 accuracy gate; the parity half of the "
                         "BASELINE north star)")
    ap.add_argument("--check-ap-epochs", type=int, default=60)
    args = ap.parse_args()

    if args.check_ap:
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "overfit_check", os.path.join(os.path.dirname(__file__),
                                          "tools", "overfit_check.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        final_ap, int8_aps = mod.main(args.check_ap_epochs, int8=True)
        worst_q = min(int8_aps.values())
        print(json.dumps({
            "metric": "synthetic overfit AP@0.5 (tiny dual-stream model; "
                      f"int8 APs {'/'.join(f'{v:.2f}' for v in int8_aps.values())})",
            "value": round(final_ap, 4),
            "unit": "AP",
            "vs_baseline": round(final_ap / 0.5, 2),   # gate: must exceed 0.5
            "int8_worst_ap": round(worst_q, 4),
        }))
        return

    ir = compile_cfg(cfg_path(args.model))
    # --int8 / --bf16 each select a single leg; both together (or neither)
    # run both legs, matching the no-flag default
    both = args.int8 == args.bf16
    run_bf16 = both or args.bf16
    run_int8 = both or args.int8
    fps_bf16 = sp_bf16 = fps_int8 = sp_int8 = None
    if run_bf16:
        fps_bf16, sp_bf16 = measure_fps(ir, args, int8=False)
    if run_int8:
        fps_int8, sp_int8 = measure_fps(ir, args, int8=True)
    if fps_bf16 is not None:
        print(f"# bf16 {fps_bf16:.1f} fps (repeats {sp_bf16['min']}/"
              f"{sp_bf16['mean']}/{sp_bf16['max']})",
              file=sys.stderr, flush=True)
    if fps_int8 is not None:
        print(f"# int8[{args.int8_mode}] {fps_int8:.1f} fps (repeats "
              f"{sp_int8['min']}/{sp_int8['mean']}/{sp_int8['max']})",
              file=sys.stderr, flush=True)

    ref = reference_fps(args.model)
    if fps_int8 is not None:
        label = (f"int8 PTQ {args.int8_mode} (AP-gated: overfit_check "
                 "--int8 + e2e int8 detect parity)")
        out = {
            "metric": f"dual-stream {args.width}x{args.height} "
                      f"frames/sec/chip ({args.model}, {label})",
            "value": round(fps_int8, 2),
            "unit": "fps",
            "vs_baseline": round(fps_int8 / ref, 2),
            "repeats": sp_int8,
        }
        if fps_bf16 is not None:
            out["bf16_fps"] = round(fps_bf16, 2)
            out["bf16_repeats"] = sp_bf16
    else:
        out = {
            "metric": f"dual-stream {args.width}x{args.height} "
                      f"frames/sec/chip ({args.model}, bf16)",
            "value": round(fps_bf16, 2),
            "unit": "fps",
            "vs_baseline": round(fps_bf16 / ref, 2),
            "repeats": sp_bf16,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
