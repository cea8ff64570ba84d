"""Zoo-wide throughput sweep: measure every published model on the chip.

Reuses bench.py's hardened measurement protocol (device-side fori_loop,
carry chained into the input, 1-iter dispatch-cancellation leg, min-over-
repeats) per zoo model so the README/ROADMAP table can carry a measured
number for all 16 models (reference README.md:110-141 reports FPS for each;
BASELINE.md mirrors it).

Results stream to --out as JSON lines (one object per model) so a partial
run still yields data; a markdown table prints at the end.

Usage:
    python tools/zoo_bench.py                       # all 16, bf16
    python tools/zoo_bench.py --int8                # add the int8 chain leg
    python tools/zoo_bench.py --models A B          # subset
"""

import argparse
import importlib.util
import json
import os
import sys
import time
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

spec = importlib.util.spec_from_file_location(
    "dyk_bench", os.path.join(_ROOT, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from double_yolo_kaist_tpu.config.ir import compile_cfg  # noqa: E402
from double_yolo_kaist_tpu.models.zoo import (  # noqa: E402
    MODELS, cfg_path, reference_fps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=list(MODELS),
                    help="subset of zoo model names (default: all 16)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--int8", action="store_true",
                    help="also measure the int8 PTQ chain leg per model")
    ap.add_argument("--int8-mode", default="chain",
                    choices=("seed", "chain", "all", "edge", "spine", "spineall"))
    ap.add_argument("--out", default="/tmp/zoo_bench.jsonl")
    args = ap.parse_args()

    rows = []
    with open(args.out, "a") as f:
        for name in args.models:
            row = {"model": name, "batch": args.batch,
                   "hw": [args.height, args.width]}
            t0 = time.perf_counter()
            try:
                ir = compile_cfg(cfg_path(name))
                fps, spread = bench.measure_fps(ir, argparse.Namespace(
                    model=name, batch=args.batch, height=args.height,
                    width=args.width, iters=args.iters,
                    int8_mode=args.int8_mode), int8=False)
                row["bf16_fps"] = round(fps, 1)
                row["bf16_repeats"] = spread
                if args.int8:
                    fps, spread = bench.measure_fps(ir, argparse.Namespace(
                        model=name, batch=args.batch, height=args.height,
                        width=args.width, iters=args.iters,
                        int8_mode=args.int8_mode), int8=True)
                    row["int8_fps"] = round(fps, 1)
                    row["int8_repeats"] = spread
                ref = reference_fps(name)
                row["ref_fps"] = ref
                row["vs_ref"] = round(
                    row.get("int8_fps", row["bf16_fps"]) / ref, 1)
            except Exception:
                row["error"] = traceback.format_exc(limit=3)
            row["wall_s"] = round(time.perf_counter() - t0, 1)
            print(json.dumps(row), file=f, flush=True)
            rows.append(row)
            msg = row.get("error", "").splitlines()[-1:] or [
                f"bf16 {row.get('bf16_fps')}"
                + (f" int8 {row['int8_fps']}" if "int8_fps" in row else "")
                + f" ({row['wall_s']}s)"]
            print(f"# {name}: {msg[0]}", file=sys.stderr, flush=True)

    print("\n| Model | bf16 fps | "
          + ("int8 fps | " if args.int8 else "")
          + "ref GPU fps | speedup |")
    print("|---|---|" + ("---|" if args.int8 else "") + "---|---|")
    for r in rows:
        # on error keep any leg that DID measure (bf16 may have succeeded
        # before the int8 leg failed) and pad every column
        cells = [r["model"], str(r.get("bf16_fps", "ERROR"))]
        if args.int8:
            cells.append(str(r.get("int8_fps",
                                   "ERROR" if "error" in r else "")))
        cells += [str(r.get("ref_fps", "")),
                  f"{r['vs_ref']}x" if "vs_ref" in r else ""]
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
