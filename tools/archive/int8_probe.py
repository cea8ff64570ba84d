"""Profile the int8 inference program on the chip and aggregate op time.

Usage: python tools/int8_probe.py [chain|edge|all|seed] [--iters N]

Builds the flagship quantized forward, traces a few dispatches with
jax.profiler, parses the trace protobuf-json, and prints the top XLA ops by
total device time — the measurement tool behind the mode='edge' A/B
(docs/ROADMAP.md round-3 lever 1). Trace times are ~1.5-2x inflated vs the
timed loop (axon tunnel), so compare RATIOS between ops/modes, not absolutes.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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


def build(mode: str, h=512, w=640, bs=16):
    ir = compile_cfg(cfg_path(FLAGSHIP))
    variables = jax.jit(lambda k: graph.init(ir, k))(jax.random.PRNGKey(0))
    folded = jax.jit(lambda v: graph.fold_batchnorm(ir, v))(variables)
    folded = jax.tree.map(lambda a: a.astype(jnp.bfloat16), folded)
    rng = np.random.default_rng(1)
    if mode == "bf16":
        folded = jax.jit(lambda v: graph.prepare_folded(ir, v, h, w))(folded)
        fn = jax.jit(lambda p, a, b: graph.apply_folded(
            ir, p, a, b, compute_dtype=jnp.bfloat16)[0])
        qvars = folded
    else:
        cal = jnp.asarray(rng.random((8, h, w, 3), np.float32), jnp.bfloat16)
        stats = Q.calibrate(ir, folded, [(cal, cal)])
        qvars = jax.jit(lambda f: Q.quantize(ir, f, stats, mode=mode,
                                             hw=(h, w)))(folded)
        fn = jax.jit(lambda p, a, b: Q.apply_quantized(
            ir, p, a, b, compute_dtype=jnp.bfloat16, mode=mode)[0])
    xv = jnp.asarray(rng.random((bs, h, w, 3), np.float32), jnp.bfloat16)
    xl = jnp.asarray(rng.random((bs, h, w, 3), np.float32), jnp.bfloat16)
    return fn, qvars, xv, xl


def aggregate(logdir: str):
    paths = glob.glob(os.path.join(logdir, "plugins/profile/*/*trace.json.gz"))
    assert paths, f"no trace under {logdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        agg[name] += ev.get("dur", 0.0)
        cnt[name] += 1
    return agg, cnt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "edge"
    iters = 3
    fn, qvars, xv, xl = build(mode)
    out = fn(qvars, xv, xl)
    np.asarray(out)                      # compile + warm
    logdir = f"/tmp/int8probe-{mode}"
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        out = fn(qvars, xv, xl)
    np.asarray(out)
    jax.profiler.stop_trace()
    agg, cnt = aggregate(logdir)
    total = sum(agg.values())
    print(f"mode={mode}: {len(agg)} distinct ops, "
          f"total traced {total / 1e3:.1f} ms (ALL events, inflated)")
    # group fusions by op flavor (device ops only: skip host/python events)
    groups = defaultdict(float)
    for name, dur in agg.items():
        if name.startswith(("$", "np", "jit", "Pjit", "Parse")):
            continue
        key = name.split(".")[0]
        groups[key] += dur
    print("--- device ops by kind (ms, /iter) ---")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{v / 1e3 / iters:9.2f}  {k}")
    dev_total = sum(groups.values())
    conv = sum(v for k, v in groups.items() if "conv" in k and "fusion" not in k)
    print(f"device total {dev_total / 1e3 / iters:.2f} ms/iter")
    print("--- top ops (ms, /iter) ---")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur / 1e3 / iters:9.2f}  x{cnt[name] // iters:<4d} {name[:90]}")


if __name__ == "__main__":
    main()
