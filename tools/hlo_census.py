"""HLO fusion/layout census: where do a compiled program's HBM bytes go?

The method that cracked the round-4 int8 gap (docs/ROADMAP.md "HLO-level
attack"), packaged as a tool: compile a program for the attached TPU, parse
the optimized HLO, and report every instruction's output bytes — computed
from the PHYSICAL layout (tiling pads the two minor-most dims, e.g. a
C-minor {3,2,1,0:T(8,128)} image tensor pads C 3->128, a 42.7x blowup) —
grouped by fusion kind and sorted, so bandwidth sinks and layout accidents
are named, not guessed.

  python tools/hlo_census.py --program aug [--pix-dtype bf16] [--top 25]
  python tools/hlo_census.py --program fused --spd 4
  python tools/hlo_census.py --program step
"""

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
            "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8,
            "u64": 8}

SHAPE_RE = re.compile(
    r"(?P<dt>[a-z]+\d*)\[(?P<dims>[\d,]*)\]"
    r"(?:\{(?P<minor>[\d,]+)(?::[^}]*?T\((?P<tile>[\d,]+)\)"
    r"(?:\((?P<tile2>[\d,]+)\))?[^}]*)?\})?")


def shape_bytes(m) -> int:
    """Physical bytes of one parsed shape, honoring layout tiling pads."""
    dt = m.group("dt")
    if dt not in DT_BYTES:
        return 0
    dims = [int(x) for x in m.group("dims").split(",") if x] or [1]
    minor = m.group("minor")
    tile = m.group("tile")
    if not minor or not tile:
        return int(np.prod(dims)) * DT_BYTES[dt]
    order = [int(x) for x in minor.split(",")]          # minor-to-major
    phys = [dims[i] for i in reversed(order)]           # major-to-minor
    t = [int(x) for x in tile.split(",")]
    # tile pads the len(t) minor-most physical dims
    for k, tk in enumerate(reversed(t)):
        i = len(phys) - 1 - k
        if i >= 0:
            phys[i] = -(-phys[i] // tk) * tk
    n = int(np.prod(phys))
    t2 = m.group("tile2")
    if t2:  # packing tile, e.g. (4,1) for u8: groups minor elems, pads
        pass  # does not change element count
    return n * DT_BYTES[dt]


def shape_bytes_logical(m) -> int:
    """Logical (unpadded) bytes of one parsed shape."""
    dt = m.group("dt")
    if dt not in DT_BYTES:
        return 0
    dims = [int(x) for x in m.group("dims").split(",") if x] or [1]
    return int(np.prod(dims)) * DT_BYTES[dt]


def census(hlo: str, top: int, hbm_only: bool = True):
    """``hbm_only``: count only instructions in NON-fusion computations
    (entry / while bodies / conditionals) — instructions inside a fusion's
    body computation execute in registers/VMEM and never touch HBM, so
    counting them (the tool's original behavior, fine for the BN-folded
    inference program whose fusions are shallow) swamps a training-step
    census with BN/jvp arithmetic that XLA fused away."""
    fused_bodies = set(re.findall(r"calls=([%\w.-]+)", hlo))
    by_kind = defaultdict(lambda: [0, 0])
    rows = []
    in_fused = False
    for line in hlo.splitlines():
        ls = line.strip()
        hm = re.match(r"(ENTRY )?([%\w.-]+) \(.*\) -> .+ \{$", ls)
        if hm:
            in_fused = hm.group(2) in fused_bodies and not hm.group(1)
            continue
        if hbm_only and in_fused:
            continue
        mo = re.match(r"(?:ROOT )?[%\w.-]+ = (.+?) (\w+)\(", ls)
        if not mo:
            continue
        shapes_str, op = mo.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        total = sum(shape_bytes(m)
                    for m in SHAPE_RE.finditer(shapes_str))
        if total == 0:
            continue
        logical = sum(shape_bytes_logical(m)
                      for m in SHAPE_RE.finditer(shapes_str))
        kind = op
        if op == "fusion":
            km = re.search(r"kind=(\w+)", ls)
            cm = re.search(r'calls=([%\w.-]+)', ls)
            kind = f"fusion:{cm.group(1).split('.')[0] if cm else '?'}"
        by_kind[kind][0] += total
        by_kind[kind][1] += 1
        rows.append((total, kind, shapes_str[:110],
                     ls[ls.find(op):][:170], logical))

    print(f"{'bytes out':>14}  {'n':>4}  kind")
    for kind, (b, n) in sorted(by_kind.items(), key=lambda kv: -kv[1][0]):
        print(f"{b / 1e6:>12.1f}MB  {n:>4}  {kind}")
    phys = sum(r[0] for r in rows)
    logi = sum(r[4] for r in rows)
    padded = sum(r[0] for r in rows if r[0] > 1.5 * max(r[4], 1))
    padded_logi = sum(r[4] for r in rows if r[0] > 1.5 * max(r[4], 1))
    print(f"\npad-waste: {phys / 1e9:.2f} GB physical writes vs "
          f"{logi / 1e9:.2f} GB logical ({phys / max(logi, 1):.2f}x); "
          f"{padded / 1e9:.2f} GB sit in tensors padded >1.5x "
          f"({padded_logi / 1e9:.2f} GB logical)")
    print(f"\n--- top {top} single outputs (physical bytes incl. tile pad)")
    for total, kind, shape, txt, _ in sorted(rows, key=lambda r: -r[0])[:top]:
        print(f"{total / 1e6:>10.1f}MB  {kind:24s} {shape}")
        print(f"{'':14}{txt}")


def build(args):
    from double_yolo_kaist_tpu.config.ir import compile_cfg
    from double_yolo_kaist_tpu.data.pipeline import make_train_augment_fn
    from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path
    from double_yolo_kaist_tpu.train.optim import (cosine_epoch_schedule,
                                                   make_optimizer)
    from double_yolo_kaist_tpu.train import step as S

    HYP = {"lr0": 1e-3, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
           "box": 3.54, "obj": 102.88, "cls": 0.468, "cls_pw": 1.0,
           "obj_pw": 1.0, "iou_t": 0.2, "fl_gamma": 0.0, "ciou": 1.0,
           "hsv_h": 0.0138, "hsv_s": 0.678, "hsv_v": 0.36,
           "degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}
    B, K, s, T = args.batch, args.spd, args.img_size, 16
    SRC = (512, 640)
    N = 64
    pd = jnp.bfloat16 if args.pix_dtype == "bf16" else jnp.float32
    pool = jax.ShapeDtypeStruct((N,) + SRC + (3,), jnp.uint8)
    xs = {"b0": jax.ShapeDtypeStruct((K,), jnp.int32),
          "load": jax.ShapeDtypeStruct((K, 4 * B), jnp.int32),
          "targets": jax.ShapeDtypeStruct((K, B, T, 5), jnp.float32),
          "tmask": jax.ShapeDtypeStruct((K, B, T), bool)}
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    if args.program == "aug":
        aug = make_train_augment_fn(SRC, s, HYP, from_pool=True, jit=False,
                                    pix_dtype=pd)

        def aug_k(pool_v, pool_l, xs, akey):
            def one(_, x):
                b = aug(jax.random.fold_in(akey, x["b0"]), pool_v, pool_l,
                        x["load"], x["targets"], x["tmask"])
                return None, (b["v"].sum() + b["l"].sum())
            _, sums = jax.lax.scan(one, None, xs)
            return sums.sum()

        return jax.jit(aug_k).lower(pool, pool, xs, key)

    ir = compile_cfg(cfg_path(args.model or FLAGSHIP))
    if args.program == "infer":
        from double_yolo_kaist_tpu.models import graph as G

        folded = jax.eval_shape(
            lambda k: G.fold_batchnorm(ir, G.init(ir, k)),
            jax.random.PRNGKey(0))
        folded = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, jnp.bfloat16), folded)
        x = jax.ShapeDtypeStruct((B,) + SRC + (3,), jnp.bfloat16)

        def infer(params, xv, xl):
            io, _ = G.apply_folded(ir, params, xv, xl,
                                   compute_dtype=jnp.bfloat16)
            return io

        return jax.jit(infer).lower(folded, x, x)
    sched = cosine_epoch_schedule(HYP["lr0"], HYP["lrf"], 50, 100,
                                  warmup=False)
    tx = make_optimizer(HYP, sched, sgd=True)
    state = jax.eval_shape(
        lambda k: S.create_train_state(ir, k, tx), jax.random.PRNGKey(0))
    if args.program == "step":
        multi = S.make_multi_step(ir, HYP, tx, remat_segments=args.remat)
        batches = {
            "v": jax.ShapeDtypeStruct((K, B, s, s, 3), jnp.float32),
            "l": jax.ShapeDtypeStruct((K, B, s, s, 3), jnp.float32),
            "targets": jax.ShapeDtypeStruct((K, B, 4 * T, 5), jnp.float32),
            "tmask": jax.ShapeDtypeStruct((K, B, 4 * T), bool)}
        return multi.lower(state, batches, key)
    aug = make_train_augment_fn(SRC, s, HYP, from_pool=True, jit=False,
                                pix_dtype=pd)
    fused = S.make_fused_multi_step(ir, HYP, tx, aug,
                                    remat_segments=args.remat,
                                    double_buffer=args.double_buffer)
    return fused.lower(state, pool, pool, xs, key, key)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--program", choices=["aug", "fused", "step", "infer"],
                    default="aug")
    ap.add_argument("--model", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--spd", type=int, default=4)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--remat", type=int, default=0)
    ap.add_argument("--pix-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--double-buffer", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dump", default=None,
                    help="also write the optimized HLO text here")
    ap.add_argument("--all-instructions", action="store_true",
                    help="count instructions inside fusion bodies too "
                         "(they never touch HBM; see census docstring)")
    args = ap.parse_args()

    lowered = build(args)
    hlo = lowered.compile().as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)
        print(f"# optimized HLO -> {args.dump} ({len(hlo) / 1e6:.1f} MB)")
    census(hlo, args.top, hbm_only=not args.all_instructions)


if __name__ == "__main__":
    main()
