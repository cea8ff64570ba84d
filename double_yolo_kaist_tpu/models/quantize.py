"""Post-training int8 quantization for the inference path.

v5e's MXU runs int8 at ~2x bf16 throughput (measured: 361 TOP/s vs 182
TF/s on this chip for an isolated 3x3 conv), and the big configs are
MXU-bound — so PTQ is the main lever past the bf16 ceiling.

Scheme: symmetric int8. Weights are quantized per-output-channel from the
BN-folded kernels; activations per-tensor with scales from a calibration
pass (max-abs over sample batches). Convolutions run int8 x int8 -> int32 on
the MXU and dequantize into the bias add; everything between convs stays
bf16. SE blocks, head predictors (the last conv before each yolo node) and
decode remain full precision — they are tiny and accuracy-critical.

Flow:
    folded = graph.fold_batchnorm(ir, variables)
    stats  = calibrate(ir, folded, [batch1, batch2, ...])
    qvars  = quantize(ir, folded, stats)
    io, _  = apply_quantized(ir, qvars, xv, xl)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config.ir import GraphIR
from . import graph as G
from . import layers as L


def _standard_convs(ir: GraphIR) -> set:
    """All standard convs that could carry int8 (head predictors excluded;
    stem-fusion pairs too — they run through the faster s2d-fused bf16 path,
    see graph.stem_fusion_pairs)."""
    skip = {ir.nodes[yi - 1].index for yi in ir.yolo_indices}
    if G._FUSE_STEM:
        pairs = G.stem_fusion_pairs(ir)
        skip |= set(pairs) | set(pairs.values())
    return {n.index for n in ir.nodes
            if n.kind == "conv" and n.groups == 1 and n.index not in skip}


def _quantizable(ir: GraphIR, min_kernel: int = 3) -> set:
    """Nodes worth quantizing unconditionally: standard convs with
    kernel >= 3 (where the FLOPs are). 1x1 convs in isolation are
    HBM-bandwidth-bound — the extra quant/dequant elementwise passes cost
    more than the int8 MXU saving (measured end-to-end: blanket quantization
    with per-conv quant/dequant is SLOWER than bf16). 1x1 convs *inside int8
    chains* are handled by plan_quantization. Head predictor convs stay fp
    for accuracy."""
    return {i for i in _standard_convs(ir) if ir.nodes[i].kernel >= min_kernel}


def _chain_edge(ir: GraphIR, i: int, targets: set) -> bool:
    """True if node i's output can stay int8 into node i+1: node i is a
    quantized conv whose output's ONLY consumer is node i+1 (not cached for
    any route/shortcut), and node i+1 is a quantized conv reading the running
    stream (not the LWIR entry)."""
    j = i + 1
    return (i in targets and j in targets
            and ir.nodes[i].kind == "conv"
            and i not in ir.consumed
            and not ir.nodes[j].takes_second_input)


def plan_quantization(ir: GraphIR, mode: str = "chain"):
    """-> (targets: set of quantized conv indices,
           emits: {producer index -> inv output scale key holder}).

    Modes:
      * ``seed``  — 3x3+ convs only, every conv dequantizes to bf16 (the
        original selective scheme).
      * ``chain`` — seed set, then fixpoint-expand with 1x1 convs whose
        input arrives for free as int8 from the previous conv (sole-consumer
        chains). Chain-internal activations are requantized to int8 in the
        producing fusion instead of dequantized: halves the HBM write and
        removes the consumer's quantize pass.
      * ``all``   — every standard conv (head predictors still fp), with
        chain emission wherever sole-consumer edges exist.
    """
    standard = _standard_convs(ir)
    if mode == "seed":
        targets = _quantizable(ir)
        return targets, set()
    if mode == "all":
        targets = set(standard)
    elif mode == "chain":
        targets = set(_quantizable(ir))
        changed = True
        while changed:
            changed = False
            for j in sorted(standard - targets):
                if _chain_edge(ir, j - 1, targets | {j}):
                    targets.add(j)
                    changed = True
    else:
        raise ValueError(f"unknown quantization mode {mode!r}")
    emits = {i for i in targets if _chain_edge(ir, i, targets)}
    return targets, emits


# ------------------------------------------------------------------ calibrate

def make_calibration_fn(ir: GraphIR, compute_dtype=jnp.bfloat16,
                        pct: float = 100.0):
    """Jitted fn(folded, xv, xl) -> {key: amax-estimate} for quantizable nodes.

    Runs the BN-folded forward, recording an absolute-max statistic of every
    potentially-quantizable conv's input (all standard convs, so any
    plan_quantization mode can be applied to the same stats).

    ``pct``: clipping percentile of |input|. 100 = exact max-abs; 99.x
    discards activation outliers so the int8 grid spends its 254 steps on
    the bulk of the distribution (robust when calibrating on few batches).
    """
    # track every standard conv INCLUDING stem-fusion pairs: the fused int8
    # stem needs amax of the raw image (l<first>) and of the mid activation
    # (l<second>'s input), which this plain-graph pass measures directly
    skip = {ir.nodes[yi - 1].index for yi in ir.yolo_indices}
    targets = {n.index for n in ir.nodes
               if n.kind == "conv" and n.groups == 1 and n.index not in skip}

    def fn(folded, xv, xl=None):
        params = folded["params"]
        x = xv.astype(compute_dtype)
        x2 = None if xl is None else xl.astype(compute_dtype)
        cache, stats = {}, {}

        def track(key, val):
            a = jnp.abs(val.astype(jnp.float32))
            if pct >= 100.0:
                stats[key] = jnp.max(a)
            else:
                stats[key] = jnp.percentile(a.reshape(-1), pct)

        for node in ir.nodes:
            key = f"l{node.index}"
            p = params.get(key)
            if node.kind == "conv":
                inp = x2 if node.takes_second_input else x
                if node.index in targets:
                    track(key, inp)
                y = L.conv2d(inp, p["w"], stride=node.stride, pad=node.pad,
                             groups=node.groups)
                x = L.activate(node.act, (y + p["b"]).astype(compute_dtype))
            elif node.kind == "dwconv":
                y = L.conv2d(x, p["dw"]["w"], stride=node.stride, pad=1,
                             groups=node.in_ch)
                y = L.activate("relu6", (y + p["dw"]["b"]).astype(compute_dtype))
                y = L.conv2d(y, p["pw"]["w"])
                x = L.activate("relu6", (y + p["pw"]["b"]).astype(compute_dtype))
            elif node.kind == "inception":
                x = _inception_folded(x, p, compute_dtype)
            elif node.kind == "se":
                x = L.squeeze_excitation(x, p)
            elif node.kind == "maxpool":
                x = L.max_pool(x, node.kernel, node.stride, node.pad)
            elif node.kind == "avgpool":
                x = L.adaptive_avg_pool(x, node.out_size)
            elif node.kind == "upsample":
                x = L.upsample_nearest(x, node.scale)
            elif node.kind == "route":
                feats = [cache[j] for j in node.inputs]
                x = feats[0] if len(feats) == 1 else jnp.concatenate(feats, -1)
            elif node.kind == "shortcut":
                x = L.weighted_fusion(x, [cache[j] for j in node.inputs],
                                      p["w"] if node.weighted else None)
            elif node.kind in ("dropout", "yolo"):
                pass
            if node.index in ir.consumed:
                cache[node.index] = x
        return stats

    return jax.jit(fn)


def _inception_folded(x, p, dtype, track=None):
    def branch(inp, name, pad=0, t=None):
        if t is not None:
            t(f"/{name}", inp)
        y = L.conv2d(inp, p[name]["w"], pad=pad)
        return L.activate("leaky", (y + p[name]["b"]).astype(dtype))

    t = track if track is not None else None
    b1 = branch(x, "b1_1", t=t)
    b2 = branch(branch(x, "b2_1", t=t), "b2_2", 1, t=t)
    b3 = branch(branch(branch(x, "b3_1", t=t), "b3_2", 1, t=t), "b3_3", 1, t=t)
    b4 = branch(L.max_pool(x, 3, (1, 1), 1), "b4_1", t=t)
    return jnp.concatenate([b1, b2, b3, b4], -1)


def calibrate(ir: GraphIR, folded: dict, batches, compute_dtype=jnp.bfloat16,
              pct: float = 100.0):
    """Activation-scale stats over calibration batches (max of the per-batch
    ``pct``-percentile max-abs; pct=100 = plain max-abs).
    batches: iterable of (xv, xl-or-None). Returns {stat_key: float}."""
    fn = make_calibration_fn(ir, compute_dtype, pct=pct)
    acc: dict = {}
    for xv, xl in batches:
        stats = jax.device_get(fn(folded, xv, xl))
        for k, v in stats.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
    return acc


# ------------------------------------------------------------------- quantize

def _quant_weight(w):
    """HWIO fp kernel -> (int8 kernel, per-out-channel scale)."""
    sw = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return wq, sw.astype(jnp.float32)


def _qconv_params(p, amax: float):
    wq, sw = _quant_weight(p["w"])
    sx = max(amax, 1e-12) / 127.0
    return {"wq": wq, "scale": sw * sx, "inv_sx": np.float32(1.0 / sx),
            "b": p["b"]}


def quantize(ir: GraphIR, folded: dict, stats: dict,
             mode: str = "chain", hw: tuple | None = None) -> dict:
    """BN-folded params + calibration stats -> quantized variables.

    Chain-emitting convs carry ``out_inv_s`` = 127/amax(consumer input): the
    producing fusion requantizes its activation straight to int8 with the
    consumer's input scale, so the math is bit-identical to dequantize-then-
    requantize while writing half the bytes. apply_quantized infers the
    int8-input edges back from the presence of ``out_inv_s`` (the consumer is
    always the next node), so the plan travels with the params pytree."""
    params = folded["params"]
    targets, emits = plan_quantization(ir, mode)
    s2d_cands = G.s2d_candidates(ir) if G._S2D_REGION else set()
    stem = G.stem_fusion_pairs(ir) if G._FUSE_STEM else {}
    # hw: deployment size — precompute the transformed (+re-quantized)
    # s2d/stem kernels now, so apply_quantized contains zero per-call
    # weight-edit ops (same rationale as graph.prepare_folded)
    plan = G.s2d_plan(ir, *hw) if (hw and G._S2D_REGION) else {}
    q: dict = {}
    for node in ir.nodes:
        key = f"l{node.index}"
        p = params.get(key)
        if p is None:
            continue
        if node.index in targets and node.kind == "conv":
            qp = _qconv_params(p, stats[key])
            if node.index in emits:
                nxt = stats[f"l{node.index + 1}"]
                qp["out_inv_s"] = np.float32(127.0 / max(nxt, 1e-12))
            q[key] = {"q": qp}
            if node.index in s2d_cands:
                # keep the fp kernel too: apply_quantized transforms it into
                # the s2d basis and re-quantizes at trace time when the
                # input size puts this conv inside an s2d region
                q[key]["fp"] = p
            if node.index in plan:
                wt = L._s2d_w(p["w"], plan[node.index])
                wq, sw = _quant_weight(wt)
                qp["wq_t"], qp["sw_t"] = wq, sw
                qp["bt"] = (p["b"] if plan[node.index] == "x3"
                            else jnp.repeat(p["b"], 4))
        else:
            q[key] = {"fp": p}
            if node.index in plan:
                p2 = dict(p)
                p2["wt"] = L._s2d_w(p["w"], plan[node.index])
                p2["bt"] = (p["b"] if plan[node.index] == "x3"
                            else jnp.repeat(p["b"], 4))
                q[key] = {"fp": p2}
            if node.index in stem and key in stats:
                # fused int8 stem: image-input and mid-activation scales +
                # pre-transformed/quantized pair kernels
                q[key]["amax_in"] = np.float32(stats[key])
                mid = stats.get(f"l{stem[node.index]}")
                if mid is not None:
                    q[key]["amax_mid"] = np.float32(mid)
                    p2 = params[f"l{stem[node.index]}"]
                    wb, w2s = L.stem_pair_weights(p["w"], p2["w"])
                    wbq, swb = _quant_weight(wb)
                    w2q, sw2 = _quant_weight(w2s)
                    q[key]["stem_q"] = {"wbq": wbq, "swb": swb,
                                        "w2q": w2q, "sw2": sw2}
    return {"params": q}


# ---------------------------------------------------------------------- apply

def _qconv(x, qp, *, stride=(1, 1), pad=0, groups=1, act="linear",
           out_dtype=jnp.bfloat16):
    # quant/dequant elementwise math stays in the activation dtype (bf16):
    # integers up to 256 are exact in bf16, so rounding adds at most ~0.5 LSB
    # of extra quantization noise while halving the elementwise bandwidth
    if x.dtype == jnp.int8:  # chain edge: producer already emitted int8
        xq = x
    else:
        xq = jnp.clip(jnp.round(x * qp["inv_sx"].astype(x.dtype)),
                      -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, qp["wq"], window_strides=stride, padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.int32)
    y = (y.astype(out_dtype) * qp["scale"].astype(out_dtype)
         + qp["b"].astype(out_dtype))
    y = L.activate(act, y)
    if "out_inv_s" in qp:  # stay int8 into the next (quantized) conv
        y = jnp.clip(jnp.round(y * qp["out_inv_s"].astype(y.dtype)),
                     -127, 127).astype(jnp.int8)
    return y


def _qconv_s2d(x, qp, fp, role, *, act="linear", out_dtype=jnp.bfloat16):
    """Planned s2d conv on the int8 path: transform the fp kernel into the
    s2d basis (layers._s2d_w), re-quantize per-output-channel at trace time
    (pure weight math — XLA constant-folds it), and run int8 x int8 -> int32
    with the same per-tensor input scale as the plain conv (s2d is a
    permutation, so the calibrated amax is unchanged)."""
    if x.dtype == jnp.int8:
        xq = x
    else:
        xq = jnp.clip(jnp.round(x * qp["inv_sx"].astype(x.dtype)),
                      -127, 127).astype(jnp.int8)
    if ("wq_t" in qp
            and qp["wq_t"].shape[0] == G._S2D_KSHAPE[role]):
        wq, sw = qp["wq_t"], qp["sw_t"]
        b = qp["bt"]
    else:
        wt = L._s2d_w(fp["w"], role)
        wq, sw = _quant_weight(wt)
        b = fp["b"] if role == "x3" else jnp.repeat(fp["b"], 4)
    s, pad = L._S2D_GEOM[role]
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(s, s), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    sx = 1.0 / qp["inv_sx"]
    y = (y.astype(out_dtype) * (sw * sx).astype(out_dtype)
         + b.astype(out_dtype))
    y = L.activate(act, y)
    if "out_inv_s" in qp:
        y = jnp.clip(jnp.round(y * qp["out_inv_s"].astype(y.dtype)),
                     -127, 127).astype(jnp.int8)
    return y


def _q_fused_stem(x, p1, p2, act1, act2, amax_in, amax_mid, out_dtype,
                  pre=None):
    """int8 version of layers.fused_stem_pair: both s2d-fused stem convs run
    int8 x int8 -> int32 with trace-time weight transform+quantization and
    the calibrated image/mid-activation scales. ``pre``: precomputed
    kernels from quantize() (zero per-call weight edits)."""
    if pre is not None:
        wbq, swb = pre["wbq"], pre["swb"]
        w2q, sw2 = pre["w2q"], pre["sw2"]
    else:
        wb, w2s = L.stem_pair_weights(p1["w"], p2["w"])
        wbq, swb = _quant_weight(wb)
        w2q, sw2 = _quant_weight(w2s)
    sx1 = jnp.maximum(amax_in, 1e-12).astype(jnp.float32) / 127.0
    sx2 = jnp.maximum(amax_mid, 1e-12).astype(jnp.float32) / 127.0
    xq = jnp.clip(jnp.round(x * (1.0 / sx1).astype(x.dtype)),
                  -127, 127).astype(jnp.int8)
    y1 = jax.lax.conv_general_dilated(
        xq, wbq, (2, 2), [(1, 2), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y1 = (y1.astype(out_dtype) * (swb * sx1).astype(out_dtype)
          + jnp.tile(p1["b"], 4).astype(out_dtype))
    y1 = L.activate(act1, y1)
    y1q = jnp.clip(jnp.round(y1 * (1.0 / sx2).astype(y1.dtype)),
                   -127, 127).astype(jnp.int8)
    y2 = jax.lax.conv_general_dilated(
        y1q, w2q, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y2 = (y2.astype(out_dtype) * (sw2 * sx2).astype(out_dtype)
          + p2["b"].astype(out_dtype))
    return L.activate(act2, y2)


def apply_quantized(ir: GraphIR, qvars: dict, xv, xl=None, *,
                    compute_dtype=jnp.bfloat16):
    """int8 inference forward -> (decoded (bs, total, no) f32, raw heads)."""
    params = qvars["params"]
    x = xv.astype(compute_dtype)
    x2 = None if xl is None else xl.astype(compute_dtype)
    if ir.dual_stream and x2 is None:
        raise ValueError("dual-stream graph requires the LWIR input xl")

    cache, raw_heads, decoded = {}, [], []
    stem_pairs = G.stem_fusion_pairs(ir) if G._FUSE_STEM else {}
    plan = (G.s2d_plan(ir, xv.shape[1], xv.shape[2])
            if G._S2D_REGION else {})
    skip: set = set()
    for node in ir.nodes:
        key = f"l{node.index}"
        entry = params.get(key, {})
        if node.index in skip:
            pass                     # second half of a fused stem pair
        elif node.kind == "conv":
            inp = x2 if node.takes_second_input else x
            if (node.index in stem_pairs and "fp" in entry
                    and inp.shape[1] % 2 == 0 and inp.shape[2] % 2 == 0):
                n2 = ir.nodes[stem_pairs[node.index]]
                p, p2 = entry["fp"], params[f"l{n2.index}"]["fp"]
                if "amax_in" in entry and "amax_mid" in entry:
                    x = _q_fused_stem(inp, p, p2, node.act, n2.act,
                                      entry["amax_in"], entry["amax_mid"],
                                      compute_dtype,
                                      pre=entry.get("stem_q"))
                else:
                    x = L.fused_stem_pair(inp, p["w"], p["b"], node.act,
                                          p2["w"], p2["b"], n2.act)
                skip.add(n2.index)
            elif node.index in plan:
                if "fp" not in entry:
                    raise ValueError(
                        f"s2d-planned conv l{node.index} has no fp kernel "
                        "in qvars — re-run quantize() (stale/mismatched "
                        "quantized params for this plan)")
                if "q" in entry:     # quantized s2d conv
                    x = _qconv_s2d(inp, entry["q"], entry["fp"],
                                   plan[node.index], act=node.act,
                                   out_dtype=compute_dtype)
                else:                # fp conv inside an s2d region
                    fp = entry["fp"]
                    wt, bt = fp.get("wt"), fp.get("bt")
                    if (wt is not None
                            and wt.shape[0] != G._S2D_KSHAPE[plan[node.index]]):
                        wt = bt = None
                    x = L.s2d_conv(inp, fp["w"], fp["b"], node.act,
                                   plan[node.index], compute_dtype,
                                   wt=wt, bt=bt)
            elif "q" in entry:
                x = _qconv(inp, entry["q"], stride=node.stride, pad=node.pad,
                           groups=node.groups, act=node.act,
                           out_dtype=compute_dtype)
            else:
                p = entry["fp"]
                y = L.conv2d(inp, p["w"], stride=node.stride, pad=node.pad,
                             groups=node.groups)
                x = L.activate(node.act, (y + p["b"]).astype(compute_dtype))
        elif node.kind == "dwconv":
            p = entry["fp"]
            y = L.conv2d(x, p["dw"]["w"], stride=node.stride, pad=1,
                         groups=node.in_ch)
            y = L.activate("relu6", (y + p["dw"]["b"]).astype(compute_dtype))
            y = L.conv2d(y, p["pw"]["w"])
            x = L.activate("relu6", (y + p["pw"]["b"]).astype(compute_dtype))
        elif node.kind == "inception":
            x = _inception_folded(x, entry["fp"], compute_dtype)
        elif node.kind == "se":
            x = L.squeeze_excitation(x, entry["fp"])
        elif node.kind == "maxpool":
            x = L.max_pool(x, node.kernel, node.stride, node.pad)
        elif node.kind == "avgpool":
            x = L.adaptive_avg_pool(x, node.out_size)
        elif node.kind == "upsample":
            x = L.upsample_nearest(x, node.scale)
        elif node.kind == "route":
            feats = [cache[j] for j in node.inputs]
            x = feats[0] if len(feats) == 1 else jnp.concatenate(feats, -1)
        elif node.kind == "shortcut":
            w = entry["fp"]["w"] if node.weighted else None
            x = L.weighted_fusion(x, [cache[j] for j in node.inputs], w)
        elif node.kind == "dropout":
            pass
        elif node.kind == "yolo":
            na, no = len(node.anchors), node.nc + 5
            raw = G.reshape_head(x, na, no)
            raw_heads.append(raw)
            decoded.append(G.decode_head(raw, node.anchors, node.yolo_stride,
                                         node.bf_type))
        if node.index in ir.consumed:
            cache[node.index] = x

    return jnp.concatenate(decoded, axis=1), raw_heads
