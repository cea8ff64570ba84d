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

# Bump whenever quantize()/calibrate() numerics change in a way that does
# not alter the plan signature — cached quantized-variable artifacts (e.g.
# bench.py's qvars cache) key on this so a numeric change can never
# silently benchmark stale variables.
IMPL_VERSION = 2    # v2: stem pairs default to the fused bf16 stem
                    # (int8_stems=False) — chip A/B round 4: 935 vs 897 fps


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


def _quantizable(ir: GraphIR, min_kernel: int = 3, min_in_ch: int = 16) -> set:
    """Nodes worth quantizing unconditionally: standard convs with
    kernel >= 3 (where the FLOPs are). 1x1 convs in isolation are
    HBM-bandwidth-bound — the extra quant/dequant elementwise passes cost
    more than the int8 MXU saving (measured end-to-end: blanket quantization
    with per-conv quant/dequant is SLOWER than bf16). 1x1 convs *inside int8
    chains* are handled by plan_quantization. Head predictor convs stay fp
    for accuracy.

    Thin-INPUT convs (in_ch < 16, i.e. raw-image stems at K = k*k*in_ch =
    27) are excluded too: the contraction is far below the MXU's 256-lane
    K tile so int8 buys no MXU time, while the quant/dequant boundary
    passes run at FULL input resolution. Measured on the MobileNetv3 dual
    (where the two stems were the ONLY planned targets and no s2d region
    absorbs them): int8 1610 fps vs bf16 2485 — a 35% regression from
    quantizing just those two convs (docs/ROADMAP.md round-3 int8 family
    sweep). Classic backbones are unaffected: their stems are already
    excluded via stem_fusion_pairs and every other target has in_ch >= 32."""
    return {i for i in _standard_convs(ir)
            if ir.nodes[i].kernel >= min_kernel
            and ir.nodes[i].in_ch >= min_in_ch}


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


def _plan_spine(ir: GraphIR, targets: set, plan: dict,
                everywhere: bool = False) -> list:
    """Residual-spine shortcuts whose output can carry int8 (mode='spine').

    Eligible: a non-weighted single-partner add whose producing conv
    (node s-1, the block 3x3) is quantized and whose NEXT node is a
    standard conv with in_ch >= 16 reading the running stream. On the
    flagship every one of the 46 residual adds qualifies: the block exit
    feeds the next block's 1x1, which chain mode leaves fp because its
    input used to arrive bf16. The spine flips that: the add emits s8
    once (per-tensor scale = that 1x1's calibrated input amax, exactly
    the scale its entry-quantize would use), the 1x1 joins the int8
    targets reading the codes for free, and chains onward into the block
    3x3 — the whole residual block becomes int8 (plan_quantization
    re-runs the chain fixpoint over the enlarged target set). Every
    other consumer (the next add's partner read) dequantizes at read
    (1 B/elem instead of 2). The approximation is the partner reads:
    each block's add sees q(dequant(q(...))) of the previous block, so
    per-block quantization noise accumulates along the spine — which is
    why the mode is AP-gated like every other int8 plan.

    Default scope (mode='spine'): shortcuts INSIDE s2d regions (both
    neighbours planned), where the round-4 HLO census localized the
    standalone requantize passes. ``everywhere=True`` (mode='spineall')
    extends to every eligible add — the full VERDICT-r4 lever."""
    standard = {i for i in _standard_convs(ir) if ir.nodes[i].in_ch >= 16}
    out = []
    for node in ir.nodes:
        if (node.kind != "shortcut" or node.weighted
                or len(node.inputs) != 1):
            continue
        nxt = node.index + 1
        if nxt >= len(ir.nodes) or (node.index - 1) not in targets:
            continue
        nn = ir.nodes[nxt]
        if (nn.kind != "conv" or nn.index not in standard
                or nn.takes_second_input):
            continue
        in_region = (node.index - 1) in plan and nxt in plan
        if everywhere or in_region:
            out.append(node.index)
    return out


def plan_quantization(ir: GraphIR, mode: str = "chain",
                      s2d_plan: dict | None = None):
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
      * ``all``   — every standard conv (head predictors still fp;
        thin-input convs excluded in every mode — see _quantizable), with
        chain emission wherever sole-consumer edges exist.
      * ``edge``  — see :func:`plan_edges`: 'all' targets PLUS (nearly)
        every activation EDGE stored int8 with per-channel scales; fp
        consumers dequantize at read. The HBM traffic lever: edge bytes
        halve vs bf16 (docs/ROADMAP.md round-3 lever 1).
    """
    if mode == "edge":
        targets, int8_out, _ = plan_edges(ir)
        return targets, {i for i, v in int8_out.items() if v}
    if mode in ("spine", "spineall"):
        targets, emits, _ = _plan_with_spine(ir, mode, s2d_plan or {})
        return targets, emits
    # the thin-input rule (see _quantizable) applies to every mode: a conv
    # with in_ch < 16 never pays back its boundary passes
    standard = {i for i in _standard_convs(ir) if ir.nodes[i].in_ch >= 16}
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


def _plan_with_spine(ir: GraphIR, mode: str, s2d_plan: dict):
    """spine/spineall: chain plan + the residual-spine shortcut set, with
    the adds' following convs joining the targets (their input arrives as
    free s8 from the add) and the chain fixpoint re-run over the enlarged
    set -> (targets, emits, spine_indices)."""
    targets, _ = plan_quantization(ir, "chain")
    spine = _plan_spine(ir, targets, s2d_plan,
                        everywhere=(mode == "spineall"))
    targets |= {si + 1 for si in spine}
    standard = {i for i in _standard_convs(ir) if ir.nodes[i].in_ch >= 16}
    changed = True
    while changed:
        changed = False
        for j in sorted(standard - targets):
            if _chain_edge(ir, j - 1, targets | {j}):
                targets.add(j)
                changed = True
    emits = {i for i in targets if _chain_edge(ir, i, targets)}
    return targets, emits, spine


def warn_if_empty_plan(ir: GraphIR, mode: str, fallback: str) -> bool:
    """True (with a one-line warning) if ``mode``'s plan has no targets —
    the MobileNet-family case: depthwise convs can't carry int8 and the
    thin-input stems are excluded by the planner. Callers (serving,
    evaluator) then skip calibration AND the quantize compile and run the
    ``fallback`` path, which is numerically identical to quantizing an
    empty plan."""
    if plan_quantization(ir, mode)[0]:
        return False
    import warnings

    warnings.warn(
        f"int8 plan for this model ({mode!r} mode) is empty — no conv "
        f"benefits from int8 here; {fallback}", stacklevel=3)
    return True


# ------------------------------------------------------------------ edge plan
#
# mode='edge': store (nearly) every activation edge as int8 with PER-CHANNEL
# scales. The insight making this exact-enough and cheap:
#   * a conv consuming an int8 edge never needs a runtime input scale — the
#     per-channel edge scales fold into the WEIGHTS before weight
#     quantization (w'[:,:,c,:] = w[:,:,c,:] * s_c), so the int8 MXU math
#     and the dequant-by-sw' epilogue are unchanged;
#   * concat/maxpool/upsample/slice preserve per-channel scales, so routes
#     and SPP pools carry int8 straight through with zero extra ops;
#   * fp consumers (weighted shortcuts, SE, heads) dequantize AT READ —
#     the HBM read is still 1 byte/elem and the multiply fuses;
#   * per-channel activation scales are strictly more accurate than the
#     per-tensor scales of seed/chain mode.
# Edges feeding the fp head predictors (and the decode) stay bf16.

_PASS = ("maxpool", "upsample", "dropout")


def _stream_consumers(ir: GraphIR, i: int) -> list:
    """Indices of nodes reading node i's output as the RUNNING stream."""
    cc = []
    j = i + 1
    n = len(ir.nodes)
    while j < n:
        nj = ir.nodes[j]
        if nj.kind == "route" or (nj.kind == "conv"
                                  and nj.takes_second_input):
            break              # replaces x without reading it
        if nj.kind == "dropout":
            j += 1             # inference alias: neither reads nor writes
            continue
        cc.append(j)
        if nj.kind == "yolo":
            j += 1             # reads x but passes it through
            continue
        break
    return cc


def _stream_producer(ir: GraphIR, j: int):
    """Index of the node whose output is the running stream when node j
    runs (None when j reads an image)."""
    nj = ir.nodes[j]
    if j == 0 or (nj.kind == "conv" and nj.takes_second_input):
        return None
    k = j - 1
    while k >= 0 and ir.nodes[k].kind in ("dropout", "yolo"):
        k -= 1
    return k if k >= 0 else None


def plan_edges(ir: GraphIR, hw: tuple | None = None):
    """Static plan for mode='edge'.

    Returns (targets, int8_out, folded_in):
      targets: conv indices running int8 MXU math ('all' minus heads/stems)
      int8_out: {node index -> bool} output tensor stored int8
      folded_in: conv indices whose main input arrives int8 (weights are
        quantized WITH the per-channel input scales folded in)

    ``hw``: deployment size — nodes living in the PHASE-MINOR s2d basis at
    that size keep bf16 edges (A/B on v5e: int8 edges win ~6% on the plain
    layers but LOSE inside the s2d thin-stage regions, where XLA's conv
    emitter handles the 4C-lane int8 stores poorly; with the veto the two
    rewrites compose additively). The x3 region exits emit plain-basis int8
    as usual.
    """
    # thin-INPUT convs (in_ch < 16) are excluded here too — same measured
    # rationale as _quantizable: K = k*k*in_ch is far below the MXU tile so
    # int8 buys nothing, while their boundary passes run at full resolution
    # (35% regression on the MobileNet duals' stems)
    targets = {i for i in _standard_convs(ir) if ir.nodes[i].in_ch >= 16}
    head_pred = {ir.nodes[yi - 1].index for yi in ir.yolo_indices}
    stem_seconds = (set(G.stem_fusion_pairs(ir).values())
                    if G._FUSE_STEM else set())
    cons: dict = {}
    for n in ir.nodes:
        for j in n.inputs:
            cons.setdefault(j, []).append(n.index)

    def out_consumers(i):
        return _stream_consumers(ir, i) + cons.get(i, [])

    # backward: edges transitively feeding an fp head through format-
    # preserving nodes must stay bf16 (don't inject edge noise pre-decode)
    feeds_head: dict = {}
    for n in reversed(ir.nodes):
        i = n.index
        fh = False
        for c in out_consumers(i):
            nc = ir.nodes[c]
            if c in head_pred or nc.kind == "yolo":
                fh = True
            elif nc.kind in _PASS or nc.kind == "route":
                fh = fh or feeds_head.get(c, False)
        feeds_head[i] = fh

    in_basis: dict = {}
    if hw is not None and G._S2D_REGION:
        plan = G.s2d_plan(ir, *hw)
        in_basis = {i: b == "s" for i, b in G.s2d_basis(ir, plan).items()}
        # inside s2d regions run EXACTLY the measured-fastest chain plan
        # (quantize only its targets — blanket-quantizing the region 1x1s
        # re-pays the isolated quant/dequant that made mode='all' slower);
        # edge semantics apply to everything outside the regions
        chain_targets, _ = plan_quantization(ir, "chain")
        targets = {i for i in targets
                   if not (in_basis.get(i, False) or i in plan)
                   or i in chain_targets}

    int8_out: dict = {}
    cur = False                       # int8ness of the running stream
    for n in ir.nodes:
        i, k = n.index, n.kind
        can = (bool(out_consumers(i)) and not feeds_head[i]
               and not in_basis.get(i, False))
        if k == "conv":
            cur = can and (i in targets or i in stem_seconds)
        elif k in ("shortcut", "se"):
            cur = can                 # fp compute, requantized store
        elif k == "route":
            cur = bool(n.inputs) and all(int8_out.get(j, False)
                                         for j in n.inputs)
        elif k in ("maxpool", "upsample"):
            cur = cur and not feeds_head[i]   # carrier follows its input
        elif k in ("dropout", "yolo"):
            pass                      # x passes through unchanged
        else:                         # avgpool/inception/dwconv/...
            cur = False
        int8_out[i] = cur

    folded_in = set()
    for i in targets:
        p = _stream_producer(ir, i)
        if p is not None and int8_out.get(p, False):
            folded_in.add(i)
    return targets, int8_out, folded_in


def edge_scale_vectors(ir: GraphIR, stats: dict, int8_out: dict) -> dict:
    """{node index -> per-PLAIN-channel scale vector (amax/127, fp32)} for
    every int8-stored output, propagated through carriers and concats."""
    svec: dict = {}
    cur = None
    for n in ir.nodes:
        i, k = n.index, n.kind
        if k in ("dropout", "yolo"):
            svec[i] = cur if int8_out.get(i, False) else None
            continue
        if not int8_out.get(i, False):
            svec[i] = cur = None
            continue
        if k in ("conv", "shortcut", "se"):
            v = np.maximum(np.asarray(stats[f"l{i}.out"], np.float32),
                           1e-12) / 127.0
        elif k == "route":
            v = np.concatenate([svec[j] for j in n.inputs])
        elif k in ("maxpool", "upsample"):
            v = cur
        else:
            v = None
        svec[i] = cur = v
    return svec


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

    Besides the per-tensor INPUT amax of every standard conv (seed/chain
    modes), records the PER-CHANNEL output amax of every conv/shortcut/se
    node under key ``l<i>.out`` — the edge scales of mode='edge'.
    """
    # track every standard conv INCLUDING stem-fusion pairs: the fused int8
    # stem needs amax of the raw image (l<first>) and of the mid activation
    # (l<second>'s input), which this plain-graph pass measures directly
    skip = {ir.nodes[yi - 1].index for yi in ir.yolo_indices}
    targets = {n.index for n in ir.nodes
               if n.kind == "conv" and n.groups == 1 and n.index not in skip}
    out_track = {n.index for n in ir.nodes
                 if n.kind in ("conv", "shortcut", "se")
                 and n.index not in skip}

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

        def track_out(key, val):
            a = jnp.abs(val.astype(jnp.float32))
            if pct >= 100.0:
                stats[key] = jnp.max(a, axis=tuple(range(a.ndim - 1)))
            else:
                stats[key] = jnp.percentile(
                    a.reshape(-1, a.shape[-1]), pct, axis=0)

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
            if node.index in out_track:
                track_out(f"l{node.index}.out", x)
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
            v = np.asarray(v, np.float64)
            if v.ndim == 0:
                acc[k] = max(acc.get(k, 0.0), float(v))
            else:                      # per-channel vector (edge scales)
                prev = acc.get(k)
                acc[k] = v if prev is None else np.maximum(prev, v)
    return acc


def save_calibration(path: str, stats: dict, *, pct: float = 100.0) -> None:
    """Persist :func:`calibrate` stats as a deployment artifact (.npz).

    Stats are mode-independent (make_calibration_fn records a superset
    covering every plan_quantization mode), so one artifact serves
    seed/chain/all/edge alike. Production pattern: calibrate ONCE offline
    on representative frames (tools/calibrate.py), ship the file with the
    weights, and servers quantize at startup instead of depending on the
    first live requests (serving.Predictor(calibration=path))."""
    arrs = {k: np.asarray(v) for k, v in stats.items()}
    arrs["__pct__"] = np.asarray(float(pct), np.float64)
    np.savez(path, **arrs)


def load_calibration(path: str) -> tuple[dict, float]:
    """Load a :func:`save_calibration` artifact -> (stats, pct)."""
    with np.load(path) as z:
        pct = float(z["__pct__"]) if "__pct__" in z.files else 100.0
        stats = {}
        for k in z.files:
            if k == "__pct__":
                continue
            v = z[k]
            stats[k] = float(v) if v.ndim == 0 else v
    return stats, pct


def save_quantized(path: str, qvars: dict, *, mode: str,
                   hw: tuple | None = None) -> None:
    """Persist :func:`quantize` output as a single-file .npz deployment
    artifact (int8 kernels + scales + fp tails, plus the plan mode and the
    prepare size baked into the kernels).

    Rationale: re-quantizing at server startup costs a full quantize-jit
    compile (~13 min for the flagship through the tunnel, uncached); loading
    the finished variables is IO-only, so int8 replicas come up as fast as
    bf16 ones. The tree is pure nested dicts with array leaves
    (float32/bfloat16/int8), so a flat key/value npz reconstructs it
    exactly."""
    import ml_dtypes

    from ..utils.checkpoint import _flatten

    flat = _flatten({"q": jax.device_get(qvars)})
    # npz has no native bfloat16: it round-trips as raw void ('|V2') that
    # jnp.asarray rejects — store bf16 leaves as uint16 bit patterns plus a
    # key list, and view them back on load (bit-exact)
    bf16_keys = [k for k, a in flat.items()
                 if a.dtype == ml_dtypes.bfloat16]
    for k in bf16_keys:
        flat[k] = flat[k].view(np.uint16)
    flat["__bf16__"] = np.asarray(bf16_keys)
    flat["__mode__"] = np.asarray(mode)
    flat["__hw__"] = (np.asarray(hw, np.int64) if hw is not None
                      else np.asarray([], np.int64))
    np.savez(path, **flat)


def load_quantized(path: str) -> tuple[dict, str, tuple | None]:
    """Load a :func:`save_quantized` artifact -> (qvars, mode, hw)."""
    import ml_dtypes

    meta = ("__mode__", "__hw__", "__bf16__")
    with np.load(path) as z:
        mode = str(z["__mode__"])
        hw_arr = z["__hw__"]
        hw = tuple(int(x) for x in hw_arr) if hw_arr.size else None
        bf16 = set(z["__bf16__"].tolist()) if "__bf16__" in z.files else set()
        tree: dict = {}
        for key in z.files:
            if key in meta:
                continue
            arr = z[key]
            if key in bf16:
                arr = arr.view(ml_dtypes.bfloat16)
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return tree["q"], mode, hw


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


def _quantize_edge(ir: GraphIR, folded: dict, stats: dict,
                   hw: tuple | None = None,
                   int8_stems: bool = False) -> dict:
    """mode='edge' variables: folded weights carry the per-channel scales of
    their int8 input edges; emitting nodes carry ``out_s``/``out_inv``
    per-channel output scale vectors (PLAIN channel space — the executor
    phase-expands them by 4 inside s2d regions)."""
    params = folded["params"]
    targets, int8_out, folded_in = plan_edges(ir, hw)
    svec = edge_scale_vectors(ir, stats, int8_out)
    s2d_cands = G.s2d_candidates(ir) if G._S2D_REGION else set()
    stem = G.stem_fusion_pairs(ir) if G._FUSE_STEM else {}
    plan = G.s2d_plan(ir, *hw) if (hw and G._S2D_REGION) else {}

    def out_scales(i):
        v = np.asarray(svec[i], np.float32)
        return {"out_s": jnp.asarray(v),
                "out_inv": jnp.asarray(1.0 / v)}

    q: dict = {}
    for node in ir.nodes:
        i = node.index
        key = f"l{i}"
        p = params.get(key)
        ent: dict = {}
        if node.kind == "conv" and i in targets:
            in_s = None
            if i in folded_in:
                in_s = np.asarray(svec[_stream_producer(ir, i)], np.float32)
            w = p["w"]
            if in_s is not None:
                w = w * jnp.asarray(in_s, w.dtype)[None, None, :, None]
            wq, sw = _quant_weight(w)
            qp = {"wq": wq, "b": p["b"]}
            if in_s is None:
                sx = max(float(stats[key]), 1e-12) / 127.0
                qp["scale"] = sw * np.float32(sx)
                qp["inv_sx"] = np.float32(1.0 / sx)
            else:
                qp["scale"] = sw
                qp["in_s"] = jnp.asarray(in_s)
                qp["in_inv"] = jnp.asarray(1.0 / in_s)
            if int8_out.get(i) and svec[i] is not None:
                qp.update(out_scales(i))
            ent["q"] = qp
            if i in s2d_cands:
                ent["fp"] = p
            if i in plan:
                wt = L._s2d_w(w, plan[i])     # fold edge scales, THEN s2d
                qp["wq_t"], qp["sw_t"] = _quant_weight(wt)
                qp["bt"] = (p["b"] if plan[i] == "x3"
                            else jnp.repeat(p["b"], 4))
        else:
            if p is not None:
                ent["fp"] = p
            if node.kind == "conv" and i in plan and p is not None:
                p2 = dict(p)
                p2["wt"] = L._s2d_w(p["w"], plan[i])
                p2["bt"] = (p["b"] if plan[i] == "x3"
                            else jnp.repeat(p["b"], 4))
                ent["fp"] = p2
            if node.kind == "conv" and i in stem and key in stats \
                    and int8_stems:
                ent["amax_in"] = np.float32(stats[key])
                mid = stats.get(f"l{stem[i]}")
                if mid is not None:
                    ent["amax_mid"] = np.float32(mid)
                    p2 = params[f"l{stem[i]}"]
                    wb, w2s = L.stem_pair_weights(p["w"], p2["w"])
                    wbq, swb = _quant_weight(wb)
                    w2q, sw2 = _quant_weight(w2s)
                    ent["stem_q"] = {"wbq": wbq, "swb": swb,
                                     "w2q": w2q, "sw2": sw2}
                j2 = stem[i]
                if int8_out.get(j2) and svec.get(j2) is not None:
                    v = np.asarray(svec[j2], np.float32)
                    ent["stem_out_s"] = jnp.asarray(v)
                    ent["stem_out_inv"] = jnp.asarray(1.0 / v)
            if (node.kind in ("shortcut", "se") and int8_out.get(i)
                    and svec.get(i) is not None):
                ent.update(out_scales(i))
        if ent:
            q[key] = ent
    return {"params": q}


def quantize(ir: GraphIR, folded: dict, stats: dict,
             mode: str = "chain", hw: tuple | None = None,
             int8_stems: bool = False) -> dict:
    """BN-folded params + calibration stats -> quantized variables.

    Chain-emitting convs carry ``out_inv_s`` = 127/amax(consumer input): the
    producing fusion requantizes its activation straight to int8 with the
    consumer's input scale, so the math is bit-identical to dequantize-then-
    requantize while writing half the bytes. apply_quantized infers the
    int8-input edges back from the presence of ``out_inv_s`` (the consumer is
    always the next node), so the plan travels with the params pytree.

    ``int8_stems``: quantize the fused stem pairs too. Default OFF — the
    stems are bandwidth-bound (K = 48/288 MACs, far under the MXU tile) so
    int8 buys no MXU time, while the mid-activation requantize runs at the
    stem's s2d resolution (336 Melem -> ~1 GB/step at bs16 512x640, the
    single largest standalone elementwise pass in the round-4 HLO profile);
    XLA's conv emitter refuses to fold the s8 store into the conv fusion in
    the s2d layout. Paired chip A/B (tools/int8_ab.py chain vs chain+fpstem,
    4 rounds): bf16 stems 935.3 fps vs int8 stems 897.4 — the fused bf16
    stem (layers.fused_stem_pair) wins 4.2% and is bit-more-accurate."""
    if mode == "edge":
        return _quantize_edge(ir, folded, stats, hw, int8_stems)
    params = folded["params"]
    s2d_cands = G.s2d_candidates(ir) if G._S2D_REGION else set()
    stem = G.stem_fusion_pairs(ir) if G._FUSE_STEM else {}
    # hw: deployment size — precompute the transformed (+re-quantized)
    # s2d/stem kernels now, so apply_quantized contains zero per-call
    # weight-edit ops (same rationale as graph.prepare_folded)
    plan = G.s2d_plan(ir, *hw) if (hw and G._S2D_REGION) else {}
    if mode in ("spine", "spineall"):
        targets, emits, spine = _plan_with_spine(ir, mode, plan)
    else:
        targets, emits = plan_quantization(ir, mode)
        spine = []
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
            if node.index in stem and key in stats and int8_stems:
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
    if spine:
        # int8 residual spine: eligible adds emit s8 directly, scaled with
        # the next conv's calibrated input amax — exactly the scale its
        # entry-quantize pass uses, so _qconv consumes the codes unchanged
        for si in spine:
            amax = stats[f"l{si + 1}"]
            sx = max(amax, 1e-12) / 127.0
            q.setdefault(f"l{si}", {})["spine"] = {
                "inv_sy": np.float32(1.0 / sx), "sy": np.float32(sx)}
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
    # chain-internal 1x1 convs: one VMEM pass (s8 GEMM + fused dequant/act/
    # requant) instead of conv->bf16->multiply_add->clamp_convert bouncing
    # ~9 B/elem through HBM (XLA's conv emitter can't store s8; see
    # ops/pallas_qgemm.py). Bit-exact with the path below.
    from ..ops import pallas_qgemm as PQ
    if (PQ._SCOPE == "all"
            and PQ.usable(xq, qp["wq"], stride=stride, pad=pad,
                          groups=groups)):
        return PQ.qgemm(xq, qp["wq"][0, 0], qp["scale"], qp["b"], act,
                        out_inv_s=qp.get("out_inv_s"), out_dtype=out_dtype)
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
    # interior 1x1 (kron) convs are 1x1 convs in the s2d basis too -> the
    # same one-pass Pallas GEMM as chain-internal 1x1s (see _qconv)
    from ..ops import pallas_qgemm as PQ
    if (role == "i1" and PQ._SCOPE in ("i1", "all")
            and PQ.usable(xq, wq, stride=(s, s), pad=0, groups=1)):
        sx = 1.0 / qp["inv_sx"]
        return PQ.qgemm(xq, wq[0, 0], sw * sx, b, act,
                        out_inv_s=qp.get("out_inv_s"), out_dtype=out_dtype)
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


def _expand(v, c: int):
    """Match a PLAIN-channel scale vector to a tensor's channel count
    (phase-minor s2d basis: each plain channel owns 4 adjacent lanes)."""
    return v if v.shape[0] == c else jnp.repeat(v, c // v.shape[0])


def _deq(x, xs, dtype):
    """int8 tensor + per-channel scales -> fp (read stays 1 byte/elem)."""
    if x.dtype != jnp.int8:
        return x.astype(dtype)
    return x.astype(dtype) * _expand(xs, x.shape[-1]).astype(dtype)


def _req(y, out_inv, out_s):
    """fp activation -> (int8 tensor, per-channel scales)."""
    inv = _expand(out_inv, y.shape[-1])
    yq = jnp.clip(jnp.round(y * inv.astype(y.dtype)),
                  -127, 127).astype(jnp.int8)
    return yq, out_s


def _qin_edge(x, xs, qp, dtype):
    """Produce the int8 conv input the folded weights expect: normally the
    edge arrives int8 with exactly qp['in_s'] scales; if a fallback path
    left it fp, quantize per-channel on the same grid (exact same math)."""
    if x.dtype == jnp.int8:
        return x
    inv = _expand(qp["in_inv"], x.shape[-1])
    return jnp.clip(jnp.round(x.astype(dtype) * inv.astype(dtype)),
                    -127, 127).astype(jnp.int8)


def _qconv_e(x, xs, qp, *, stride=(1, 1), pad=0, act="linear",
             out_dtype=jnp.bfloat16):
    """Edge-mode quantized conv: int8 x int8 -> int32, dequant by the
    (input-scale-folded) per-out-channel weight scale, optional per-channel
    int8 re-emission. Returns (y, ys)."""
    if "in_s" in qp:
        xq = _qin_edge(x, xs, qp, out_dtype)
    else:
        xf = _deq(x, xs, out_dtype)
        xq = jnp.clip(jnp.round(xf * qp["inv_sx"].astype(xf.dtype)),
                      -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, qp["wq"], window_strides=stride, padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = (y.astype(out_dtype) * qp["scale"].astype(out_dtype)
         + qp["b"].astype(out_dtype))
    y = L.activate(act, y)
    if "out_inv" in qp:
        return _req(y, qp["out_inv"], qp["out_s"])
    return y, None


def _qconv_s2d_e(x, xs, qp, fp, role, *, act="linear",
                 out_dtype=jnp.bfloat16):
    """Edge-mode planned s2d conv (see _qconv_s2d); the precomputed wq_t was
    quantized from the edge-scale-folded kernel, so no input scale appears
    in the epilogue when the input edge is int8."""
    if "in_s" in qp:
        xq = _qin_edge(x, xs, qp, out_dtype)
        post = None
    else:
        xf = _deq(x, xs, out_dtype)
        xq = jnp.clip(jnp.round(xf * qp["inv_sx"].astype(xf.dtype)),
                      -127, 127).astype(jnp.int8)
        post = 1.0 / qp["inv_sx"]
    if "wq_t" in qp and qp["wq_t"].shape[0] == G._S2D_KSHAPE[role]:
        wq, sw, b = qp["wq_t"], qp["sw_t"], qp["bt"]
    else:
        w = fp["w"]
        if "in_s" in qp:
            w = w * qp["in_s"].astype(w.dtype)[None, None, :, None]
        wt = L._s2d_w(w, role)
        wq, sw = _quant_weight(wt)
        b = fp["b"] if role == "x3" else jnp.repeat(fp["b"], 4)
    s, pad = L._S2D_GEOM[role]
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(s, s), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    scale = sw if post is None else sw * post
    y = (y.astype(out_dtype) * scale.astype(out_dtype)
         + b.astype(out_dtype))
    y = L.activate(act, y)
    if "out_inv" in qp:
        return _req(y, qp["out_inv"], qp["out_s"])
    return y, None


def _apply_edge(ir: GraphIR, qvars: dict, xv, xl=None, *,
                compute_dtype=jnp.bfloat16):
    """mode='edge' forward: activations live in HBM as per-channel int8
    wherever plan_edges allows — conv consumers run int8 MXU math directly
    (scales folded into weights), fp consumers dequantize at read, compute
    nodes re-emit int8. Decoded output identical in structure to
    apply_quantized."""
    params = qvars["params"]
    dt = compute_dtype
    x, xs = xv.astype(dt), None
    x2 = None if xl is None else xl.astype(dt)
    if ir.dual_stream and x2 is None:
        raise ValueError("dual-stream graph requires the LWIR input xl")

    cache: dict = {}            # idx -> (tensor, scales-or-None)
    raw_heads, decoded = [], []
    stem_pairs = G.stem_fusion_pairs(ir) if G._FUSE_STEM else {}
    plan = (G.s2d_plan(ir, xv.shape[1], xv.shape[2])
            if G._S2D_REGION else {})
    skip: set = set()
    for node in ir.nodes:
        key = f"l{node.index}"
        entry = params.get(key, {})
        kind = node.kind
        if node.index in skip:
            pass
        elif kind == "conv":
            inp, inps = (x2, None) if node.takes_second_input else (x, xs)
            if (node.index in stem_pairs and "fp" in entry
                    and inp.shape[1] % 2 == 0 and inp.shape[2] % 2 == 0):
                n2 = ir.nodes[stem_pairs[node.index]]
                p, p2 = entry["fp"], params[f"l{n2.index}"]["fp"]
                if "amax_in" in entry and "amax_mid" in entry:
                    x = _q_fused_stem(inp, p, p2, node.act, n2.act,
                                      entry["amax_in"], entry["amax_mid"],
                                      dt, pre=entry.get("stem_q"))
                else:
                    x = L.fused_stem_pair(inp, p["w"], p["b"], node.act,
                                          p2["w"], p2["b"], n2.act)
                xs = None
                if "stem_out_inv" in entry:
                    x, xs = _req(x, entry["stem_out_inv"],
                                 entry["stem_out_s"])
                skip.add(n2.index)
            elif "q" in entry and node.index in plan:
                x, xs = _qconv_s2d_e(inp, inps, entry["q"],
                                     entry.get("fp"), plan[node.index],
                                     act=node.act, out_dtype=dt)
            elif "q" in entry:
                x, xs = _qconv_e(inp, inps, entry["q"], stride=node.stride,
                                 pad=node.pad, act=node.act, out_dtype=dt)
            else:                 # fp conv (head predictors)
                p = entry["fp"]
                xf = _deq(inp, inps, dt)
                if node.index in plan:
                    wt, bt = p.get("wt"), p.get("bt")
                    if (wt is not None and
                            wt.shape[0] != G._S2D_KSHAPE[plan[node.index]]):
                        wt = bt = None
                    x = L.s2d_conv(xf, p["w"], p["b"], node.act,
                                   plan[node.index], dt, wt=wt, bt=bt)
                else:
                    y = L.conv2d(xf, p["w"], stride=node.stride,
                                 pad=node.pad, groups=node.groups)
                    x = L.activate(node.act, (y + p["b"]).astype(dt))
                xs = None
        elif kind == "dwconv":
            p = entry["fp"]
            xf = _deq(x, xs, dt)
            y = L.conv2d(xf, p["dw"]["w"], stride=node.stride, pad=1,
                         groups=node.in_ch)
            y = L.activate("relu6", (y + p["dw"]["b"]).astype(dt))
            y = L.conv2d(y, p["pw"]["w"])
            x = L.activate("relu6", (y + p["pw"]["b"]).astype(dt))
            xs = None
        elif kind == "inception":
            x = _inception_folded(_deq(x, xs, dt), entry["fp"], dt)
            xs = None
        elif kind == "se":
            x = L.squeeze_excitation(_deq(x, xs, dt), entry["fp"])
            xs = None
            if "out_inv" in entry:
                x, xs = _req(x, entry["out_inv"], entry["out_s"])
        elif kind == "maxpool":
            # int8-transparent: max of quantized = quantized max
            x = L.max_pool(x, node.kernel, node.stride, node.pad)
        elif kind == "avgpool":
            x = L.adaptive_avg_pool(_deq(x, xs, dt), node.out_size)
            xs = None
        elif kind == "upsample":
            x = L.upsample_nearest(x, node.scale)
        elif kind == "route":
            feats = [cache[j] for j in node.inputs]
            if len(feats) == 1:
                x, xs = feats[0]
            elif all(s is not None for _, s in feats):
                # int8 concat is free; phase-expand each scale vector first
                x = jnp.concatenate([t for t, _ in feats], -1)
                xs = jnp.concatenate(
                    [_expand(s, t.shape[-1]) for t, s in feats])
            else:
                x = jnp.concatenate([_deq(t, s, dt) for t, s in feats], -1)
                xs = None
        elif kind == "shortcut":
            extras = [_deq(*cache[j], dt) for j in node.inputs]
            w = (entry["fp"]["w"] if node.weighted else None)
            x = L.weighted_fusion(_deq(x, xs, dt), extras, w)
            xs = None
            if "out_inv" in entry:
                x, xs = _req(x, entry["out_inv"], entry["out_s"])
        elif kind == "dropout":
            pass
        elif kind == "yolo":
            na, no = len(node.anchors), node.nc + 5
            raw = G.reshape_head(_deq(x, xs, dt), na, no)
            raw_heads.append(raw)
            decoded.append(G.decode_head(raw, node.anchors,
                                         node.yolo_stride, node.bf_type))
        if node.index in ir.consumed:
            cache[node.index] = (x, xs)

    return jnp.concatenate(decoded, axis=1), raw_heads


def apply_quantized(ir: GraphIR, qvars: dict, xv, xl=None, *,
                    compute_dtype=jnp.bfloat16, mode: str = "chain"):
    """int8 inference forward -> (decoded (bs, total, no) f32, raw heads).
    ``mode`` must match the ``quantize(mode=...)`` that built qvars
    ('seed'/'chain'/'all'/'spine'/'spineall' share one executor — the
    spine plan travels as 'spine' entries on shortcut keys; 'edge' has
    its own)."""
    if mode == "edge":
        return _apply_edge(ir, qvars, xv, xl, compute_dtype=compute_dtype)
    return _apply_q_chain(ir, qvars, xv, xl, compute_dtype=compute_dtype)


class _SpineVal:
    """An int8 residual-spine activation travelling the executor's running
    stream: the s8 codes plus their per-tensor dequant scale (mode='spine').
    A plain container (NOT a pytree node) — it exists only between executor
    statements inside one trace."""

    __slots__ = ("q", "sy")

    def __init__(self, q, sy):
        self.q, self.sy = q, sy


def _fv(v, dtype):
    """Full-precision view of a running value: spine s8 dequantizes at read
    (1 B/elem, the multiply fuses into the consumer); others pass through."""
    if isinstance(v, _SpineVal):
        return v.q.astype(dtype) * jnp.asarray(v.sy, dtype)
    return v


def _apply_q_chain(ir: GraphIR, qvars: dict, xv, xl=None, *,
                   compute_dtype=jnp.bfloat16):
    """seed/chain/all executor (plan travels via ``out_inv_s`` presence)."""
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
            if isinstance(inp, _SpineVal):
                # quantized consumers read the s8 codes directly (the spine
                # scale IS this conv's entry-quantize scale — _plan_spine);
                # fp consumers dequantize at read inside their own fusion
                inp = (inp.q if "q" in entry
                       and node.index not in stem_pairs
                       else _fv(inp, compute_dtype))
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
            feats = [_fv(cache[j], compute_dtype) for j in node.inputs]
            x = feats[0] if len(feats) == 1 else jnp.concatenate(feats, -1)
        elif node.kind == "shortcut":
            w = entry["fp"]["w"] if node.weighted else None
            y = L.weighted_fusion(
                _fv(x, compute_dtype),
                [_fv(cache[j], compute_dtype) for j in node.inputs], w)
            sp = entry.get("spine")
            if sp is not None:  # int8 residual spine: emit s8 once
                y8 = jnp.clip(
                    jnp.round(y * jnp.asarray(sp["inv_sy"], y.dtype)),
                    -127, 127).astype(jnp.int8)
                x = _SpineVal(y8, sp["sy"])
            else:
                x = y
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
