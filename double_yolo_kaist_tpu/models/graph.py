"""Pure-functional graph executor: GraphIR + params pytree -> jitted forward.

Replaces the reference's runtime ``nn.ModuleList`` interpreter
(models.py:261-315) with a trace-time loop: the Python loop below runs once
under ``jax.jit`` tracing and unrolls into a single fused XLA program, so there
is no per-layer dispatch overhead at run time. Skip/fusion connections keep a
cache of only the layer outputs actually consumed later (``ir.consumed`` —
the reference caches per its ``routs`` flags, models.py:305).

Dual-stream semantics match reference models.py:288-303: the conv at
``second_index`` reads the LWIR image instead of the running activation.

YOLO head decode implements both box-formula variants
(v3: models.py:234-246, v4: models.py:247-252) with the grid offsets computed
inline (static shapes; no lazy grid cache needed under XLA).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.ir import GraphIR
from . import layers as L


# ------------------------------------------------------------------------ init

def init(ir: GraphIR, rng, smart_bias: bool = True) -> dict:
    """Initialize {"params": ..., "state": ...} pytrees for a compiled graph.

    ``smart_bias`` applies the focal-loss prior to each predictor conv's bias
    (obj -4.5, cls log(0.6/(nc-0.99)); reference models.py:133-144).
    """
    params: dict[str, dict] = {}
    state: dict[str, dict] = {}
    keys = jax.random.split(rng, len(ir.nodes))
    for node, key in zip(ir.nodes, keys):
        p, s = L.init_node_params(key, node)
        if p is not None:
            params[f"l{node.index}"] = p
        if s is not None:
            state[f"l{node.index}"] = s

    if smart_bias:
        for yi in ir.yolo_indices:
            head = ir.nodes[yi]
            pred = ir.nodes[yi - 1]
            if pred.kind != "conv" or pred.bn:
                continue
            na, nc = len(head.anchors), head.nc
            b = params[f"l{pred.index}"]["b"].reshape(na, nc + 5)
            b = b.at[:, 4].add(-4.5)
            b = b.at[:, 5:].add(math.log(0.6 / (nc - 0.99)))
            params[f"l{pred.index}"]["b"] = b.reshape(-1)
    return {"params": params, "state": state}


# ---------------------------------------------------------------------- decode

def reshape_head(p, na: int, no: int):
    """(bs, ny, nx, na*no) NHWC conv output -> (bs, na, ny, nx, no)."""
    bs, ny, nx, _ = p.shape
    return p.reshape(bs, ny, nx, na, no).transpose(0, 3, 1, 2, 4)


def decode_head(p, anchors: np.ndarray, stride: int, bf_type: str):
    """Grid-decode one head's raw output (bs, na, ny, nx, no) to image-space
    boxes (bs, na*ny*nx, no). xy/wh in input pixels, conf/cls as probabilities."""
    bs, na, ny, nx, no = p.shape
    p = p.astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(jnp.float32, (1, 1, ny, nx, 1), 3)
    gy = jax.lax.broadcasted_iota(jnp.float32, (1, 1, ny, nx, 1), 2)
    grid = jnp.concatenate([gx, gy], axis=-1)
    anchor_wh = jnp.asarray(anchors / stride, jnp.float32).reshape(1, na, 1, 1, 2)

    if bf_type == "yolov3":
        xy = jax.nn.sigmoid(p[..., :2]) + grid
        wh = jnp.exp(p[..., 2:4]) * anchor_wh
        rest = jax.nn.sigmoid(p[..., 4:])
    elif bf_type == "yolov4":
        s = jax.nn.sigmoid(p)
        xy = s[..., :2] * 2.0 - 0.5 + grid
        wh = jnp.square(s[..., 2:4] * 2.0) * anchor_wh
        rest = s[..., 4:]
    else:
        raise ValueError(f"unknown bf_type {bf_type}")

    io = jnp.concatenate([xy * stride, wh * stride, rest], axis=-1)
    return io.reshape(bs, na * ny * nx, no)


# ----------------------------------------------------------------------- apply

def _exec_node(node, p, s, x, x2, cache, *, train, rng, axis_name,
               s2d_role=None):
    """Execute one IR node. Returns (x, new_state_entry|None, raw_head|None)."""
    kind = node.kind
    ns = None
    head = None
    if kind == "conv":
        inp = x2 if node.takes_second_input else x
        x, bn_s = L.conv_bn_act(inp, p, s, stride=node.stride, pad=node.pad,
                                groups=node.groups, act=node.act, bn=node.bn,
                                train=train, axis_name=axis_name,
                                s2d_role=s2d_role)
        if bn_s is not None and train:
            ns = bn_s
    elif kind == "dwconv":
        x, bn_s = L.depthwise_separable(x, p, s, stride=node.stride,
                                        train=train, axis_name=axis_name)
        if train:
            ns = bn_s
    elif kind == "se":
        x = L.squeeze_excitation(x, p)
    elif kind == "inception":
        x, bn_s = L.inception(x, p, s, train=train, axis_name=axis_name)
        if train:
            ns = bn_s
    elif kind == "maxpool":
        x = L.max_pool(x, node.kernel, node.stride, node.pad)
    elif kind == "avgpool":
        x = L.adaptive_avg_pool(x, node.out_size)
    elif kind == "upsample":
        x = L.upsample_nearest(x, node.scale)
    elif kind == "route":
        feats = [cache[j] for j in node.inputs]
        x = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)
    elif kind == "shortcut":
        extras = [cache[j] for j in node.inputs]
        x = L.weighted_fusion(x, extras, p["w"] if node.weighted else None)
    elif kind == "dropout":
        if train and rng is not None and node.p > 0:
            x = L.dropout(x, node.p, jax.random.fold_in(rng, node.index))
    elif kind == "yolo":
        na, no = len(node.anchors), node.nc + 5
        head = reshape_head(x, na, no)
    else:
        raise ValueError(f"unknown node kind {kind}")
    return x, ns, head


def apply(ir: GraphIR, variables: dict, xv, xl=None, *, train: bool = False,
          rng=None, axis_name: Optional[str] = None,
          compute_dtype=None, remat_segments: int = 0):
    """Run the graph.

    Args:
      variables: {"params", "state"} as produced by :func:`init`.
      xv / xl: visible / LWIR images, NHWC float in [0, 1]. ``xl`` is required
        for dual-stream graphs.
      train: True -> returns (list of raw head outputs, new_state);
        False -> returns ((decoded boxes (bs, total, no), raw list), state).
      rng: PRNG key for dropout (train only).
      axis_name: mesh axis for cross-replica BatchNorm statistics.
      compute_dtype: dtype activations run in (e.g. jnp.bfloat16); params stay
        fp32 and BN statistics are always fp32.
      remat_segments: if > 0, split the layer sequence into this many
        ``jax.checkpoint`` segments — activations inside a segment are
        rematerialized in the backward pass, trading FLOPs for HBM (enables
        large-batch training of the 100M+-param configs).
    """
    params, state = variables["params"], variables["state"]
    dtype = compute_dtype or xv.dtype
    x = xv.astype(dtype)
    x2 = None if xl is None else xl.astype(dtype)
    if ir.dual_stream and x2 is None:
        raise ValueError("dual-stream graph requires the LWIR input xl")

    plan = (s2d_plan(ir, xv.shape[1], xv.shape[2], exclude_stems=False)
            if _S2D_TRAIN else {})

    n = len(ir.nodes)
    if remat_segments and train:
        bounds = [round(i * n / remat_segments)
                  for i in range(remat_segments + 1)]
        segments = [ir.nodes[bounds[i]:bounds[i + 1]]
                    for i in range(remat_segments)]
    else:
        segments = [ir.nodes]

    cache: dict[int, jnp.ndarray] = {}
    new_state: dict[str, dict] = {}
    raw_heads = []

    def run_segment(nodes, params, state, x, x2, cache):
        heads, seg_state, new_cache = [], {}, {}
        for node in nodes:
            key = f"l{node.index}"
            x, ns, head = _exec_node(node, params.get(key), state.get(key),
                                     x, x2, {**cache, **new_cache},
                                     train=train, rng=rng,
                                     axis_name=axis_name,
                                     s2d_role=plan.get(node.index))
            if ns is not None:
                seg_state[key] = ns
            if head is not None:
                heads.append(head)
            if node.index in ir.consumed:
                new_cache[node.index] = x
        return x, new_cache, seg_state, heads

    for si, seg_nodes in enumerate(segments):
        fn = run_segment
        if len(segments) > 1:
            fn = jax.checkpoint(
                lambda p_, s_, x_, x2_, c_, _nodes=seg_nodes:
                run_segment(_nodes, p_, s_, x_, x2_, c_))
            x, added, seg_state, heads = fn(params, state, x, x2, cache)
        else:
            x, added, seg_state, heads = fn(seg_nodes, params, state, x, x2,
                                            cache)
        cache.update(added)
        new_state.update(seg_state)
        raw_heads.extend(heads)

    if train:
        merged = dict(state)
        merged.update(new_state)
        return raw_heads, merged

    decoded = []
    for head, node in zip(raw_heads, ir.head_nodes()):
        decoded.append(decode_head(head, node.anchors, node.yolo_stride,
                                   node.bf_type))
    return (jnp.concatenate(decoded, axis=1), raw_heads), state


# ----------------------------------------------------------- inference folding

def fold_batchnorm(ir: GraphIR, variables: dict) -> dict:
    """Fold BN statistics into conv weights/biases for inference.

    Returns a new variables dict where every BN'd conv (incl. the two convs in
    each depthwise-separable block and all inception branch convs) carries a
    fused kernel + bias; ``apply_folded`` consumes it. The fusion removes one
    full elementwise pass over every activation map — pure HBM-bandwidth win.
    """
    params = jax.tree.map(lambda a: a, variables["params"])  # shallow copy
    state = variables["state"]

    def fold(conv_p, bn_state):
        scale = conv_p["bn"]["scale"] / jnp.sqrt(bn_state["var"] + L.BN_EPS)
        w = conv_p["w"] * scale  # broadcast over HWIO's O axis
        b = conv_p["bn"]["bias"] - bn_state["mean"] * scale
        return {"w": w, "b": b}

    for node in ir.nodes:
        key = f"l{node.index}"
        if node.kind == "conv" and node.bn:
            params[key] = fold(params[key], state[key])
        elif node.kind == "dwconv":
            params[key] = {"dw": fold(params[key]["dw"], state[key]["dw"]),
                           "pw": fold(params[key]["pw"], state[key]["pw"])}
        elif node.kind == "inception":
            params[key] = {name: fold(params[key][name], state[key][name])
                           for name in params[key]}
    return {"params": params, "state": {}}


# Concat-elimination rewrite (opt-in, DYK_SPLIT_CONCAT_CONV=1): a conv whose
# input is a freshly-built route concat can instead sum partial convs over the
# segments with input-channel-split weights — conv(concat(a, b), W) ==
# conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:]) — skipping the concat
# materialization (one full HBM write + read of the merged map).
_SPLIT_CONCAT_CONV = os.environ.get("DYK_SPLIT_CONCAT_CONV", "0") != "0"

# Stem fusion (default ON, DYK_FUSE_STEM=0 to disable): each stream's
# first two convs (3x3 s1 on the 3-ch image, then 3x3 s2) are rewritten
# into the space-to-depth pair L.fused_stem_pair — measured 2.8x faster on
# v5e (the thin-channel stems otherwise dominate the forward; see
# layers.fused_stem_pair docstring).
_FUSE_STEM = os.environ.get("DYK_FUSE_STEM", "1") != "0"


def stem_fusion_pairs(ir: GraphIR) -> dict:
    """Map {first conv index -> second conv index} of fusible stem pairs."""
    pairs = {}
    for n1 in ir.nodes:
        if not (n1.kind == "conv" and n1.kernel == 3 and n1.stride == (1, 1)
                and n1.pad == 1 and n1.groups == 1
                and (n1.index == 0 or n1.takes_second_input)
                and n1.index not in ir.consumed
                and n1.index + 1 < len(ir.nodes)):
            continue
        n2 = ir.nodes[n1.index + 1]
        if (n2.kind == "conv" and n2.kernel == 3 and n2.stride == (2, 2)
                and n2.pad == 1 and n2.groups == 1
                and not n2.takes_second_input and n2.in_ch == n1.out_ch):
            pairs[n1.index] = n2.index
    return pairs


# s2d-basis regions (default ON, DYK_S2D_REGION=0 to disable): thin-channel
# high-resolution stages (out_ch < 128) run in a phase-minor space-to-depth
# basis so every conv keeps >= 128 lanes — see layers.s2d_conv. Planned per
# (ir, input size); exact rewrite.
_S2D_REGION = os.environ.get("DYK_S2D_REGION", "1") != "0"

# Training-path s2d (opt-in, DYK_S2D_TRAIN=1): graph.apply runs the same
# thin-channel regions in the s2d basis — including the stem pair as an e3
# entry + x3 exit — with phase-pooled BatchNorm statistics (exact same
# math and state shapes; see layers.batch_norm phases=4). Transforms happen
# at trace time, so gradients flow to the untransformed kernels and the
# optimizer/EMA/checkpoints are unaffected. Ships OFF: A/B on v5e (flagship
# bs8 fwd+bwd) measured only ~2% — the backward pass is not stem-bound —
# so the default avoids extra compile time on the training path.
_S2D_TRAIN = (os.environ.get("DYK_S2D_TRAIN", "0") == "1") and _S2D_REGION

_S2D_OK_ACTS = None          # all activations are elementwise -> basis-safe


def s2d_candidates(ir: GraphIR) -> set:
    """Shape-independent superset of every possible s2d_plan(ir, h, w) key:
    standard thin-output convs of the three transformable geometries. Used
    by quantize() to keep fp kernels alongside int8 ones so apply_quantized
    can transform-then-quantize at trace time."""
    out = set()
    for n in ir.nodes:
        if n.kind != "conv" or n.groups != 1:
            continue
        k1 = n.kernel == 1 and n.stride == (1, 1)
        k3s1 = n.kernel == 3 and n.stride == (1, 1) and n.pad == 1
        k3s2 = n.kernel == 3 and n.stride == (2, 2) and n.pad == 1
        if k1 or k3s1 or k3s2:
            # any of these geometries can appear in a plan: k1/k3s1 as
            # entries (out_ch < 128) OR as region-internal convs (any
            # out_ch — a region stays open until its stride-2 exit), and
            # every k3s2 is a potential exit
            out.add(n.index)
    return out


def s2d_plan(ir: GraphIR, h: int, w: int,
             exclude_stems: bool = True) -> dict:
    """{conv index -> role} for thin-channel stages run in the s2d basis.

    Roles (layers._s2d_w): e1/e3 enter the basis (plain input), i1/i3 stay
    inside, x3 (a 3x3 stride-2 conv) exits back to plain NHWC for free.
    A region opens at a conv whose output is thin (out_ch < 128) and
    spatially even, and must close at an x3 exit; anything the basis can't
    carry (pools, SE, heads, odd shapes, cross-region cache references)
    unwinds the open region to plain. Regions whose members are cache-read
    from outside the region are dropped in a fixpoint pass."""
    from ..config.ir import infer_shapes

    shapes = infer_shapes(ir, h, w)
    stem_nodes = set()
    if exclude_stems and _FUSE_STEM:
        # inference path: the fused stem pair handles these two convs; the
        # training path passes exclude_stems=False and the planner covers
        # them as a plain e3 entry + x3 exit instead
        sp = stem_fusion_pairs(ir)
        stem_nodes = set(sp) | set(sp.values())

    plan: dict[int, str] = {}
    basis: dict[int, str] = {}          # node idx -> output basis 'p'|'s'
    regions: list[set] = []
    open_nodes: list[int] = []          # nodes marked 's' in the open region
    cur = "p"

    def unwind():
        nonlocal cur
        for j in open_nodes:
            basis[j] = "p"
            plan.pop(j, None)
        open_nodes.clear()
        cur = "p"

    def want_s2d(node) -> bool:
        c, hh, ww = shapes[node.index]
        if node.index == 0 or node.takes_second_input:
            ih, iw = h, w               # reads the raw image, not node i-1
        else:
            ih, iw = shapes[node.index - 1][1:]
        return (c < 128 and ih % 2 == 0 and iw % 2 == 0
                and hh * ww >= 32 * 32)

    for node in ir.nodes:
        i, kind = node.index, node.kind
        if kind == "conv":
            inb = "p" if node.takes_second_input else cur
            simple = node.groups == 1 and i not in stem_nodes
            k1 = simple and node.kernel == 1 and node.stride == (1, 1)
            k3s1 = (simple and node.kernel == 3 and node.stride == (1, 1)
                    and node.pad == 1)
            k3s2 = (simple and node.kernel == 3 and node.stride == (2, 2)
                    and node.pad == 1)
            # NB a takes_second_input conv reads the plain LWIR image
            # (inb='p') regardless of the running visible-stream basis; if
            # it opens a region, `cur` correctly moves to its own output
            if inb == "s":
                if k3s2:                      # exit back to plain
                    plan[i] = "x3"
                    basis[i] = "p"
                    cur = "p"
                    regions.append(set(open_nodes) | {i})
                    open_nodes.clear()
                elif k1 or k3s1:              # stay in the basis
                    plan[i] = "i1" if k1 else "i3"
                    basis[i] = "s"
                    open_nodes.append(i)
                else:                          # basis can't carry this conv
                    unwind()
                    basis[i] = "p"
            elif (k1 or k3s1) and want_s2d(node):
                plan[i] = "e1" if k1 else "e3"  # open a region
                basis[i] = "s"
                cur = "s"
                open_nodes.append(i)
            else:
                basis[i] = "p"
                cur = "p"
        elif kind == "route":
            bs = {basis.get(j, "p") for j in node.inputs}
            if len(bs) == 1:
                basis[i] = bs.pop()
                cur = basis[i]
                if cur == "s":
                    open_nodes.append(i)
            else:                              # mixed-basis concat
                unwind()
                basis[i] = "p"
        elif kind == "shortcut":
            bs = {cur} | {basis.get(j, "p") for j in node.inputs}
            if len(bs) == 1:
                basis[i] = cur
                if cur == "s":
                    open_nodes.append(i)
            else:
                unwind()
                basis[i] = "p"
        elif kind == "dropout":
            basis[i] = cur
            if cur == "s":
                open_nodes.append(i)
        else:                                  # pools/SE/upsample/yolo/...
            if cur == "s":
                unwind()
            basis[i] = "p"
            cur = "p"
    if open_nodes:
        unwind()

    # fixpoint: drop regions with cache-consumers outside themselves, AND
    # cascade — a region whose member routes/shortcuts consumed an 's'
    # output of a now-dropped region would receive a plain C-channel tensor
    # against 4C-basis plan roles (loud trace-time channel mismatch), so it
    # must unwind too
    consumers: dict[int, set] = {}
    for n in ir.nodes:
        for j in n.inputs:
            consumers.setdefault(j, set()).add(n.index)
    dropped_s: set[int] = set()
    changed = True
    while changed:
        changed = False
        for r in regions:
            if not r:
                continue
            sset = {j for j in r if basis.get(j) == "s"}
            outside = any(c not in r
                          for j in sset for c in consumers.get(j, ()))
            reads_dropped = any(j in dropped_s
                                for m in r for j in ir.nodes[m].inputs)
            if outside or reads_dropped:
                dropped_s |= sset
                for j in r:
                    basis[j] = "p"
                    plan.pop(j, None)
                r.clear()
                changed = True
    return plan


def s2d_basis(ir: GraphIR, plan: dict) -> dict:
    """{node index -> 'p'|'s'} output basis under a given s2d plan (the same
    flow rules the planner/executor use; parameter-free simulation)."""
    basis: dict = {}
    cur = "p"
    for n in ir.nodes:
        i, k = n.index, n.kind
        if k == "conv":
            role = plan.get(i)
            cur = "s" if role in ("e1", "e3", "i1", "i3") else "p"
        elif k == "route":
            bs = {basis.get(j, "p") for j in n.inputs}
            cur = bs.pop() if len(bs) == 1 else "p"
        elif k in ("shortcut", "dropout", "yolo"):
            pass                       # keeps the running basis
        else:
            cur = "p"
        basis[i] = cur
    return basis


def prepare_folded(ir: GraphIR, variables: dict, h: int, w: int) -> dict:
    """Precompute the basis-transformed kernels for a fixed deployment size.

    The stem-pair and s2d-region weight transforms are chains of
    .at[].set edits; with params as jit *arguments* XLA cannot constant-
    fold them, so un-prepared inference re-runs ~6 ms of serial weight
    edits per call (profiled, flagship bs16). This pass runs them once —
    jit it over the folded params like fold_batchnorm — storing "wb"/"w2s"
    on stem pairs and "wt"/"bt" on planned convs; apply_folded picks the
    precomputed entries up when present (shape-checked against the active
    plan's role, so a mismatched prepare size falls back to inline)."""
    out = {k: v for k, v in variables.items() if k != "params"}
    params = {k: dict(v) for k, v in variables["params"].items()}
    if _FUSE_STEM:
        for i, j in stem_fusion_pairs(ir).items():
            p1, p2 = params[f"l{i}"], params[f"l{j}"]
            wb, w2s = L.stem_pair_weights(p1["w"], p2["w"])
            p1["wb"], p2["w2s"] = wb, w2s
    if _S2D_REGION:
        for i, role in s2d_plan(ir, h, w).items():
            p = params[f"l{i}"]
            p["wt"] = L._s2d_w(p["w"], role)
            p["bt"] = p["b"] if role == "x3" else jnp.repeat(p["b"], 4)
    out["params"] = params
    return out


_S2D_KSHAPE = {"e1": 2, "e3": 4, "i1": 1, "i3": 3, "x3": 2}


def apply_folded(ir: GraphIR, variables: dict, xv, xl=None, *,
                 compute_dtype=None):
    """Inference forward on BN-folded params (see :func:`fold_batchnorm`)."""
    params = variables["params"]
    dtype = compute_dtype or xv.dtype
    x = xv.astype(dtype)
    x2 = None if xl is None else xl.astype(dtype)
    if ir.dual_stream and x2 is None:
        raise ValueError("dual-stream graph requires the LWIR input xl")

    cache: dict[int, jnp.ndarray] = {}
    raw_heads, decoded = [], []

    def cba(inp, p, node, act):
        if isinstance(inp, list):  # deferred route concat -> split-weight sum
            y, c0 = None, 0
            for seg in inp:
                w = p["w"][:, :, c0:c0 + seg.shape[-1], :]
                part = L.conv2d(seg, w, stride=node.stride, pad=node.pad)
                y = part if y is None else y + part
                c0 += seg.shape[-1]
        else:
            y = L.conv2d(inp, p["w"], stride=node.stride, pad=node.pad,
                         groups=node.groups)
        y = y + p["b"].astype(y.dtype)
        return L.activate(act, y.astype(dtype))

    def _defer_concat(node) -> bool:
        """Route concats feeding exactly one standard conv stay unmaterialized."""
        nxt = (ir.nodes[node.index + 1]
               if node.index + 1 < len(ir.nodes) else None)
        return (_SPLIT_CONCAT_CONV and len(node.inputs) > 1
                and node.index not in ir.consumed
                and nxt is not None and nxt.kind == "conv"
                and nxt.groups == 1 and not nxt.takes_second_input)

    stem_pairs = stem_fusion_pairs(ir) if _FUSE_STEM else {}
    plan = (s2d_plan(ir, xv.shape[1], xv.shape[2])
            if _S2D_REGION and not _SPLIT_CONCAT_CONV else {})
    skip: set[int] = set()
    for node in ir.nodes:
        key = f"l{node.index}"
        kind = node.kind
        p = params.get(key)
        if node.index in skip:
            pass                     # second half of a fused stem pair
        elif kind == "conv":
            inp = x2 if node.takes_second_input else x
            if (node.index in stem_pairs and inp.shape[1] % 2 == 0
                    and inp.shape[2] % 2 == 0):
                n2 = ir.nodes[stem_pairs[node.index]]
                p2 = params[f"l{n2.index}"]
                x = L.fused_stem_pair(inp, p["w"], p["b"], node.act,
                                      p2["w"], p2["b"], n2.act,
                                      wb=p.get("wb"), w2s=p2.get("w2s"))
                skip.add(n2.index)
            elif node.index in plan:
                role = plan[node.index]
                wt, bt = p.get("wt"), p.get("bt")
                if wt is not None and wt.shape[0] != _S2D_KSHAPE[role]:
                    wt = bt = None     # prepared for a different plan
                x = L.s2d_conv(inp, p["w"], p["b"], node.act, role, dtype,
                               wt=wt, bt=bt)
            else:
                x = cba(inp, p, node, node.act)
        elif kind == "dwconv":
            y = L.conv2d(x, p["dw"]["w"], stride=node.stride, pad=1,
                         groups=node.in_ch)
            y = L.activate("relu6", (y + p["dw"]["b"]).astype(dtype))
            y = L.conv2d(y, p["pw"]["w"])
            x = L.activate("relu6", (y + p["pw"]["b"]).astype(dtype))
        elif kind == "se":
            x = L.squeeze_excitation(x, p)
        elif kind == "inception":
            def branch(inp, name, pad=0):
                y = L.conv2d(inp, p[name]["w"], pad=pad)
                return L.activate("leaky", (y + p[name]["b"]).astype(dtype))
            b1 = branch(x, "b1_1")
            b2 = branch(branch(x, "b2_1"), "b2_2", 1)
            b3 = branch(branch(branch(x, "b3_1"), "b3_2", 1), "b3_3", 1)
            b4 = branch(L.max_pool(x, 3, (1, 1), 1), "b4_1")
            x = jnp.concatenate([b1, b2, b3, b4], axis=-1)
        elif kind == "maxpool":
            x = L.max_pool(x, node.kernel, node.stride, node.pad)
        elif kind == "avgpool":
            x = L.adaptive_avg_pool(x, node.out_size)
        elif kind == "upsample":
            x = L.upsample_nearest(x, node.scale)
        elif kind == "route":
            feats = [cache[j] for j in node.inputs]
            if len(feats) == 1:
                x = feats[0]
            elif _defer_concat(node):
                x = feats          # consumed (only) by the next conv's cba
            else:
                x = jnp.concatenate(feats, axis=-1)
        elif kind == "shortcut":
            extras = [cache[j] for j in node.inputs]
            x = L.weighted_fusion(x, extras, p["w"] if node.weighted else None)
        elif kind == "dropout":
            pass
        elif kind == "yolo":
            na, no = len(node.anchors), node.nc + 5
            raw = reshape_head(x, na, no)
            raw_heads.append(raw)
            decoded.append(decode_head(raw, node.anchors, node.yolo_stride,
                                       node.bf_type))
        if node.index in ir.consumed:
            cache[node.index] = x

    return jnp.concatenate(decoded, axis=1), raw_heads


def count_params(variables: dict) -> int:
    """Trainable parameter count (BN running stats are buffers, not counted —
    same convention as torch's ``Module.parameters()``)."""
    return int(sum(np.prod(l.shape)
                   for l in jax.tree.leaves(variables["params"])))
