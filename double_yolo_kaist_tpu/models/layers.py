"""Functional JAX op library (NHWC) for the cfg layer zoo.

Pure-function equivalents of the reference's ``build_utils/layers.py`` +
``models.py:create_modules`` module set: conv+BN+activation, depthwise-separable
conv (layers.py:218-234), squeeze-excitation (layers.py:175-190), inception
(layers.py:148-172), maxpool/avgpool/upsample, feature concat (layers.py:32-44)
and (weighted) feature fusion (layers.py:47-85).

Design: NHWC layout (TPU-native; XLA tiles channels-last convs straight onto the
MXU), fp32 parameters with an optional bf16 compute dtype, BatchNorm carried as
separate mutable state ``{mean, var}`` so the apply function stays pure. Numeric
conventions (activation definitions, BN eps=1e-5, hard-sigmoid = relu6(x+3)/6)
match torch so that weights imported from the reference reproduce its outputs.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch convention: new = (1-m)*old + m*batch

# Global MXU/conv precision. JAX's default ("fastest") runs fp32 convs as
# single-pass bf16 on the MXU — right for throughput, ~1e-3 relative error.
# Parity tests and fp32 reference runs set HIGHEST via set_precision().
_PRECISION = None


def set_precision(p):
    """Set conv/matmul precision globally (None | 'high' | 'highest' |
    jax.lax.Precision). Returns the previous value."""
    global _PRECISION
    prev = _PRECISION
    _PRECISION = p
    return prev


# Conv output dtype override. None (default) = match the input dtype: the
# MXU accumulates fp32 internally either way, and a same-dtype output keeps
# the conv transpose (backward pass) dtype-consistent under bf16 training.
# Set to jnp.float32 to force full-precision conv outputs on inference paths.
_CONV_OUT_DTYPE = None


def set_conv_out_dtype(dtype):
    global _CONV_OUT_DTYPE
    prev = _CONV_OUT_DTYPE
    _CONV_OUT_DTYPE = dtype
    return prev


# ----------------------------------------------------------------- activations

def _softplus(x):
    """max(x,0) + log1p(exp(-|x|)) — identical to jax.nn.softplus for all
    finite AND infinite x, minus its NaN-propagation select. That select
    (``where(x != x, x, ...)``) survives into the compiled flagship as
    packed-u32 isnan masks shuttled between fusions (profiled at ~1 ms per
    head-scale mish cluster on v5e); activations on finite weights never
    see NaNs, and even a NaN input still yields NaN here (max propagates
    it), so dropping the select is behavior-preserving in practice."""
    return jnp.maximum(x, 0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _mish(x):
    """mish(x) = x * tanh(softplus(x)).

    NB: an algebraically exact single-exp reformulation
    (x * (u^2+2u)/(u^2+2u+2), u=e^x) was A/B-tested on v5e and is ~20%
    SLOWER end-to-end — XLA's fused tanh/softplus lowering beats the extra
    select/divide traffic. Keep the canonical form."""
    return x * jnp.tanh(_softplus(x))


def _hard_sigmoid(x):
    return jnp.clip((x + 3.0) / 6.0, 0.0, 1.0)


ACTIVATIONS = {
    "linear": lambda x: x,
    # max(x, 0.1x) == leaky_relu(x, 0.1) exactly (0.1 > 0, and max
    # propagates NaN like the where did), but compiles select-free: the
    # where's pred mask otherwise crosses XLA fusion boundaries as packed
    # u32 reduce_or words (profiled ~1 ms per head-scale cluster)
    "leaky": lambda x: jnp.maximum(x, 0.1 * x),
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "mish": _mish,
    "hard-sigmoid": _hard_sigmoid,
    "hard-swish": lambda x: x * _hard_sigmoid(x),
}


def activate(name: str, x):
    return ACTIVATIONS[name](x)


# ------------------------------------------------------------- initialization

def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch Conv2d default: kaiming_uniform_(a=sqrt(5)) => U(+-sqrt(1/fan_in))
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_conv(key, kernel: int, in_ch: int, out_ch: int, groups: int = 1,
              bias: bool = False) -> dict:
    """HWIO conv kernel (+optional bias), torch-default init."""
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel * kernel
    p = {"w": _kaiming_uniform(kw, (kernel, kernel, in_ch // groups, out_ch),
                               fan_in)}
    if bias:
        p["b"] = _kaiming_uniform(kb, (out_ch,), fan_in)
    return p


def init_bn(ch: int) -> tuple[dict, dict]:
    params = {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}
    state = {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}
    return params, state


# ------------------------------------------------------------------- conv ops

def conv2d(x, w, stride=(1, 1), pad: int = 0, groups: int = 1):
    """NHWC x HWIO grouped conv; accumulates in fp32 on the MXU."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=_PRECISION,
        preferred_element_type=_CONV_OUT_DTYPE,
    )


def stem_pair_weights(w1, w2):
    """(3,3,C,O1) + (3,3,O1,O2) -> the fused pair's kernels: the 4x4
    stride-2 s2d-absorbing Wb (phase-major out) and the 2x2 stride-1 W2s
    consuming that basis (see fused_stem_pair)."""
    O1, O2 = w1.shape[-1], w2.shape[-1]
    wb = jnp.zeros((4, 4, w1.shape[2], 4 * O1), w1.dtype)
    for p in range(2):
        for q in range(2):
            wb = wb.at[p:p + 3, q:q + 3, :,
                       (2 * p + q) * O1:(2 * p + q + 1) * O1].set(w1)
    w2s = jnp.zeros((2, 2, 4 * O1, O2), w2.dtype)
    for di in range(3):
        for dj in range(3):
            u, p = divmod(di - 1, 2)
            v, q = divmod(dj - 1, 2)
            w2s = w2s.at[u + 1, v + 1,
                         (2 * p + q) * O1:(2 * p + q + 1) * O1, :].set(
                w2[di, dj])
    return wb, w2s


def fused_stem_pair(x, w1, b1, act1, w2, b2, act2, *, wb=None, w2s=None):
    """Space-to-depth fused stem: conv(3x3 s1 p1, C->O1)+act1 followed by
    conv(3x3 s2 p1, O1->O2)+act2 in one pass, with no full-resolution O1
    feature map ever touching HBM *in its thin-channel layout*.

    Why: the twin low-channel stems (reference cfg layers 0-1 of each
    stream) dominate the flagship forward under XLA — C_in=3/C=32 fill a
    fraction of the MXU/VPU lanes, and XLA inserts multi-ms relayout copies
    around them. Exact rewrite (A/B-measured 2.8x on v5e, bs16 512x640:
    2.33 ms vs 6.59 ms for the pair):

      * conv1 absorbs a space-to-depth(2): y1s[r,j,(2p+q)*O1+o] =
        y1[2r+p, 2j+q, o] computed directly as a 4x4 stride-2 conv on x
        with block-embedded weights Wb[p:p+3, q:q+3, :, (2p+q)*O1] = w1 —
        dense 128-channel output, no transpose op at all;
      * conv2 (3x3 s2) becomes a 2x2 stride-1 conv over y1s with
        phase-scattered weights (its 3x3 taps land on s2d rows/cols
        u,v in {-1,0}), already producing standard NHWC output.

    Any elementwise activations are applied in the s2d basis (exact).
    Requires even H and W; the caller checks.
    """
    dt = x.dtype
    if wb is None or w2s is None:
        wb, w2s = stem_pair_weights(w1, w2)
    b1s = jnp.tile(b1, 4)
    y1 = jax.lax.conv_general_dilated(
        x, wb.astype(dt), (2, 2), [(1, 2), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_PRECISION,
        preferred_element_type=_CONV_OUT_DTYPE)
    y1 = activate(act1, (y1 + b1s.astype(y1.dtype)).astype(dt))
    y2 = jax.lax.conv_general_dilated(
        y1, w2s.astype(dt), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_PRECISION,
        preferred_element_type=_CONV_OUT_DTYPE)
    return activate(act2, (y2 + b2.astype(y2.dtype)).astype(dt))


# --------------------------------------------------- s2d-basis conv variants
#
# Generalization of fused_stem_pair to whole thin-channel stages: tensors
# inside a planned region (graph.s2d_plan) live in a PHASE-MINOR
# space-to-depth basis — (B, H/2, W/2, 4C) with channel index 4c + (2p+q),
# p/q the row/col phase. Phase-minor is the key invariant: concatenation
# and leading-channel slicing (the Add-SL fusion rule) act on it exactly
# like on plain channels, so routes/shortcuts need no changes. Only convs
# transform, by role:
#   e1: 1x1 s1 conv entering the basis  -> 2x2 s2 conv, C  -> 4O
#   e3: 3x3 s1 p1 conv entering         -> 4x4 s2 conv (p 1,1), C -> 4O
#   i1: 1x1 s1 inside                   -> 1x1 conv, kron(w, I4)
#   i3: 3x3 s1 p1 inside                -> 3x3 s1 p1 conv, 4C -> 4O
#   x3: 3x3 s2 p1 conv exiting to plain -> 2x2 s1 conv (p (1,0),(1,0))
# All are exact rewrites (tests/test_stem_fusion.py); they keep every
# lane-dim >= 128 on the thin stages where XLA otherwise runs at a
# fraction of HBM bandwidth.

def _s2d_w(w, role):
    """Transform an HWIO kernel into its s2d-basis equivalent (see above)."""
    C, O = w.shape[2], w.shape[3]
    if role == "i1":
        return jnp.kron(w[0, 0], jnp.eye(4, dtype=w.dtype))[None, None]
    if role == "e1":
        m = jnp.zeros((2, 2, C, 4 * O), w.dtype)
        for p in range(2):
            for q in range(2):
                m = m.at[p, q, :, (2 * p + q)::4].set(w[0, 0])
        return m
    if role == "e3":
        m = jnp.zeros((4, 4, C, 4 * O), w.dtype)
        for p in range(2):
            for q in range(2):
                m = m.at[p:p + 3, q:q + 3, :, (2 * p + q)::4].set(w)
        return m
    if role == "i3":
        m = jnp.zeros((3, 3, 4 * C, 4 * O), w.dtype)
        for p in range(2):
            for q in range(2):
                for di in range(3):
                    for dj in range(3):
                        u, pp = divmod(p + di - 1, 2)
                        v, qq = divmod(q + dj - 1, 2)
                        m = m.at[u + 1, v + 1, (2 * pp + qq)::4,
                                 (2 * p + q)::4].set(w[di, dj])
        return m
    if role == "x3":
        m = jnp.zeros((2, 2, 4 * C, O), w.dtype)
        for di in range(3):
            for dj in range(3):
                u, p = divmod(di - 1, 2)
                v, q = divmod(dj - 1, 2)
                m = m.at[u + 1, v + 1, (2 * p + q)::4, :].set(w[di, dj])
        return m
    raise ValueError(f"unknown s2d role {role!r}")


_S2D_GEOM = {                      # role -> (stride, ((pt, pb), (pl, pr)))
    "e1": (2, ((0, 0), (0, 0))),
    "e3": (2, ((1, 1), (1, 1))),
    "i1": (1, ((0, 0), (0, 0))),
    "i3": (1, ((1, 1), (1, 1))),
    "x3": (1, ((1, 0), (1, 0))),
}


def s2d_conv(x, w, b, act, role, dtype=None, *, wt=None, bt=None):
    """Execute one planned conv in the s2d basis (+bias+activation).

    ``wt``/``bt``: optionally precomputed transformed kernel/bias (see
    graph.prepare_folded — the .at[].set weight edits are serial
    device ops when params are jit arguments, so production inference
    hoists them out of the per-call program)."""
    dtype = dtype or x.dtype
    if wt is None:
        wt = _s2d_w(w, role)
    s, pad = _S2D_GEOM[role]
    y = jax.lax.conv_general_dilated(
        x, wt.astype(x.dtype), (s, s), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_PRECISION,
        preferred_element_type=_CONV_OUT_DTYPE)
    if bt is None:
        bt = b if role == "x3" else jnp.repeat(b, 4)
    return activate(act, (y + bt.astype(y.dtype)).astype(dtype))


def _at_least_f32(x):
    """Cast to fp32 unless the input is already wider (float64): statistics
    and attention paths compute in fp32 minimum, but fp64 parity runs
    (tests/test_grad_parity.py under jax_enable_x64) must not silently
    truncate — that would put an fp32 noise floor under a double-precision
    reference comparison."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def batch_norm(x, params, state, train: bool, axis_name: str | None = None,
               phases: int = 1):
    """BatchNorm2d. In train mode returns (y, new_state) with batch statistics
    optionally synchronized across ``axis_name`` (cross-replica mean via psum —
    the TPU-mesh replacement for the reference's per-GPU BN).

    ``phases``: 4 when ``x`` is a phase-minor s2d tensor (B,H/2,W/2,4C) —
    statistics pool over the phase replicas so they equal the plain-basis
    per-channel stats exactly, and the returned running state stays
    C-shaped (checkpoints/EMA/optimizer see no difference)."""

    def pool(v):        # per-channel mean over batch/space (+phases)
        if phases == 1:
            return jnp.mean(v, axis=(0, 1, 2))
        vr = v.reshape(v.shape[:3] + (v.shape[3] // phases, phases))
        return jnp.mean(vr, axis=(0, 1, 2, 4))

    def bcast(v):
        return v if phases == 1 else jnp.repeat(v, phases)

    if train:
        xf = _at_least_f32(x)
        mean = pool(xf)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
        # two-pass variance: E[(x-mean)^2] avoids the E[x^2]-E[x]^2
        # cancellation that compounds across deep BN stacks
        var = pool(jnp.square(xf - bcast(mean)))
        if axis_name is not None:
            var = jax.lax.pmean(var, axis_name)
        n = x.shape[0] * x.shape[1] * x.shape[2] * phases
        if axis_name is not None:
            n = n * jax.lax.psum(1, axis_name)
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS) * params["scale"]
    y = ((_at_least_f32(x) - bcast(mean)) * bcast(inv)
         + bcast(params["bias"]))
    return y.astype(x.dtype), new_state


def conv_bn_act(x, params, state, *, stride=(1, 1), pad=0, groups=1,
                act="linear", bn=True, train=False, axis_name=None,
                s2d_role=None):
    """Conv + BN + activation; with ``s2d_role`` set, the conv runs in the
    phase-minor s2d basis (see s2d_conv) and BN pools phase statistics —
    exact same math, full lane occupancy for thin channels, and the param/
    state pytrees are untouched (transforms happen at trace time, so
    gradients flow to the original kernels)."""
    if s2d_role:
        wt = _s2d_w(params["w"], s2d_role)
        s, padp = _S2D_GEOM[s2d_role]
        y = jax.lax.conv_general_dilated(
            x, wt.astype(x.dtype), (s, s), padp,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_PRECISION,
            preferred_element_type=_CONV_OUT_DTYPE)
        phases = 1 if s2d_role == "x3" else 4
        if bn:
            y, state = batch_norm(y, params["bn"], state, train, axis_name,
                                  phases=phases)
        else:
            b = params["b"] if phases == 1 else jnp.repeat(params["b"], 4)
            y = y + b.astype(y.dtype)
        return activate(act, y.astype(x.dtype)), state
    y = conv2d(x, params["w"], stride=stride, pad=pad, groups=groups)
    if bn:
        y, state = batch_norm(y, params["bn"], state, train, axis_name)
    else:
        y = y + params["b"].astype(y.dtype)
    return activate(act, y.astype(x.dtype)), state


# ----------------------------------------------------- composite cfg layer ops

def depthwise_separable(x, params, state, *, stride=(1, 1), train=False,
                        axis_name=None):
    """3x3 depthwise + BN + ReLU6, then 1x1 pointwise + BN + ReLU6
    (reference layers.py:218-234)."""
    in_ch = x.shape[-1]
    y = conv2d(x, params["dw"]["w"], stride=stride, pad=1, groups=in_ch)
    y, s_dw = batch_norm(y, params["dw"]["bn"], state["dw"], train, axis_name)
    y = activate("relu6", y)
    y = conv2d(y, params["pw"]["w"], stride=(1, 1), pad=0)
    y, s_pw = batch_norm(y, params["pw"]["bn"], state["pw"], train, axis_name)
    y = activate("relu6", y)
    return y.astype(x.dtype), {"dw": s_dw, "pw": s_pw}


def squeeze_excitation(x, params):
    """Channel attention: GAP -> 1x1 -> relu -> 1x1 -> hard-sigmoid -> scale
    (reference layers.py:175-190). The pooled path is tiny — XLA fuses it; the
    two 1x1 convs on a 1x1 map are plain (1,C)x(C,S) matmuls."""
    pooled = jnp.mean(_at_least_f32(x), axis=(1, 2))            # (B, C)
    s = pooled @ params["fc1"]["w"].reshape(x.shape[-1], -1) + params["fc1"]["b"]
    s = jax.nn.relu(s)
    s = s @ params["fc2"]["w"].reshape(s.shape[-1], -1) + params["fc2"]["b"]
    s = _hard_sigmoid(s)
    return (x * s[:, None, None, :].astype(x.dtype))


def max_pool(x, kernel: int, stride=(1, 1), pad: int = 0):
    """torch MaxPool2d semantics: symmetric padding with -inf."""
    # -inf init lets JAX recognize the max monoid (reduce_window_max), which
    # is required for the reverse-mode gradient; finfo.min would silently
    # fall back to a generic (non-differentiable) reduce_window
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else np.asarray(jnp.iinfo(x.dtype).min, x.dtype)[()])
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _adaptive_bin_matrix(n: int, k: int):
    """(k, n) averaging matrix with torch AdaptiveAvgPool bin edges:
    bin i covers [floor(i*n/k), ceil((i+1)*n/k))."""
    import numpy as np

    a = np.zeros((k, n), np.float32)
    for i in range(k):
        lo, hi = (i * n) // k, -((-(i + 1) * n) // k)   # floor / ceil
        a[i, lo:hi] = 1.0 / (hi - lo)
    return jnp.asarray(a)


def adaptive_avg_pool(x, out_size: int):
    """AdaptiveAvgPool2d(output_size=k). Exact torch semantics for any
    (h, w): evenly dividing maps use the cheap reshape-mean; the general
    case contracts with static per-axis bin-average matrices (two small
    matmuls — shapes are static under jit, so this stays MXU-friendly)."""
    b, h, w, c = x.shape
    if out_size == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if h % out_size == 0 and w % out_size == 0:
        x = x.reshape(b, out_size, h // out_size, out_size, w // out_size, c)
        return x.mean(axis=(2, 4))
    ah = _adaptive_bin_matrix(h, out_size).astype(x.dtype)
    aw = _adaptive_bin_matrix(w, out_size).astype(x.dtype)
    # highest precision: bin weights like 1/3 must not round to bf16 on MXU
    y = jnp.einsum("ph,bhwc->bpwc", ah, x, precision="highest")
    return jnp.einsum("qw,bpwc->bpqc", aw, y, precision="highest")


def upsample_nearest(x, scale: int):
    return jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)


def inception(x, params, state, *, train=False, axis_name=None):
    """4-branch GoogLeNet block, all branch convs BN+leaky (reference
    layers.py:148-172 with ConvBnActivation defaults)."""
    def cba(name, inp, pad=0):
        return conv_bn_act(inp, params[name], state[name], stride=(1, 1),
                           pad=pad, act="leaky", bn=True, train=train,
                           axis_name=axis_name)

    new_state = {}
    b1, new_state["b1_1"] = conv_bn_act(
        x, params["b1_1"], state["b1_1"], act="leaky", train=train,
        axis_name=axis_name)
    y, new_state["b2_1"] = cba("b2_1", x)
    b2, new_state["b2_2"] = conv_bn_act(
        y, params["b2_2"], state["b2_2"], pad=1, act="leaky", train=train,
        axis_name=axis_name)
    y, new_state["b3_1"] = cba("b3_1", x)
    y, new_state["b3_2"] = conv_bn_act(
        y, params["b3_2"], state["b3_2"], pad=1, act="leaky", train=train,
        axis_name=axis_name)
    b3, new_state["b3_3"] = conv_bn_act(
        y, params["b3_3"], state["b3_3"], pad=1, act="leaky", train=train,
        axis_name=axis_name)
    y = max_pool(x, 3, (1, 1), 1)
    b4, new_state["b4_1"] = cba("b4_1", y)
    return jnp.concatenate([b1, b2, b3, b4], axis=-1), new_state


def weighted_fusion(x, extras: list, w=None):
    """Element-wise add of ``x`` with earlier outputs; optional learned sigmoid
    weights and the channel-slice rule for mismatched widths (reference
    layers.py:63-85)."""
    n = len(extras) + 1
    if w is not None:
        ws = jax.nn.sigmoid(_at_least_f32(w)) * (2.0 / n)
        x = x * ws[0].astype(x.dtype)
    nx = x.shape[-1]
    for i, a in enumerate(extras):
        if w is not None:
            a = a * ws[i + 1].astype(a.dtype)
        na = a.shape[-1]
        if nx == na:
            x = x + a
        elif nx > na:
            x = jnp.concatenate([x[..., :na] + a, x[..., na:]], axis=-1)
        else:
            x = x + a[..., :nx]
    return x


def dropout(x, p: float, rng):
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ------------------------------------------------------------ per-node params

def init_node_params(key, node) -> tuple[dict | None, dict | None]:
    """Create (params, bn_state) for one IR node; None when parameter-free."""
    kind = node.kind
    if kind == "conv":
        p = init_conv(key, node.kernel, node.in_ch, node.out_ch,
                      groups=node.groups, bias=not node.bn)
        s = None
        if node.bn:
            p["bn"], s = init_bn(node.out_ch)
        return p, s
    if kind == "dwconv":
        k1, k2 = jax.random.split(key)
        dw = init_conv(k1, node.kernel, node.in_ch, node.in_ch,
                       groups=node.in_ch)
        pw = init_conv(k2, 1, node.in_ch, node.out_ch)
        dw["bn"], s_dw = init_bn(node.in_ch)
        pw["bn"], s_pw = init_bn(node.out_ch)
        return {"dw": dw, "pw": pw}, {"dw": s_dw, "pw": s_pw}
    if kind == "se":
        k1, k2 = jax.random.split(key)
        return {"fc1": init_conv(k1, 1, node.in_ch, node.squeeze_ch, bias=True),
                "fc2": init_conv(k2, 1, node.squeeze_ch, node.in_ch, bias=True)
                }, None
    if kind == "inception":
        icp, c = node.icp, node.in_ch
        specs = {"b1_1": (1, c, icp["n1x1"]),
                 "b2_1": (1, c, icp["n3x3_reduce"]),
                 "b2_2": (3, icp["n3x3_reduce"], icp["n3x3"]),
                 "b3_1": (1, c, icp["n5x5_reduce"]),
                 "b3_2": (3, icp["n5x5_reduce"], icp["n5x5"]),
                 "b3_3": (3, icp["n5x5"], icp["n5x5"]),
                 "b4_1": (1, c, icp["pool_proj"])}
        keys = jax.random.split(key, len(specs))
        params, state = {}, {}
        for kk, (name, (ksz, ci, co)) in zip(keys, specs.items()):
            params[name] = init_conv(kk, ksz, ci, co)
            params[name]["bn"], state[name] = init_bn(co)
        return params, state
    if kind == "shortcut" and node.weighted:
        return {"w": jnp.zeros((len(node.inputs) + 1,))}, None
    return None, None
