"""Weight importers: torch ``.pt`` checkpoints and darknet ``.weights`` binaries.

Brings reference-trained weights into our params pytree for numerical parity
runs (reference checkpoint format: train.py:223-241; darknet binary layout:
models.py:318-364). Layout conversion: torch conv kernels are OIHW, ours are
HWIO; 1x1 "fc" convs in SE keep the same transpose.
"""

from __future__ import annotations

import numpy as np

from ..config.ir import GraphIR


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
              "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    state = {"mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
             "var": np.asarray(sd[f"{prefix}.running_var"], np.float32)}
    return params, state


def _cba(sd, conv_key, bn_key):
    p = {"w": _oihw_to_hwio(np.asarray(sd[f"{conv_key}.weight"], np.float32))}
    p["bn"], s = _bn(sd, bn_key)
    return p, s


def from_torch_state_dict(ir: GraphIR, sd: dict) -> dict:
    """Convert a reference ``model.state_dict()`` (tensors or numpy arrays,
    keys as produced by reference models.py:create_modules) into
    {"params", "state"} for :mod:`..models.graph`."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    params: dict[str, dict] = {}
    state: dict[str, dict] = {}

    for node in ir.nodes:
        i, kind = node.index, node.kind
        key = f"l{i}"
        base = f"module_list.{i}"
        if kind == "conv":
            p = {"w": _oihw_to_hwio(np.asarray(
                sd[f"{base}.Conv2d.weight"], np.float32))}
            if node.bn:
                p["bn"], state[key] = _bn(sd, f"{base}.BatchNorm2d")
            else:
                p["b"] = np.asarray(sd[f"{base}.Conv2d.bias"], np.float32)
            params[key] = p
        elif kind == "dwconv":
            # reference DepthwiseSeparableConv2d: conv.0 dw / conv.1 BN /
            # conv.3 pw / conv.4 BN (layers.py:222-231)
            dw, s_dw = _cba(sd, f"{base}.conv.0", f"{base}.conv.1")
            pw, s_pw = _cba(sd, f"{base}.conv.3", f"{base}.conv.4")
            params[key] = {"dw": dw, "pw": pw}
            state[key] = {"dw": s_dw, "pw": s_pw}
        elif kind == "se":
            params[key] = {
                "fc1": {"w": _oihw_to_hwio(np.asarray(
                            sd[f"{base}.fc1.weight"], np.float32)),
                        "b": np.asarray(sd[f"{base}.fc1.bias"], np.float32)},
                "fc2": {"w": _oihw_to_hwio(np.asarray(
                            sd[f"{base}.fc2.weight"], np.float32)),
                        "b": np.asarray(sd[f"{base}.fc2.bias"], np.float32)},
            }
        elif kind == "inception":
            # branch module paths per reference layers.py:148-169; each
            # ConvBnActivation holds conv at .conv.0 and BN at .conv.1
            paths = {"b1_1": "branch1.0", "b2_1": "branch2.0",
                     "b2_2": "branch2.1", "b3_1": "branch3.0",
                     "b3_2": "branch3.1", "b3_3": "branch3.2",
                     "b4_1": "branch4.1"}
            params[key], state[key] = {}, {}
            for name, path in paths.items():
                params[key][name], state[key][name] = _cba(
                    sd, f"{base}.{path}.conv.0", f"{base}.{path}.conv.1")
        elif kind == "shortcut" and node.weighted:
            params[key] = {"w": np.asarray(sd[f"{base}.w"], np.float32)}

    return {"params": params, "state": state}


def from_torch_checkpoint(ir: GraphIR, path: str) -> dict:
    """Load a reference ``.pt`` checkpoint ({'model': state_dict, ...},
    reference train.py:225-231) without needing torch at inference time if the
    file was re-saved; requires torch to unpickle original checkpoints."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return from_torch_state_dict(ir, sd)


def from_darknet_weights(ir: GraphIR, path: str, cutoff: int = -1) -> dict:
    """Read a darknet ``.weights`` binary (3x int32 header + int64 seen +
    fp32 stream; per BN-conv: bn bias/weight/mean/var then conv weight, per
    plain conv: bias then weight — reference models.py:318-364). Returns
    partial {"params", "state"} covering conv layers up to ``cutoff``."""
    with open(path, "rb") as f:
        np.fromfile(f, dtype=np.int32, count=3)   # version
        np.fromfile(f, dtype=np.int64, count=1)   # images seen
        stream = np.fromfile(f, dtype=np.float32)

    ptr = 0

    def take(n):
        nonlocal ptr
        out = stream[ptr:ptr + n]
        ptr += n
        return out

    params: dict[str, dict] = {}
    state: dict[str, dict] = {}
    nodes = ir.nodes if cutoff < 0 else ir.nodes[:cutoff]
    for node in nodes:
        if node.kind != "conv":
            continue
        key = f"l{node.index}"
        co, ci, k = node.out_ch, node.in_ch // node.groups, node.kernel
        p: dict = {}
        if node.bn:
            b = take(co); w = take(co); mean = take(co); var = take(co)
            p["bn"] = {"scale": w.copy(), "bias": b.copy()}
            state[key] = {"mean": mean.copy(), "var": var.copy()}
        else:
            p["b"] = take(co).copy()
        p["w"] = _oihw_to_hwio(take(co * ci * k * k).reshape(co, ci, k, k))
        params[key] = p
    return {"params": params, "state": state}


def merge_variables(base: dict, loaded: dict) -> dict:
    """Overlay loaded (possibly partial) variables onto an initialized set —
    the tolerant-load semantics of reference train.py:102-104."""
    out = {"params": dict(base["params"]), "state": dict(base["state"])}
    out["params"].update(loaded["params"])
    out["state"].update(loaded["state"])
    return out
