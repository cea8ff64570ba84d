"""Darknet-dialect ``.cfg`` / ``.data`` / hyperparameter-YAML parsing.

Implements the same configuration dialect as the reference's
``build_utils/parse_config.py`` (parse_model_cfg: parse_config.py:5-65,
parse_data_cfg: parse_config.py:68-90), including this repo's custom extensions:
``second_index`` in ``[net]`` (dual-stream entry point), ``[se]``, ``[inception]``,
``[depthwiseconvolutional]`` blocks and the ``weights_type`` shortcut field.

Differences from the reference, on purpose:
  * numeric values are parsed with int-then-float fallback, so floats like
    ``probability = 0.5`` become numbers (the reference's ``str.isnumeric`` check,
    parse_config.py:46, leaves them as strings);
  * returns ``(net, blocks)`` instead of one list with the ``[net]`` dict at
    index 0.
"""

from __future__ import annotations

import os

import numpy as np

# every key that may appear in a block (reference parse_config.py:52-56)
SUPPORTED_FIELDS = frozenset({
    "type", "batch_normalize", "filters", "size", "stride", "pad", "activation",
    "layers", "groups", "from", "mask", "anchors", "classes", "num", "jitter",
    "ignore_thresh", "truth_thresh", "random", "stride_x", "stride_y",
    "weights_type", "weights_normalization", "scale_x_y", "beta_nms", "nms_kind",
    "iou_loss", "iou_normalizer", "cls_normalizer", "iou_thresh", "probability",
    "max_delta", "atoms", "na", "nc", "squeeze_factor", "n1x1", "n3x3_reduce",
    "n3x3", "n5x5_reduce", "n5x5", "pool_proj",
})

_INT_LIST_KEYS = ("from", "layers", "mask")


def _coerce(key: str, val: str):
    if key == "anchors":
        nums = [float(x) for x in val.replace(" ", "").split(",")]
        return np.asarray(nums, dtype=np.float32).reshape(-1, 2)
    if key in _INT_LIST_KEYS or (key == "size" and "," in val):
        return [int(x) for x in val.split(",")]
    try:
        return int(val)
    except ValueError:
        pass
    try:
        return float(val)
    except ValueError:
        return val


def parse_model_cfg(path: str):
    """Parse a darknet ``.cfg`` file into ``(net_info, blocks)``.

    ``net_info`` is the ``[net]`` section as a dict; ``blocks`` is a list of
    layer dicts, each with at least a ``"type"`` key.
    """
    if not path.endswith(".cfg") or not os.path.exists(path):
        raise FileNotFoundError(f"cfg file not found: {path}")

    with open(path, "r", encoding="utf-8") as f:
        raw_lines = f.read().split("\n")

    blocks: list[dict] = []
    for raw in raw_lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("["):
            blocks.append({"type": line[1:-1].strip()})
            if blocks[-1]["type"] == "convolutional":
                # darknet convs default to no BN (reference parse_config.py:32-33)
                blocks[-1]["batch_normalize"] = 0
        else:
            key, _, val = line.partition("=")
            key = key.strip()
            blocks[-1][key] = _coerce(key, val.strip())

    if not blocks or blocks[0]["type"] != "net":
        raise ValueError(f"cfg must start with a [net] section: {path}")

    net, layer_blocks = blocks[0], blocks[1:]
    for blk in layer_blocks:
        bad = set(blk) - SUPPORTED_FIELDS
        if bad:
            raise ValueError(f"unsupported cfg fields {sorted(bad)} in {path}")
    return net, layer_blocks


def parse_data_cfg(path: str) -> dict:
    """Parse a ``.data`` key=value registry (classes/train/valid/test/... paths)."""
    if not os.path.exists(path) and os.path.exists(os.path.join("data", path)):
        path = os.path.join("data", path)
    options: dict[str, str] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition("=")
            options[key.strip()] = val.strip()
    return options


def load_hyp(path: str) -> dict:
    """Load a hyperparameter YAML (config/hyp.scratch*.yaml in the reference)."""
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)
