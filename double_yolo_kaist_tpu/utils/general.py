"""Small shared utilities (reference build_utils/utils.py:24-37,
torch_utils.py:9-74 equivalents)."""

from __future__ import annotations

import glob
import os
import random

import numpy as np


def check_file(file: str) -> str:
    """Return ``file`` if it exists, else search the tree recursively
    (reference utils.py:30-37)."""
    if os.path.isfile(file):
        return file
    found = glob.glob(f"./**/{file}", recursive=True)
    if not found:
        raise FileNotFoundError(f"File Not Found: {file}")
    return found[0]


def init_seeds(seed: int = 0):
    random.seed(seed)
    np.random.seed(seed)


def model_info(ir, variables, verbose: bool = False) -> str:
    """Param/layer summary (reference torch_utils.py:55-74)."""
    from ..models.graph import count_params

    n_params = count_params(variables)
    lines = [f"Model: {os.path.basename(ir.cfg_path)} — "
             f"{ir.num_layers} layers, {n_params:,} parameters, "
             f"{'dual' if ir.dual_stream else 'single'}-stream, "
             f"heads at strides {[n.yolo_stride for n in ir.head_nodes()]}"]
    if verbose:
        for node in ir.nodes:
            lines.append(f"  l{node.index:3d} {node.kind:10s} "
                         f"{node.in_ch:4d}->{node.out_ch:4d}")
    return "\n".join(lines)


def load_class_names(path: str) -> list:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]
