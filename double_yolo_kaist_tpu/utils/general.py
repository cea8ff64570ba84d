"""Small shared utilities (reference build_utils/utils.py:24-37,
torch_utils.py:9-74 equivalents)."""

from __future__ import annotations

import glob
import os
import random

import numpy as np


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent XLA compilation cache for this process.

    Compiles through the axon tunnel cost 1-7 minutes for the big configs;
    with the cache every later bench/serve/eval/detect start is a disk hit
    (measured 1.9 s -> 0.1 s per program on v5e). Called by all CLI entry
    points before the first jit. DYK_COMPILE_CACHE=0 disables; set it to a
    path to relocate the cache (default ~/.cache/dyk_tpu_jax)."""
    import jax

    env = os.environ.get("DYK_COMPILE_CACHE", "")
    if env == "0":
        return
    path = env or path or os.path.join(os.path.expanduser("~"), ".cache",
                                       "dyk_tpu_jax")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (OSError, AttributeError):   # read-only fs / older jax: run cold
        pass


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
