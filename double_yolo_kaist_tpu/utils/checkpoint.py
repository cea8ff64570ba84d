"""Checkpoint I/O: {params, bn_state, opt_state, step, epoch, best_map,
training_results} with resume semantics matching the reference
(train.py:93-137, 223-241): tolerant partial load filtered by shape, best-map
carry-over, start_epoch = saved_epoch + 1, results text restored.

Format: a directory with one .npz of flattened arrays + a .json manifest —
dependency-free (orbax is available but its async machinery is overkill for
this model size and breaks on some shared filesystems).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(template, flat, prefix=""):
    """Rebuild ``template``'s structure from flat arrays; leaves missing from
    ``flat`` or with mismatched shape keep the template value (tolerant load,
    reference train.py:102-104)."""
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/")
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        vals = [_unflatten_into(v, flat, f"{prefix}{i}/")
                for i, v in enumerate(template)]
        return type(template)(vals) if not hasattr(template, "_fields") \
            else type(template)(*vals)
    if template is None:
        return None
    key = prefix[:-1]
    if key in flat and flat[key].shape == tuple(np.shape(template)):
        return flat[key]
    return template


def save_checkpoint(path: str, *, params, bn_state, opt_state=None,
                    step: int = 0, epoch: int = -1, best_map: float = 0.0,
                    training_results: str = "", ema=None):
    # multi-host: only process 0 writes (reference save_on_master,
    # distributed_utils.py:283-297)
    from ..parallel.multihost import is_main_process
    if not is_main_process():
        return
    os.makedirs(path, exist_ok=True)
    tree = {"params": jax.device_get(params),
            "bn_state": jax.device_get(bn_state)}
    if opt_state is not None:
        tree["opt_state"] = jax.device_get(opt_state)
    if ema is not None:
        tree["ema"] = jax.device_get(ema)
    flat = _flatten(tree)
    np.savez(os.path.join(path, "arrays.npz"), **flat)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"step": int(step), "epoch": int(epoch),
                   "best_map": float(best_map),
                   "training_results": training_results,
                   "keys": sorted(flat)}, f)


def load_checkpoint(path: str, template: dict | None = None) -> dict:
    """Returns {params?, bn_state?, opt_state?, ema?, step, epoch, best_map,
    training_results}. With ``template`` (same outer structure), arrays are
    grafted tolerantly; without, raw flat trees are rebuilt exactly."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    with np.load(os.path.join(path, "arrays.npz")) as z:
        flat = {k: z[k] for k in z.files}

    if template is not None:
        tree = _unflatten_into(template, flat)
    else:
        tree = {}
        for key, arr in flat.items():
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return {**tree, "step": manifest["step"], "epoch": manifest["epoch"],
            "best_map": manifest["best_map"],
            "training_results": manifest["training_results"]}
