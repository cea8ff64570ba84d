"""Multi-host (multi-process) hygiene.

The reference's rank-gating lives in distributed_utils.py:255-297
(``is_main_process``/``save_on_master``) around its dormant NCCL DDP stack.
The TPU-native equivalents: ``jax.distributed.initialize`` to join a
multi-host slice (opt-in — single-process behavior is unchanged), and
``jax.process_index() == 0`` gating for checkpoint/results/TensorBoard
writes so N hosts don't race on shared storage.

Eval-result merging across processes uses fixed-shape allgather
(``jax.experimental.multihost_utils.process_allgather``) — no pickle
transport (SURVEY.md §2.4); see ``allgather_predictions``.
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def maybe_initialize_distributed(coordinator: str | None = None,
                                 num_processes: int | None = None,
                                 process_id: int | None = None) -> bool:
    """Join a multi-host run if requested; no-op otherwise.

    Triggered by explicit args or by ``DYK_DISTRIBUTED=1`` (with the
    standard JAX coordinator env vars). Returns True if initialized.
    Replaces the reference's RANK/WORLD_SIZE/SLURM sniffing +
    ``init_process_group(backend='nccl')`` (distributed_utils.py:300-322).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    want = (coordinator is not None
            or os.environ.get("DYK_DISTRIBUTED", "0") == "1")
    if not want:
        return False
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """True on the process that owns checkpoint/log/TB writes
    (reference distributed_utils.py:283-297 semantics)."""
    return jax.process_index() == 0


def allgather_predictions(tree):
    """Merge fixed-shape per-host eval outputs across processes: every leaf
    gains a leading ``num_processes`` axis. Single-process: identity-stack.
    Replaces the reference's pickle-based ``all_gather``
    (distributed_utils.py:74-114, coco_eval.py:160-179)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
