"""Device mesh + sharding helpers.

The reference's scale mechanism is dormant NCCL DDP scaffolding plus gradient
accumulation (SURVEY.md §2.3-2.4; reference distributed_utils.py:300-322 is
never called). Here data parallelism is the first-class strategy: a 1-D
``("data",)`` mesh by default, optional 2-D ``("data", "model")`` for wide
configs, with batches sharded over "data" and parameters replicated. Under
``jax.jit`` with these shardings XLA inserts the gradient/BN-statistics
collectives over ICI automatically — there is no hand-written NCCL-style
communication anywhere.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("data",), shape=None) -> Mesh:
    """Build a device mesh. Defaults: every visible device on one "data" axis."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data",
                batch_dim: int = 0) -> dict:
    """Device-put every array in the batch dict, sharded over ``batch_dim``
    (0 for (B, ...) batches, 1 for (K, B, ...) stacked multi-step batches)."""
    s = NamedSharding(mesh, P(*((None,) * batch_dim), axis))
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
