"""Optimizers, LR schedules and EMA, matching the reference's training recipe.

Reference recipe (train.py:84-91, 133-137; distributed_utils.py:234-244):
SGD(nesterov, momentum, weight_decay) or Adam(betas=(momentum, 0.999), wd),
cosine LR from lr0 to lr0*lrf over `epochs` stepped per epoch, linear warmup
from factor 1/1000 over min(1000, steps_per_epoch) iterations during epoch 0.
Torch couples weight decay into the gradient before momentum (L2, not AdamW) —
reproduced with ``optax.add_decayed_weights`` at the head of the chain.

EMA mirrors the reference's (dead-code) ModelEMA (torch_utils.py:77-126):
decay ramp d = decay * (1 - exp(-updates / 2000)).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_epoch_schedule(lr0: float, lrf: float, epochs: int,
                          steps_per_epoch: int,
                          warmup: bool = True) -> Callable:
    """lr(step): per-epoch cosine (scheduler steps once per epoch, so the LR is
    piecewise-constant across an epoch, reference train.py:135-137 + :191) with
    the reference's epoch-0 linear warmup (kaist_train_eval_utils.py:33-38 ->
    distributed_utils.py:234-244)."""
    warmup_iters = min(1000, max(steps_per_epoch - 1, 1))
    warmup_factor = 1.0 / 1000.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch)
        cos = ((1 + jnp.cos(epoch * math.pi / epochs)) / 2) * (1 - lrf) + lrf
        lr = lr0 * cos
        if warmup:
            alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
            wf = warmup_factor * (1 - alpha) + alpha
            lr = jnp.where(step < warmup_iters, lr * wf, lr)
        return lr

    return schedule


def make_optimizer(hyp: dict, schedule, sgd: bool = False,
                   freeze_mask=None, accumulate: int = 1):
    """Build the optax chain. ``freeze_mask``: pytree of bools (True = train)
    replacing the reference's requires_grad_(False) freezing (train.py:77-82).
    ``accumulate``: micro-batch accumulation steps (reference train.py:37)."""
    wd = hyp.get("weight_decay", 0.0)
    mom = hyp.get("momentum", 0.937)
    if sgd:
        core = optax.chain(
            optax.add_decayed_weights(wd),
            optax.trace(decay=mom, nesterov=True),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        core = optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(b1=mom, b2=0.999),
            optax.scale_by_learning_rate(schedule),
        )
    if freeze_mask is not None:
        core = optax.chain(
            optax.masked(optax.set_to_zero(),
                         jax.tree.map(lambda t: not t, freeze_mask)),
            core,
        )
    if accumulate > 1:
        core = optax.MultiSteps(core, every_k_schedule=accumulate)
    return core


def freeze_mask_by_layer(params: dict, max_frozen_layer: int) -> dict:
    """True = trainable. Freezes layers l0..l{max_frozen_layer} (reference
    --freeze-layers semantics, train.py:77-82)."""
    def layer_idx(key: str) -> int:
        return int(key[1:])

    return {k: jax.tree.map(lambda _: layer_idx(k) > max_frozen_layer, v)
            for k, v in params.items()}


# ------------------------------------------------------------------------ EMA

def ema_init(params):
    # deep copy — EMA leaves must not alias the live params (buffer donation
    # in the train step would otherwise see the same buffer twice)
    return {"params": jax.tree.map(lambda p: jnp.array(p, copy=True), params),
            "updates": jnp.zeros((), jnp.int32)}


def ema_update(ema, params, decay: float = 0.9999):
    updates = ema["updates"] + 1
    d = decay * (1 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))
    new = jax.tree.map(lambda e, p: e * d + (1 - d) * p.astype(e.dtype),
                       ema["params"], params)
    return {"params": new, "updates": updates}
