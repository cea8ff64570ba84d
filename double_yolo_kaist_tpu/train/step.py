"""The jitted training / evaluation step over a device mesh.

One XLA program per (batch-shape, image-size) pair: forward (bf16 compute,
fp32 params), fixed-shape loss, backward, optimizer update, optional EMA.
Batches are sharded over the mesh's "data" axis and parameters replicated;
because the loss is a global-batch mean under ``jax.jit`` with those
shardings, XLA inserts the cross-device gradient all-reduce (ICI psum) and
global BN statistics automatically — this replaces the reference's (dormant)
DDP/NCCL path and its gradient-accumulation workaround (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import graph
from . import loss as LS
from . import optim as OPT


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray
    ema: Optional[dict] = None


def create_train_state(ir, rng, tx, ema: bool = False,
                       variables: Optional[dict] = None) -> TrainState:
    if variables is None:
        variables = graph.init(ir, rng)
    params, bn_state = variables["params"], variables["state"]
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema=OPT.ema_init(params) if ema else None,
    )



def _make_update_one(ir, specs, hyp, tx, *, gr, compute_dtype, ema_decay,
                     remat_segments):
    """The single optimizer step shared by make_train_step /
    make_multi_step / make_fused_multi_step — the ONE place the update rule
    lives (loss, grads, optimizer, EMA, metrics incl. grad_norm), so the
    three dispatch shapes can never drift apart."""

    def update_one(state: TrainState, batch: dict, rng, xv, xl):
        def loss_fn(params):
            raws, new_bn = graph.apply(
                ir, {"params": params, "state": state.bn_state}, xv, xl,
                train=True, rng=rng, compute_dtype=compute_dtype,
                remat_segments=remat_segments)
            ld = LS.compute_loss(raws, batch["targets"], batch["tmask"],
                                 specs, hyp, gr)
            return LS.total_loss(ld), (ld, new_bn)

        (total, (ld, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            ema = OPT.ema_update(ema, params, ema_decay)
        metrics = {**ld, "loss": total,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(params, new_bn, opt_state, state.step + 1,
                          ema), metrics

    return update_one


def make_train_step(ir, hyp: dict, tx, *, gr: float = 1.0,
                    compute_dtype=jnp.bfloat16, ema_decay: float = 0.9999,
                    donate: bool = True, remat_segments: int = 0):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    batch: {"v": (B,H,W,3), "l": (B,H,W,3) [dual only], "targets": (B,T,5),
    "tmask": (B,T)} — images uint8 or float in [0,1].
    ``remat_segments``: gradient-checkpoint the forward into N segments."""
    specs = LS.head_specs(ir)

    update_one = _make_update_one(ir, specs, hyp, tx, gr=gr,
                                  compute_dtype=compute_dtype,
                                  ema_decay=ema_decay,
                                  remat_segments=remat_segments)

    def step_fn(state: TrainState, batch: dict, rng):
        xv = _to_float(batch["v"])
        xl = _to_float(batch["l"]) if "l" in batch else None
        return update_one(state, batch, rng, xv, xl)

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_multi_step(ir, hyp: dict, tx, *, gr: float = 1.0,
                    compute_dtype=jnp.bfloat16, ema_decay: float = 0.9999,
                    remat_segments: int = 0):
    """K optimizer steps per dispatch via ``lax.scan`` over stacked batches.

    (state, batches, rng) -> (state, stacked metrics), where every leaf of
    ``batches`` has a leading K axis. One XLA program executes K full steps —
    amortizes host dispatch latency (essential through high-latency device
    attachments; measured ~100 ms/dispatch on this TPU tunnel, i.e. ~45% of a
    flagship bs8 step)."""
    specs = LS.head_specs(ir)

    update_one = _make_update_one(ir, specs, hyp, tx, gr=gr,
                                  compute_dtype=compute_dtype,
                                  ema_decay=ema_decay,
                                  remat_segments=remat_segments)

    def one_step(carry, inp):
        state, rng = carry
        batch = inp
        xv = _to_float(batch["v"])
        xl = _to_float(batch["l"]) if "l" in batch else None
        new_state, metrics = update_one(state, batch, rng, xv, xl)
        return (new_state, jax.random.fold_in(rng, 1)), metrics

    def multi(state: TrainState, batches: dict, rng):
        (state, _), metrics = jax.lax.scan(one_step, (state, rng), batches)
        return state, metrics

    return jax.jit(multi, donate_argnums=(0,))


def make_fused_multi_step(ir, hyp: dict, tx, aug_fn, *, gr: float = 1.0,
                          compute_dtype=jnp.bfloat16, ema_decay: float = 0.9999,
                          remat_segments: int = 0, images_in: bool = False,
                          double_buffer: bool = False):
    """K steps per dispatch with ON-DEVICE augmentation inside the scan.

    The fully device-resident training loop: the host sends only batch
    indices, padded labels, and keys per dispatch; each scan iteration
    gathers its source images from the device-resident uint8 pool
    (data/pipeline.device_image_pool), augments, and runs one optimizer
    step — source pixels never cross the host link and the per-batch
    augment programs collapse into the train dispatch (64 extra dispatches
    per 512-img epoch at bs8 through a ~100 ms-latency attachment).

    ``aug_fn``: raw traceable augment fn from
    make_train_augment_fn(..., from_pool=not images_in, jit=False).

    (state, pool_v, pool_l, xs, aug_key, rng) -> (state, stacked metrics)
    where xs = {"b0": (K,), "load": (K, 4B), "targets": (K, B, T, 5),
    "tmask": (K, B, T)}. Key parity with the unfused path: augment key for
    step k is fold_in(aug_key, b0[k]) (identical to train_batches) and the
    step rng chains fold_in(rng, 1) per iteration (identical to
    make_multi_step), so fused == unfused bit-for-bit given the same epoch
    key and group rng.

    ``images_in``: no pool arguments — xs carries the raw source rows
    ("v_u8"/"l_u8", (K, 4B, H, W, 3) u8) instead of "load", and the
    signature is (state, xs, aug_key, rng). Used when the dataset is NOT
    HBM-resident (pinned-host pool or streaming): the rows arrive by
    host-side gather/upload but the K augment+step programs still collapse
    into one dispatch. Bit-identical to the pool path (same u8 rows, same
    keys).

    ``double_buffer`` (pool path only): carry one pre-augmented batch
    through the scan so iteration i's augment (batch i+1) has NO data
    dependence on iteration i's train step — the overlap experiment of
    VERDICT r3 item 4. Batch 0 is augmented in a prologue before the scan
    and the xs are rolled by one, so the trained batches, augment keys, and
    step rng chain are IDENTICAL to the plain path (the rolled-around last
    augment recomputes batch 0 and is discarded — ~1/K extra augment work).
    A single-TensorCore TPU executes fusions serially, so any win must come
    from scheduler-level interleaving of the augment's gather/DMA traffic
    with the step's MXU work; measured by tools/fused_train_probe.py
    --double-buffer."""
    specs = LS.head_specs(ir)
    if double_buffer and images_in:
        raise ValueError("double_buffer is a pool-path experiment; "
                         "combine it with images_in once it has a reason "
                         "to exist there")

    update_one = _make_update_one(ir, specs, hyp, tx, gr=gr,
                                  compute_dtype=compute_dtype,
                                  ema_decay=ema_decay,
                                  remat_segments=remat_segments)

    def run_one(state: TrainState, rng, batch):
        return update_one(state, batch, rng, batch["v"], batch.get("l"))

    if images_in:
        def multi(state: TrainState, xs: dict, aug_key, rng):
            def one_step(carry, x):
                state, rng = carry
                batch = aug_fn(jax.random.fold_in(aug_key, x["b0"]),
                               x["v_u8"], x["l_u8"], x["targets"],
                               x["tmask"])
                new_state, metrics = run_one(state, rng, batch)
                return (new_state, jax.random.fold_in(rng, 1)), metrics

            (state, _), metrics = jax.lax.scan(one_step, (state, rng), xs)
            return state, metrics
    elif double_buffer:
        def multi(state: TrainState, pool_v, pool_l, xs: dict, aug_key, rng):
            def aug_of(x):
                return aug_fn(jax.random.fold_in(aug_key, x["b0"]),
                              pool_v, pool_l, x["load"], x["targets"],
                              x["tmask"])

            batch0 = aug_of(jax.tree.map(lambda a: a[0], xs))
            xs_next = jax.tree.map(lambda a: jnp.roll(a, -1, axis=0), xs)

            def one_step(carry, x):
                state, rng, batch = carry
                next_batch = aug_of(x)            # batch i+1: independent
                new_state, metrics = run_one(state, rng, batch)   # batch i
                return (new_state, jax.random.fold_in(rng, 1),
                        next_batch), metrics

            (state, _, _), metrics = jax.lax.scan(
                one_step, (state, rng, batch0), xs_next)
            return state, metrics
    else:
        def multi(state: TrainState, pool_v, pool_l, xs: dict, aug_key, rng):
            def one_step(carry, x):
                state, rng = carry
                batch = aug_fn(jax.random.fold_in(aug_key, x["b0"]),
                               pool_v, pool_l, x["load"], x["targets"],
                               x["tmask"])
                new_state, metrics = run_one(state, rng, batch)
                return (new_state, jax.random.fold_in(rng, 1)), metrics

            (state, _), metrics = jax.lax.scan(one_step, (state, rng), xs)
            return state, metrics

    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(ir, *, compute_dtype=jnp.bfloat16, folded: bool = False):
    """Jitted inference step -> decoded predictions (bs, total, no) fp32."""
    if folded:
        def fwd(variables, xv, xl=None):
            io, _ = graph.apply_folded(ir, variables, _to_float(xv),
                                       None if xl is None else _to_float(xl),
                                       compute_dtype=compute_dtype)
            return io.astype(jnp.float32)
    else:
        def fwd(variables, xv, xl=None):
            (io, _), _ = graph.apply(ir, variables, _to_float(xv),
                                     None if xl is None else _to_float(xl),
                                     train=False, compute_dtype=compute_dtype)
            return io.astype(jnp.float32)
    return jax.jit(fwd)


def _to_float(x):
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x
