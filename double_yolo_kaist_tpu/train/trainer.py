"""Full training orchestration: the reference's train.py:20-241 epoch loop,
re-staged for TPU.

Per epoch: device-augmented train batches -> jitted DP train step (bf16) ->
cosine LR (epoch-granular) -> in-train COCO eval -> results.txt + TB scalars
-> best/every checkpointing. Resume restores params/opt/epoch/best_map
(reference train.py:93-137). Multi-scale training uses a fixed bucket set —
each bucket shape is a separately cached XLA program (SURVEY.md §5
"long-context" note), replacing the reference's random per-10-batch resize
(kaist_train_eval_utils.py:58-71) without re-jit churn.
"""

from __future__ import annotations

import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data.pipeline import AUG_STREAM_TAG, prefetch, train_batches
from ..eval.evaluator import evaluate_dataset
from ..models import graph
from ..parallel import mesh as M
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logging import MetricLogger, ResultsWriter, TB_TAGS, make_tb_writer
from . import optim as OPT
from .step import TrainState, create_train_state, make_train_step


def _group_batches(batches, k: int):
    """Group k device batches into one stacked batch for make_multi_step
    (partial trailing groups are dropped, like drop_last)."""
    import jax.numpy as jnp

    group, idxs = [], []
    for batch, idx in batches:
        group.append(batch)
        idxs.extend(list(idx))
        if len(group) == k:
            stacked = {key: jnp.stack([g[key] for g in group])
                       for key in group[0]}
            yield stacked, idxs
            group, idxs = [], []


def multi_scale_buckets(img_size: int, gs: int = 32):
    """The reference samples sizes in [imgsz//1.5, imgsz//0.667] on a 32-px
    grid (train.py:51-58); we take {min, mid, base, max} as compile buckets."""
    lo = int(img_size // 1.5) // gs * gs
    hi = int(img_size // 0.667) // gs * gs
    mid = (lo + hi) // 2 // gs * gs
    return sorted({lo, mid, img_size, hi})


class Trainer:
    def __init__(self, ir, hyp: dict, *, epochs: int, batch_size: int,
                 img_size: int = 512, train_dataset=None, val_dataset=None,
                 sgd: bool = False, freeze_layers: int = -1,
                 multi_scale: bool = False, ema: bool = False,
                 compute_dtype=jnp.bfloat16, out_dir: str = "runs",
                 name: str = "exp", accumulate: int = 1,
                 snowflake: bool = False, seed: int = 0,
                 remat_segments: int = 0, steps_per_dispatch: int = 1,
                 data_parallel: bool = True, devices=None,
                 device_cache: bool | None = None):
        self.ir = ir
        self.hyp = dict(hyp)
        self.epochs = epochs
        self.batch_size = batch_size
        self.img_size = img_size
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.multi_scale = multi_scale
        self.snowflake = snowflake
        # standalone CLAHE (reference kaist_dataset.py:311-313 `elif
        # self.clahe`): follow the dataset's flag so a clahe-configured
        # dataset trains AND evaluates with it — eval already reads
        # dataset.clahe, and skipping it at train time would skew the
        # train/eval input distributions
        self.clahe = bool(getattr(train_dataset, "clahe", False))
        # None: auto (pool the dataset's u8 pairs in HBM when they fit the
        # DYK_DEVICE_CACHE_GB budget); True/False force. The pool removes
        # per-batch image upload (crucial on slow host links) but co-resides
        # with the train step's workspace — turn off if training OOMs.
        self.device_cache = device_cache
        self.compute_dtype = compute_dtype
        self.out_dir = os.path.join(out_dir, name)
        os.makedirs(self.out_dir, exist_ok=True)

        # Data parallelism is first-class (SURVEY §2.3, replacing the
        # reference's dormant DDP, distributed_utils.py:300-334): a 1-D
        # ("data",) mesh over the largest device-count that divides the
        # batch, batch leaves sharded, state replicated. The step function
        # is identical on 1 and N devices; XLA inserts the gradient psum.
        self.mesh = None
        if data_parallel:
            devs = list(devices if devices is not None else jax.devices())
            k = max(d for d in range(1, len(devs) + 1) if batch_size % d == 0)
            if k > 1:
                self.mesh = M.make_mesh(devs[:k])
                print(f"data parallel: {k}-device mesh "
                      f"({batch_size // k} images/device)", flush=True)

        steps_per_epoch = max(
            len(train_dataset) // batch_size if train_dataset else 100, 1)
        self.schedule = OPT.cosine_epoch_schedule(
            hyp["lr0"], hyp["lrf"], epochs, steps_per_epoch)

        variables = graph.init(ir, jax.random.PRNGKey(seed))
        freeze_mask = None
        if freeze_layers >= 0:
            freeze_mask = OPT.freeze_mask_by_layer(variables["params"],
                                                   freeze_layers)
        self.tx = OPT.make_optimizer(self.hyp, self.schedule, sgd=sgd,
                                     freeze_mask=freeze_mask,
                                     accumulate=accumulate)
        self.state = create_train_state(ir, jax.random.PRNGKey(seed), self.tx,
                                        ema=ema, variables=variables)
        self.steps_per_dispatch = steps_per_dispatch
        self.remat_segments = remat_segments
        # fused programs built lazily when a resident pool engages; keyed by
        # (tier, img_size) — multi-scale training compiles one fused program
        # per bucket shape and the bucket is sampled per DISPATCH (the K
        # stacked batches of one program share a shape; see
        # pipeline.train_batch_plan size_every)
        self._fused_steps = {}
        if steps_per_dispatch > 1:
            from .step import make_multi_step
            self.step_fn = make_multi_step(ir, self.hyp, self.tx,
                                           compute_dtype=compute_dtype,
                                           remat_segments=remat_segments)
        else:
            self.step_fn = make_train_step(ir, self.hyp, self.tx,
                                           compute_dtype=compute_dtype,
                                           remat_segments=remat_segments)
        self.start_epoch = 0
        self.best_map = 0.0
        self.results = ResultsWriter(os.path.join(self.out_dir, "results.txt"))
        self.tb = make_tb_writer(os.path.join(self.out_dir, "tb"))

    # ------------------------------------------------------------------ resume

    def load(self, ckpt_path: str):
        """Tolerant resume (reference train.py:96-128 semantics)."""
        template = {"params": self.state.params,
                    "bn_state": self.state.bn_state,
                    "opt_state": self.state.opt_state}
        if self.state.ema is not None:
            template["ema"] = self.state.ema
        loaded = load_checkpoint(ckpt_path, template)
        self.state = TrainState(
            params=loaded["params"], bn_state=loaded["bn_state"],
            opt_state=loaded["opt_state"],
            step=jnp.asarray(loaded["step"], jnp.int32),
            ema=loaded.get("ema", self.state.ema))
        self.best_map = loaded["best_map"]
        self.start_epoch = loaded["epoch"] + 1
        if self.epochs < self.start_epoch:
            self.epochs += loaded["epoch"]    # fine-tune extension
        if loaded["training_results"]:
            self.results.write_text(loaded["training_results"])

    def save(self, path: str, epoch: int):
        save_checkpoint(path, params=self.state.params,
                        bn_state=self.state.bn_state,
                        opt_state=self.state.opt_state,
                        step=int(jax.device_get(self.state.step)),
                        epoch=epoch, best_map=self.best_map,
                        training_results=self.results.read(),
                        ema=self.state.ema)

    # ------------------------------------------------------------------- train

    def _place_state(self):
        """Replicate training state over the mesh (idempotent; called before
        stepping so resume/weight-graft paths land on the mesh too)."""
        if self.mesh is not None:
            self.state = TrainState(
                *[M.replicate(x, self.mesh) if x is not None else None
                  for x in self.state])

    def _shard(self, batch: dict) -> dict:
        if self.mesh is None:
            return batch
        # stacked multi-step batches are (K, B, ...): shard dim 1
        bdim = 1 if self.steps_per_dispatch > 1 else 0
        return M.shard_batch(batch, self.mesh, batch_dim=bdim)

    def train_one_epoch(self, epoch: int, print_freq: int = 50):
        from ..utils.profiling import StepTimer

        self._place_state()
        key = jax.random.fold_in(jax.random.PRNGKey(123), epoch)
        # fused path: multi-step dispatch + resident pool -> one XLA program
        # per K steps does gather+augment+train entirely on device (HBM
        # pool), or augment+train with host-gathered rows (pinned-host pool)
        if self.steps_per_dispatch > 1:
            from ..data.pipeline import select_image_pool
            src_hw = tuple(int(x)
                           for x in self.train_dataset.shapes[0][::-1])
            tier, pool = select_image_pool(self.train_dataset, src_hw,
                                           self.device_cache)
            if tier is not None:
                return self._train_one_epoch_fused(epoch, key, tier, pool,
                                                   print_freq)
        logger = MetricLogger(print_freq=print_freq)
        timer = StepTimer()
        sizes = (multi_scale_buckets(self.img_size) if self.multi_scale
                 else self.img_size)
        batches = prefetch(train_batches(
            self.train_dataset, self.batch_size, key,
            img_size=sizes, hyp=self.hyp,
            snowflake=self.snowflake, clahe=self.clahe, seed_epoch=epoch,
            device_cache=self.device_cache,
            # stacked multi-step dispatches share one shape: draw the
            # multi-scale bucket once per K-batch group
            size_every=self.steps_per_dispatch))
        if self.steps_per_dispatch > 1:
            batches = _group_batches(batches, self.steps_per_dispatch)
        last = {}
        for i, (batch, idx) in logger.log_every(batches, f"epoch {epoch}"):
            timer.data_ready()
            self.state, metrics = self.step_fn(self.state, self._shard(batch),
                                               jax.random.fold_in(key, i))
            last = {k: float(np.asarray(v).ravel()[-1])
                    for k, v in metrics.items()}
            timer.step_done()
            if not math.isfinite(last["loss"]):
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} step {i}: {last} "
                    f"(images {[self.train_dataset.img_files[j] for j in idx]})")
            logger.update(**last)
        lr = float(self.schedule(jax.device_get(self.state.step)))
        print(f"epoch {epoch} timing: {timer.summary()}", flush=True)
        return last, lr

    def _train_one_epoch_fused(self, epoch: int, key, tier, pool,
                               print_freq: int = 50):
        """Epoch loop over the fused augment+train dispatch (see
        step.make_fused_multi_step). tier "hbm": host work per dispatch is
        index sampling + label padding only (pool rows gathered inside the
        program). tier "host": rows are gathered from the pinned-host pool
        (ONE two-stream gather right before each dispatch — gathered rows
        are never queued ahead: prefetching them would hold several
        dispatches of row buffers in HBM on exactly the configs whose
        dataset already exceeded the HBM budget, and the single TPU core
        serializes programs anyway so there is nothing to overlap) and fed
        to the images-in fused program — same single dispatch per K steps,
        zero HBM pool cost."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..data.pipeline import make_train_augment_fn, train_batch_plan
        from ..utils.profiling import StepTimer

        ds = self.train_dataset
        K = self.steps_per_dispatch
        sizes = (multi_scale_buckets(self.img_size) if self.multi_scale
                 else [self.img_size])

        def fused_for(size: int):
            if (tier, size) not in self._fused_steps:
                src_hw = tuple(int(x) for x in ds.shapes[0][::-1])
                aug = make_train_augment_fn(
                    src_hw, size, self.hyp, snowflake=self.snowflake,
                    clahe=self.clahe, from_pool=tier == "hbm", jit=False)
                from .step import make_fused_multi_step
                self._fused_steps[(tier, size)] = make_fused_multi_step(
                    self.ir, self.hyp, self.tx, aug,
                    compute_dtype=self.compute_dtype,
                    remat_segments=self.remat_segments,
                    images_in=tier != "hbm")
            return self._fused_steps[(tier, size)]
        if tier == "hbm":
            pool_v, pool_l = pool
            if self.mesh is not None:
                rep = NamedSharding(self.mesh, P())
                if getattr(pool_v, "sharding", None) != rep:
                    # replicate ONCE and hand the replicated arrays back to
                    # the dataset cache (next epoch's pool IS this one):
                    # re-putting every epoch would broadcast the whole pool
                    # each time AND leave device 0 holding both the original
                    # single-device copy and the replica — double the HBM
                    # the DYK_DEVICE_CACHE_GB gate admitted
                    pool_v = jax.device_put(pool_v, rep)
                    pool_l = jax.device_put(pool_l, rep)
                    jax.block_until_ready((pool_v, pool_l))
                    ds._device_pool = (pool_v, pool_l)
        else:
            hp_v, hp_l, hgather = pool

        def groups():
            buf = []
            for b0, idx, load, t, m, size in train_batch_plan(
                    ds, self.batch_size, sizes, seed_epoch=epoch,
                    size_every=K):
                buf.append((b0, idx, load, t, m))
                if len(buf) == K:
                    # size_every=K aligns bucket draws with group boundaries,
                    # so all K batches here share `size` by construction
                    xs = {"b0": np.asarray([b[0] for b in buf], np.int32),
                          "targets": np.stack([b[3] for b in buf]),
                          "tmask": np.stack([b[4] for b in buf])}
                    if tier == "hbm":
                        xs["load"] = np.stack([b[2] for b in buf])
                    else:
                        xs["load_all"] = np.concatenate(
                            [b[2] for b in buf])
                    yield xs, np.concatenate([b[1] for b in buf]), size
                    buf = []

        logger = MetricLogger(print_freq=print_freq)
        timer = StepTimer()
        last = {}
        # augment keys ride the tagged stream (pipeline.AUG_STREAM_TAG)
        # exactly as train_batches derives them, keeping fused == unfused
        # bit-for-bit while never colliding with the per-step model rng
        # fold_in(key, i); loop-invariant, derived once per epoch
        akey = jax.random.fold_in(key, AUG_STREAM_TAG)
        for i, (xs, idx, size) in logger.log_every(groups(), f"epoch {epoch}"):
            if tier != "hbm":
                # one two-stream pinned-host gather for the whole dispatch,
                # issued right before it; (K*4B, H, W, 3) -> (K, 4B, ...)
                load_all = xs.pop("load_all")
                per = load_all.shape[0] // K
                rows_v, rows_l = hgather((hp_v, hp_l), load_all)
                xs["v_u8"] = rows_v.reshape((K, per) + hp_v.shape[1:])
                xs["l_u8"] = rows_l.reshape((K, per) + hp_l.shape[1:])
            if self.mesh is not None:
                sharded = M.shard_batch(
                    {k: v for k, v in xs.items() if k != "b0"},
                    self.mesh, batch_dim=1)
                xs = {"b0": M.replicate(jnp.asarray(xs["b0"]), self.mesh),
                      **sharded}
            timer.data_ready()
            step_fn = fused_for(size)
            if tier == "hbm":
                self.state, metrics = step_fn(
                    self.state, pool_v, pool_l, xs, akey,
                    jax.random.fold_in(key, i))
            else:
                self.state, metrics = step_fn(
                    self.state, xs, akey, jax.random.fold_in(key, i))
            last = {k: float(np.asarray(v).ravel()[-1])
                    for k, v in metrics.items()}
            timer.step_done()
            if not math.isfinite(last["loss"]):
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} dispatch {i}: {last} "
                    f"(images {[ds.img_files[j] for j in idx]})")
            logger.update(**last)
        lr = float(self.schedule(jax.device_get(self.state.step)))
        print(f"epoch {epoch} timing: {timer.summary()}", flush=True)
        return last, lr

    def evaluate(self, batch_size: int | None = None, use_ema: bool = False):
        """In-train COCO eval; ``use_ema`` evaluates the EMA weights
        (reference ModelEMA's intended use, torch_utils.py:77-126)."""
        params = (self.state.ema["params"]
                  if use_ema and self.state.ema is not None
                  else self.state.params)
        variables = {"params": params, "state": self.state.bn_state}
        # reuse the training mesh: per-epoch eval otherwise serializes the
        # whole val split onto one chip while N-1 chips idle
        return evaluate_dataset(self.ir, variables, self.val_dataset,
                                batch_size=batch_size or self.batch_size,
                                compute_dtype=self.compute_dtype,
                                mesh=self.mesh,
                                device_cache=self.device_cache)

    def fit(self, save_best: bool = True, notest: bool = False):
        for epoch in range(self.start_epoch, self.epochs):
            mloss, lr = self.train_one_epoch(epoch)
            if notest and epoch != self.epochs - 1:
                continue
            res = self.evaluate()
            coco = res["coco_stats"]
            scalars = [mloss.get("box_loss", 0), mloss.get("obj_loss", 0),
                       mloss.get("class_loss", 0), mloss.get("loss", 0),
                       lr, coco[0], coco[1], coco[8]]
            for tag, v in zip(TB_TAGS, scalars):
                self.tb.add_scalar(tag, float(v), epoch)
            self.results.append(epoch, coco, mloss.get("loss", 0.0), lr)

            if coco[0] > self.best_map:
                self.best_map = float(coco[0])
            # "last" every epoch (reference train.py:214-233 saves last.pt
            # alongside best.pt) so resume/extend never depends on the best
            # epoch having been the final one
            self.save(os.path.join(self.out_dir, "last"), epoch)
            if save_best:
                if self.best_map == float(coco[0]):
                    self.save(os.path.join(self.out_dir, "best"), epoch)
            else:
                self.save(os.path.join(self.out_dir, f"epoch{epoch}"), epoch)
        return self.best_map
