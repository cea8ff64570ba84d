"""Training CLI — the reference train.py:244-286 argument surface on the TPU
trainer (double_yolo_kaist_tpu/train/trainer.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from cli.common import DEFAULT_HYP, build_model, str2bool  # noqa: E402
from double_yolo_kaist_tpu.config.parser import load_hyp, parse_data_cfg  # noqa: E402
from double_yolo_kaist_tpu.data.dataset import KaistDataset  # noqa: E402
from double_yolo_kaist_tpu.train.trainer import Trainer  # noqa: E402
from double_yolo_kaist_tpu.utils.general import check_file  # noqa: E402
from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--hyp", type=str, default=DEFAULT_HYP)
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint dir to resume from")
    p.add_argument("--name", default="exp")
    p.add_argument("--freeze-layers", type=int, default=-1)
    p.add_argument("--data", type=str, default="data/kaist_data.data")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--multi-scale", action="store_true")
    p.add_argument("--sgd", action="store_true")
    p.add_argument("--snow", action="store_true")
    p.add_argument("--clahe", action="store_true",
                   help="standalone CLAHE preprocessing (reference "
                        "kaist_dataset.py clahe option; --snow already "
                        "includes CLAHE before its cutout)")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--single-cls", type=str2bool, nargs="?",
                   const=True, default=True,
                   help="treat all classes as one (reference --single-cls); accepts an explicit True/False")
    p.add_argument("--anchor-cluster", action="store_true")
    p.add_argument("--cache-images", choices=("ram", "disk"), default=None,
                   help="cache decoded pairs (reference --cache-images; "
                        "'disk' writes raw .npy next to the split file — "
                        "epochs after the first skip JPEG decode entirely)")
    p.add_argument("--save-best", type=str2bool, nargs="?",
                   const=True, default=True,
                   help="save best.ckpt on in-train eval improvement; accepts an explicit True/False")
    p.add_argument("--notest", action="store_true")
    p.add_argument("--accumulate", type=int, default=1,
                   help="gradient accumulation steps (reference used "
                        "64/batch_size; unnecessary at TPU batch sizes)")
    p.add_argument("--out-dir", type=str, default="runs")
    p.add_argument("--fp32", action="store_true",
                   help="disable bf16 compute")
    p.add_argument("--cutoff", type=int, default=-1,
                   help="darknet .weights layer cutoff for transfer learning")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="K optimizer steps per device dispatch (lax.scan); "
                        "amortizes host dispatch latency, fixed img size only")
    p.add_argument("--remat-segments", type=int, default=0,
                   help="gradient-checkpoint the forward into N segments "
                        "(trades recompute for HBM at large batch)")
    p.add_argument("--no-dp", action="store_true",
                   help="disable the default data-parallel device mesh")
    p.add_argument("--device-cache", choices=("auto", "on", "off"),
                   default="auto",
                   help="keep the dataset's raw u8 pairs resident in device "
                        "memory and gather batches on device (no per-batch "
                        "image upload). auto: on when the dataset fits "
                        "DYK_DEVICE_CACHE_GB (default 4 GB), else tries a "
                        "pinned-host pool (zero HBM, DYK_HOST_CACHE_GB "
                        "default 16 GB), else streams; off if training "
                        "runs out of device memory")
    return p


def main(argv=None):
    opt = make_parser().parse_args(argv)

    # multi-host opt-in (DYK_DISTRIBUTED=1 + JAX coordinator env vars);
    # single-process behavior unchanged
    from double_yolo_kaist_tpu.parallel.multihost import \
        maybe_initialize_distributed
    maybe_initialize_distributed()

    opt.cfg = check_file(opt.cfg)
    opt.data = check_file(opt.data)
    opt.hyp = check_file(opt.hyp)
    hyp = load_hyp(opt.hyp)

    data_dict = parse_data_cfg(opt.data)
    nc = 1 if opt.single_cls else int(data_dict["classes"])
    hyp["cls"] *= nc / 80.0
    hyp["obj"] *= opt.img_size / 320.0

    if opt.anchor_cluster:
        from double_yolo_kaist_tpu.train.anchors import (
            dataset_box_sizes, evolve_anchors, rewrite_cfg_anchors)
        tmp_ds = KaistDataset(data_dict["train"], opt.img_size,
                              opt.batch_size, single_cls=opt.single_cls)
        whs = dataset_box_sizes(tmp_ds, opt.img_size)
        rewrite_cfg_anchors(opt.cfg, evolve_anchors(whs, verbose=True))

    train_ds = KaistDataset(data_dict["train"], opt.img_size, opt.batch_size,
                            augment=True, hyp=hyp, snowflake=opt.snow,
                            clahe=opt.clahe, single_cls=opt.single_cls,
                            cache_images=opt.cache_images)
    val_ds = KaistDataset(data_dict["valid"], opt.img_size, opt.batch_size,
                          hyp=hyp, rect=True, clahe=opt.clahe,
                          single_cls=opt.single_cls)

    ir, variables = build_model(opt.cfg, opt.weights, cutoff=opt.cutoff)
    trainer = Trainer(ir, hyp, epochs=opt.epochs, batch_size=opt.batch_size,
                      img_size=opt.img_size, train_dataset=train_ds,
                      val_dataset=val_ds, sgd=opt.sgd,
                      freeze_layers=opt.freeze_layers,
                      multi_scale=opt.multi_scale, ema=opt.ema,
                      compute_dtype=jnp.float32 if opt.fp32 else jnp.bfloat16,
                      out_dir=opt.out_dir, name=opt.name,
                      accumulate=opt.accumulate, snowflake=opt.snow,
                      remat_segments=opt.remat_segments,
                      steps_per_dispatch=opt.steps_per_dispatch,
                      data_parallel=not opt.no_dp,
                      device_cache={"auto": None, "on": True,
                                    "off": False}[opt.device_cache])
    if opt.weights:
        trainer.state = trainer.state._replace(
            params=variables["params"], bn_state=variables["state"])
    if opt.resume:
        trainer.load(opt.resume)
    best = trainer.fit(save_best=opt.save_best, notest=opt.notest)
    print(f"training done; best mAP@[0.50:0.95] = {best:.4f}")


if __name__ == "__main__":
    main()
