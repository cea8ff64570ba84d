"""Predictor serving API: batch bucketing, padding, letterbox undo."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph
from double_yolo_kaist_tpu.serving import Predictor

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")


def test_predictor_batching():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    pred = Predictor(ir, variables, img_size=64, conf_thres=0.005,
                     batch_buckets=(2, 4), compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (5, 96, 128, 3), dtype=np.uint8)
    out = pred(imgs, imgs)
    assert len(out) == 5
    for boxes, scores, classes in out:
        assert boxes.shape[1:] == (4,)
        assert len(boxes) == len(scores) == len(classes)
        if len(boxes):
            assert (boxes[:, [0, 2]] <= 128).all()
            assert (boxes[:, [1, 3]] <= 96).all()
            assert (boxes >= 0).all()
    # only the bucketed shapes were compiled (2 buckets -> <= 2 programs)
    assert len(pred._pre_cache) == 1
