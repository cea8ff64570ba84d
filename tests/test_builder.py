"""Programmatic builder == reference cfgs, layer for layer (golden fixture)."""

import json
import os

import numpy as np
import pytest

from double_yolo_kaist_tpu.config.ir import infer_shapes, node_param_count
from double_yolo_kaist_tpu.models import builder as B

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_model_meta.json")
with open(FIXTURE) as f:
    META = json.load(f)

_KIND_TO_REF = {
    "conv": "convolutional", "dwconv": "depthwiseconvolutional",
    "se": "se", "inception": "inception", "maxpool": "maxpool",
    "avgpool": "avgpool", "upsample": "upsample", "route": "route",
    "shortcut": "shortcut", "dropout": "dropout", "yolo": "yolo",
}

CASES = [
    (B.build_yolov3, "kaist_yolov3.cfg"),
    (B.build_double_yolov3_add, "kaist_dyolov3_add_sl.cfg"),
    (lambda: B.build_double_yolov3_add(learned_weights=False),
     "kaist_dyolov3_add_simple.cfg"),
    (B.build_double_yolov3_concat, "kaist_dyolov3_concat.cfg"),
    (lambda: B.build_double_yolov3_concat(se=True),
     "kaist_dyolov3_concat_se.cfg"),
    (lambda: B.build_double_yolov3_concat(se=True, inception=True),
     "kaist_dyolov3_concat_seinc.cfg"),
    (B.build_double_yolov3_global_fshare_cse3,
     "kaist_dyolov3_fshare_global_concat_se3.cfg"),
    (B.build_yolov4, "kaist_yolov4.cfg"),
    (B.build_double_yolov4, "kaist_dyolov4_add_sl.cfg"),
    (lambda: B.build_double_yolov4(fusion="cse"),
     "kaist_dyolov4_concat_se.cfg"),
    (B.build_double_yolov4_global_fshare_cse3,
     "kaist_dyolov4_fshare_global_concat_se3.cfg"),
    (B.build_yolov4_mobilenetv2, "kaist_yolov4_mobilenetv2.cfg"),
    (B.build_yolov4_mobilenetv3, "kaist_yolov4_mobilenetv3.cfg"),
    (B.build_double_yolov4_mnv2_global_fshare_cse3,
     "kaist_dyolov4_mobilenetv2_fshare_global_cse3.cfg"),
    (B.build_double_yolov4_mnv3_global_fshare_cse3,
     "kaist_dyolov4_mobilenetv3_fshare_global_cse3.cfg"),
    (B.build_double_yolov3_fshare_cse, "kaist_dyolov3_fshare_concat_se.cfg"),
    (B.build_double_yolov3_global_fshare_cse,
     "kaist_dyolov3_fshare_global_concat_se.cfg"),
    (B.build_double_yolov3_global_fshare_add_sl,
     "kaist_dyolov3_fshare_global_add_sl.cfg"),
]


@pytest.mark.parametrize("build,ref_name", CASES)
def test_builder_matches_reference(build, ref_name):
    ir = build()
    meta = META[ref_name]
    assert ir.num_layers == meta["n_layers"]
    assert [_KIND_TO_REF[n.kind] for n in ir.nodes] == meta["layer_types"]
    assert ir.second_index == meta["second_index"]
    mine = [node_param_count(n) for n in ir.nodes]
    for i, (a, b) in enumerate(zip(mine, meta["per_layer_params"])):
        assert a == b, f"{ref_name} layer {i} ({ir.nodes[i].kind}): {a} != {b}"
    # forward shapes at the fixture's 64x64 probe
    shapes = infer_shapes(ir, *meta["input_hw"])
    for i, (ours, ref) in enumerate(zip(shapes, meta["out_shapes"])):
        if ref is None:
            continue
        if ir.nodes[i].kind == "yolo":
            assert list(ours) == ref[1:], f"{ref_name} yolo {i}"
        else:
            assert [1, *ours] == ref, f"{ref_name} layer {i}"
    # head metadata
    for node, ref in zip(ir.head_nodes(), meta["yolos"]):
        assert node.yolo_stride == ref["stride"]
        np.testing.assert_allclose(node.anchors, np.asarray(ref["anchors"]))


def test_built_model_runs():
    import jax
    import jax.numpy as jnp
    from double_yolo_kaist_tpu.models import graph

    ir = B.build_double_yolov3_add()
    variables = graph.init(ir, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    (io, raws), _ = graph.apply(ir, variables, x, x, train=False,
                                compute_dtype=jnp.float32)
    assert io.shape[0] == 1 and io.shape[-1] == 6
    assert len(raws) == 3
