"""s2d planner + stem fusion across the whole vendored zoo: the planner
must produce internally consistent plans for every cfg and input size
(regions enter from plain, stay transformable, and exit to plain), and the
fused forward must run finite on structurally diverse models."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CFGS = sorted(glob.glob(os.path.join(CFG_DIR, "*.cfg")))

# structurally diverse subset for the (heavier) forward smoke
SMOKE = ["kaist_dyolov3_concat", "kaist_dyolov4_fshare_global_concat_se3",
         "kaist_yolov3", "kaist_dyolov4_mobilenetv3_fshare_global_cse3",
         "kaist_dyolov3_add_sl"]


def _validate_plan(ir, plan):
    """Structural invariants apply_folded relies on."""
    for i, role in plan.items():
        n = ir.nodes[i]
        assert n.kind == "conv" and n.groups == 1, (i, role)
        if role in ("e1", "i1"):
            assert n.kernel == 1 and n.stride == (1, 1)
        elif role in ("e3", "i3"):
            assert n.kernel == 3 and n.stride == (1, 1) and n.pad == 1
        else:
            assert role == "x3" and n.kernel == 3 and n.stride == (2, 2)
    # simulate basis flow exactly like the executor: every consumer of an
    # s2d tensor must be planned, and plain consumers never see s2d
    basis = {}
    cur = "p"
    for n in ir.nodes:
        if n.kind == "conv":
            inb = "p" if n.takes_second_input else cur
            role = plan.get(n.index)
            if role in ("e1", "e3"):
                assert inb == "p", (n.index, role)
                cur = "s"
            elif role in ("i1", "i3"):
                assert inb == "s", (n.index, role)
                cur = "s"
            elif role == "x3":
                assert inb == "s", (n.index, role)
                cur = "p"
            else:
                assert inb == "p", (n.index, "unplanned conv fed s2d")
                cur = "p"
        elif n.kind == "route":
            bs = {basis.get(j, "p") for j in n.inputs}
            assert len(bs) == 1, (n.index, "mixed-basis concat")
            cur = bs.pop()
        elif n.kind == "shortcut":
            bs = {cur} | {basis.get(j, "p") for j in n.inputs}
            assert len(bs) == 1, (n.index, "mixed-basis shortcut")
        elif n.kind == "dropout":
            pass
        else:
            assert cur == "p", (n.index, n.kind, "non-conv fed s2d")
        basis[n.index] = cur


@pytest.mark.parametrize("path", ALL_CFGS,
                         ids=[os.path.basename(p) for p in ALL_CFGS])
def test_plan_consistent_all_cfgs(path):
    ir = compile_cfg(path)
    for h, w in ((512, 640), (416, 512), (64, 64), (96, 64)):
        for excl in (True, False):
            plan = graph.s2d_plan(ir, h, w, exclude_stems=excl)
            _validate_plan(ir, plan)


@pytest.mark.parametrize("name", SMOKE)
def test_fused_forward_smoke(name):
    path = os.path.join(CFG_DIR, f"{name}.cfg")
    ir = compile_cfg(path)
    variables = graph.init(ir, jax.random.PRNGKey(0))
    folded = graph.fold_batchnorm(ir, variables)
    folded = graph.prepare_folded(ir, folded, 64, 64)
    rng = np.random.default_rng(0)
    xv = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    xl = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    io, _ = graph.apply_folded(ir, folded, xv,
                               xl if ir.dual_stream else None)
    assert np.isfinite(np.asarray(io)).all()


# cfg that routes an 's' member of one (later-dropped) region into a second
# region: region A = l0(e1)/l1(i3)/l2(x3); l1 is cache-consumed by the route
# l5 OUTSIDE A, so the fixpoint drops A — and region C = l4(e1)/l5(route)/
# l6(i1)/l7(x3) consumed A's (formerly 's') l1, so it must cascade-drop too,
# otherwise l6/l7 stay planned i1/x3 against a plain C-channel tensor
# (trace-time channel mismatch). Regression test for the planner's cascade.
_CASCADE_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[upsample]
stride=2

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[route]
layers=4,1

[convolutional]
batch_normalize=1
filters=32
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=0
filters=18
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23, 30,61, 62,45, 59,119
classes=1
num=6
"""


def test_cross_region_consumption_cascades(tmp_path):
    p = tmp_path / "cascade.cfg"
    p.write_text(_CASCADE_CFG)
    ir = compile_cfg(str(p), yolo_strides=[2])
    plan = graph.s2d_plan(ir, 64, 64)
    # both regions must be gone: A for its outside consumer, C by cascade
    assert plan == {}, plan
    _validate_plan(ir, plan)
    variables = graph.init(ir, jax.random.PRNGKey(0))
    folded = graph.fold_batchnorm(ir, variables)
    folded = graph.prepare_folded(ir, folded, 64, 64)
    rng = np.random.default_rng(0)
    xv = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    io, _ = graph.apply_folded(ir, folded, xv)
    assert np.isfinite(np.asarray(io)).all()
