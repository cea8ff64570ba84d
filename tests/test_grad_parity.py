"""Gradient-level training parity vs torch autograd.

Loss-scalar parity (test_loss_parity.py) does not certify the backward pass:
a subtle CIoU/BN/weighted-fusion gradient bug could train to a different
optimum with every forward test green. Here one identical batch runs through
BOTH frameworks — reference: torch model (models.py) + compute_loss
(build_utils/utils.py:209-384) under torch autograd; ours: graph.apply
(train=True) + train/loss.compute_loss under jax.grad — and d(loss)/dθ is
compared on representative leaves: the first conv kernel, its BN scale, the
LWIR stem conv, an Add-SL fusion weight (layers.py:47-85 `w`), and the last
predictor conv kernel + bias; for v3 + v4 head decodes × CIoU + GIoU box
losses.

Both sides run in FLOAT64. At fp32 the comparison is floored by
accumulation-order noise that train-mode BN stacks amplify catastrophically
on these random-init models (measured: torch's own fp32 grads differ from
its fp64 grads by up to 4e-2 relative on deep leaves of the 115M-param
Add-SL model, and by O(1) on random-init MobileNetv3 whose gradient scale
reaches 3e5; our fp32 grads were 2–7× CLOSER to the fp64 truth than torch's
own fp32 on every leaf measured). At fp64 the noise floor drops to ~1e-8 and
any semantic divergence is exposed — the framework's `_at_least_f32`
promotion (models/layers.py) keeps BN/SE/fusion statistics honest under
jax_enable_x64 instead of silently truncating to fp32.

Both (ciou, giou) gradients come from one compiled program per model via a
convex-combination trick: grad of (1-c)*L_giou + c*L_ciou evaluated at
c∈{0,1} — the model backward (the expensive part) is shared.
"""

import numpy as np
import pytest
import torch

import jax

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import layers as _L
from double_yolo_kaist_tpu.models.import_weights import (_oihw_to_hwio,
                                                         from_torch_state_dict)
from double_yolo_kaist_tpu.train import loss as LS

from tests.torch_ref import load_reference_yolo

_L.set_precision("highest")

load_reference_yolo()
from build_utils import utils as ref_utils  # noqa: E402

CFG_DIR = "/root/reference/config"

# v3 decode + mish/leaky + Add-SL weighted shortcuts (dual Darknet53), and
# v4 decode + dwconv + SE + hard-swish + weighted fusion (dual MobileNetv3)
CASES = [
    "kaist_dyolov3_add_sl.cfg",
    "kaist_dyolov4_mobilenetv3_fshare_global_cse3.cfg",
]

HYP_BASE = {"box": 3.54, "obj": 64.3, "cls": 37.4, "cls_pw": 1.0,
            "obj_pw": 1.0, "iou_t": 0.20, "fl_gamma": 0.0}


def _targets():
    return np.asarray([
        [0, 0, 0.20, 0.20, 0.10, 0.30],
        [0, 0, 0.70, 0.30, 0.40, 0.40],
        [0, 0, 0.30, 0.80, 0.05, 0.08],
        [1, 0, 0.60, 0.60, 0.20, 0.15],
        [1, 0, 0.15, 0.70, 0.50, 0.60],
        [1, 0, 0.80, 0.20, 0.08, 0.22],
    ], np.float64)


def _torch_loss_and_grads(tm, v, l, t_np, hyp):
    tm.hyp = dict(hyp)
    tm.gr = 1.0
    tm.nc = 1
    tm.train()
    tm.zero_grad(set_to_none=True)
    pred = tm(torch.from_numpy(v), torch.from_numpy(l))
    ld = ref_utils.compute_loss(pred, torch.from_numpy(t_np), tm)
    total = ld["box_loss"] + ld["obj_loss"] + ld["class_loss"]
    total.backward()
    grads = {n: p.grad.detach().numpy() for n, p in tm.named_parameters()
             if p.grad is not None}
    return float(total.detach()), grads


def _rel(mine, ref):
    mine = np.asarray(mine, np.float64)
    ref = np.asarray(ref, np.float64)
    return np.abs(mine - ref).max() / max(np.abs(ref).max(), 1e-12)


@pytest.mark.parametrize("cfg", CASES)
def test_grad_parity_fp64(cfg):
    import jax.numpy as jnp

    from double_yolo_kaist_tpu.models import graph

    path = f"{CFG_DIR}/{cfg}"
    YOLO = load_reference_yolo()
    torch.manual_seed(0)
    tm = YOLO(path, img_size=(64, 64), verbose=False).double()
    ir = compile_cfg(path)

    rng = np.random.default_rng(7)
    B, HW = 2, 64
    v = rng.random((B, 3, HW, HW)).astype(np.float64)
    l = rng.random((B, 3, HW, HW)).astype(np.float64)
    t_np = _targets()

    hyp_g = dict(HYP_BASE)
    hyp_c = dict(HYP_BASE, ciou=1.0)
    ref_loss = {}
    ref_grads = {}
    ref_loss["giou"], ref_grads["giou"] = _torch_loss_and_grads(
        tm, v, l, t_np, hyp_g)
    ref_loss["ciou"], ref_grads["ciou"] = _torch_loss_and_grads(
        tm, v, l, t_np, hyp_c)

    with jax.enable_x64():
        variables = from_torch_state_dict(ir, tm.state_dict())
        variables = jax.tree.map(lambda a: np.asarray(a, np.float64),
                                 variables)
        xv = jnp.asarray(v.transpose(0, 2, 3, 1))
        xl = jnp.asarray(l.transpose(0, 2, 3, 1))
        specs = LS.head_specs(ir)
        labels = [t_np[t_np[:, 0] == b][:, 1:] for b in range(B)]
        targets, tmask = LS.pad_labels(labels, max_targets=8)
        targets = jnp.asarray(targets, jnp.float64)
        tmask = jnp.asarray(tmask)
        state = variables["state"]

        def loss_fn(params, c):
            raws, _ = graph.apply(ir, {"params": params, "state": state},
                                  xv, xl, train=True)
            raws = [r.astype(jnp.float64) for r in raws]
            lg = LS.total_loss(LS.compute_loss(raws, targets, tmask,
                                               specs, hyp_g))
            lc = LS.total_loss(LS.compute_loss(raws, targets, tmask,
                                               specs, hyp_c))
            return (1.0 - c) * lg + c * lc

        gfn = jax.jit(jax.value_and_grad(loss_fn))
        my = {}
        for key, c in (("giou", 0.0), ("ciou", 1.0)):
            lv, grads = gfn(variables["params"], jnp.asarray(c, jnp.float64))
            my[key] = (float(lv), grads)

    first_conv = min(n.index for n in ir.nodes if n.kind == "conv")
    pred_conv = list(ir.yolo_indices)[-1] - 1
    wnodes = [n.index for n in ir.nodes
              if n.kind == "shortcut" and getattr(n, "weighted", False)]
    second = ir.second_index
    assert wnodes, f"{cfg}: expected Add-SL weighted shortcuts"

    for key in ("giou", "ciou"):
        lv, grads = my[key]
        tg = ref_grads[key]
        # loss scalar parity at fp64
        assert abs(lv - ref_loss[key]) < 1e-6 * max(abs(ref_loss[key]), 1.0), (
            cfg, key, lv, ref_loss[key])

        leaves = [
            ("first_conv_w", grads[f"l{first_conv}"]["w"],
             _oihw_to_hwio(tg[f"module_list.{first_conv}.Conv2d.weight"])),
            ("first_bn_scale", grads[f"l{first_conv}"]["bn"]["scale"],
             tg[f"module_list.{first_conv}.BatchNorm2d.weight"]),
            ("predictor_w", grads[f"l{pred_conv}"]["w"],
             _oihw_to_hwio(tg[f"module_list.{pred_conv}.Conv2d.weight"])),
            ("predictor_b", grads[f"l{pred_conv}"]["b"],
             tg[f"module_list.{pred_conv}.Conv2d.bias"]),
            ("lwir_stem_w", grads[f"l{second}"]["w"],
             _oihw_to_hwio(tg[f"module_list.{second}.Conv2d.weight"])),
        ]
        for wi in wnodes[:2]:
            leaves.append((f"addsl_w_l{wi}", grads[f"l{wi}"]["w"],
                           tg[f"module_list.{wi}.w"]))

        for name, mine, ref in leaves:
            r = _rel(mine, ref)
            # measured residual ~5e-8 (remaining fp32-kept constants);
            # 1e-6 gives two orders of margin while catching any semantic
            # divergence (a wrong gradient is O(1e-2..1) relative)
            assert r < 1e-6, (cfg, key, name, r)
