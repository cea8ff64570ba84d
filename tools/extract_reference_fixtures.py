"""Extract golden metadata fixtures from the PyTorch reference at /root/reference.

Runs the reference's own model builder (models.py:create_modules) on every .cfg in
its config/ directory, executes one forward pass with per-module hooks, and records
per layer: type, output shape (channels + spatial dims), routs flags, and per YOLO
head: stride / anchors / class count / box-formula type. The JSON output
(tests/fixtures/reference_model_meta.json) pins our cfg->IR compiler to the
reference's channel/stride bookkeeping (reference models.py:7-155) without copying
any reference code into the framework.

Usage: python tools/extract_reference_fixtures.py
"""

import json
import os
import sys
import types


def _patch_reference_imports():
    import cv2 as real_cv2
    real_cv2.cv2 = real_cv2  # reference uses `from cv2 import cv2`
    tv = types.ModuleType("torchvision")
    tv.ops = types.SimpleNamespace(nms=None)
    sys.modules["torchvision"] = tv
    sys.path.insert(0, "/root/reference")


def main():
    _patch_reference_imports()
    import torch
    from models import YOLO  # reference models.py

    cfg_dir = "/root/reference/config"
    out = {}
    for name in sorted(os.listdir(cfg_dir)):
        if not name.endswith(".cfg"):
            continue
        path = os.path.join(cfg_dir, name)
        try:
            m = YOLO(path, img_size=(512, 512), verbose=False)
        except Exception as e:  # record builder failures too
            out[name] = {"error": repr(e)}
            print(f"{name}: BUILD ERROR {e}")
            continue
        m.eval()

        shapes = [None] * len(m.module_list)

        def mk_hook(i):
            def hook(mod, inp, output):
                o = output
                if isinstance(o, tuple):  # YOLOLayer eval returns (io, p)
                    o = o[0]
                shapes[i] = list(o.shape)
            return hook

        handles = [mod.register_forward_hook(mk_hook(i))
                   for i, mod in enumerate(m.module_list)]

        h = w = 64
        x = torch.zeros(1, 3, h, w)
        y = torch.zeros(1, 3, h, w)
        fwd_error = None
        try:
            with torch.no_grad():
                if "second_index" in m.net_info:
                    m(x, y)
                else:
                    m(x)
        except Exception as e:
            fwd_error = repr(e)
        for hd in handles:
            hd.remove()

        per_layer_params = [sum(p.numel() for p in mod.parameters())
                            for mod in m.module_list]
        yolos = []
        for i, mod in enumerate(m.module_list):
            if mod.__class__.__name__ == "YOLOLayer":
                yolos.append({
                    "index": i,
                    "stride": int(mod.stride),
                    "nc": int(mod.nc),
                    "na": int(mod.na),
                    "anchors": mod.anchors.tolist(),
                    "bf_type": mod.bf_type,
                })

        out[name] = {
            "n_layers": len(m.module_list),
            "second_index": m.net_info.get("second_index", None),
            "layer_types": [d["type"] for d in m.module_defs],
            "out_shapes": shapes,  # NCHW per layer at 64x64 input
            "per_layer_params": per_layer_params,
            "total_params": int(sum(p.numel() for p in m.parameters())),
            "routs": [bool(r) for r in m.routs],
            "yolos": yolos,
            "fwd_error": fwd_error,
            "input_hw": [h, w],
        }
        print(f"{name}: {len(m.module_list)} layers, "
              f"{out[name]['total_params'] / 1e6:.2f}M params, "
              f"second_index={out[name]['second_index']}, "
              f"fwd_error={fwd_error}")

    dst = os.path.join(os.path.dirname(__file__), "..",
                       "tests", "fixtures", "reference_model_meta.json")
    with open(dst, "w") as f:
        json.dump(out, f)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
