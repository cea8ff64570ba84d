"""Helper: load the PyTorch reference (read-only at /root/reference) for
numerical parity tests. Stubs torchvision (not installed) and aliases cv2 so
the reference's imports resolve."""

import sys
import types


def load_reference_yolo():
    if "/root/reference" not in sys.path:
        import cv2 as real_cv2
        real_cv2.cv2 = real_cv2
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=None)
        sys.modules["torchvision"] = tv
        sys.path.insert(0, "/root/reference")
    from models import YOLO  # reference models.py
    return YOLO
