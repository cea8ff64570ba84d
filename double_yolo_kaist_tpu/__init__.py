"""double_yolo_kaist_tpu — TPU-native dual-stream multispectral YOLO framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capability surface of
Ye-zixiao/Double-YOLO-Kaist (RGB+LWIR pedestrian detection on KAIST): the
darknet ``.cfg`` model zoo compiles to pure jitted functions, augmentation runs
as batched on-device ops, NMS/decode are fixed-shape device kernels, and
training is pjit data-parallel over a TPU mesh.
"""

__version__ = "0.1.0"

from .config.parser import parse_model_cfg, parse_data_cfg, load_hyp  # noqa: F401
from .config.ir import compile_cfg, GraphIR  # noqa: F401


def __getattr__(name):
    # lazy heavyweight entry points (avoid importing jax at package import)
    if name == "Predictor":
        from .serving import Predictor
        return Predictor
    if name == "Trainer":
        from .train.trainer import Trainer
        return Trainer
    raise AttributeError(name)
