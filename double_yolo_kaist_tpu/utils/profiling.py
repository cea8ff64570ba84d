"""Profiling / tracing utilities.

Replaces the reference's wall-clock-only instrumentation
(torch_utils.py:18-20 time_synchronized, torch_utils.py:55-74 model_info
GFLOPs, distributed_utils.py:180-231 per-iter timing) with:
  * device_sync_time(): wall clock with a forced device round-trip — through
    the axon tunnel ``block_until_ready`` returns early, so sync is a tiny
    host fetch;
  * trace(): context manager around jax.profiler for real XLA traces;
  * flops_estimate(): analytic conv-FLOP count from the IR (no thop needed);
  * StepTimer: rolling step/data-time accounting for the train loop.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


def device_sync(x) -> None:
    """Force execution + completion of `x` (tunnel-safe: fetches one leaf)."""
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


def device_sync_time(fn, *args, repeats: int = 1):
    """Run fn(*args) ``repeats`` times; return (seconds_per_call, last_out)."""
    out = fn(*args)
    device_sync(out)          # warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / repeats, out


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context; view with tensorboard or xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def flops_estimate(ir, img_hw=(512, 640)) -> float:
    """Analytic multiply-add FLOPs (x2) of one dual/single-stream forward."""
    from ..config.ir import infer_shapes

    shapes = infer_shapes(ir, *img_hw)
    total = 0.0
    for node in ir.nodes:
        if node.kind == "conv":
            c, h, w = shapes[node.index]
            total += 2 * h * w * node.kernel ** 2 * (
                node.in_ch // node.groups) * node.out_ch
        elif node.kind == "dwconv":
            c, h, w = shapes[node.index]
            total += 2 * h * w * (node.kernel ** 2 * node.in_ch
                                  + node.in_ch * node.out_ch)
        elif node.kind == "inception":
            c, h, w = shapes[node.index]
            icp = node.icp
            ci = node.in_ch
            total += 2 * h * w * (
                ci * icp["n1x1"] + ci * icp["n3x3_reduce"]
                + 9 * icp["n3x3_reduce"] * icp["n3x3"]
                + ci * icp["n5x5_reduce"] + 9 * icp["n5x5_reduce"] * icp["n5x5"]
                + 9 * icp["n5x5"] ** 2 + ci * icp["pool_proj"])
        elif node.kind == "se":
            total += 2 * 2 * node.in_ch * node.squeeze_ch
    return total


class StepTimer:
    """Rolling data-load vs step-compute timer for train loops."""

    def __init__(self, window: int = 50):
        self.data_times: list = []
        self.step_times: list = []
        self.window = window
        self._t = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_times.append(now - self._t)
        self._t = now

    def step_done(self):
        now = time.perf_counter()
        self.step_times.append(now - self._t)
        self._t = now

    def summary(self) -> str:
        d = np.mean(self.data_times[-self.window:]) if self.data_times else 0
        s = np.mean(self.step_times[-self.window:]) if self.step_times else 0
        return f"data {d * 1e3:.1f}ms step {s * 1e3:.1f}ms"
