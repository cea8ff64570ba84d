"""Layout micro-probe backing the round-4 augment rewrite: the SAME
row-gather + column-gather (a separable bilinear's memory pattern) on a
canvas-sized image batch, NHWC (C=3 minor) vs channel-leading NCHW.

Hypothesis from tools/hlo_census.py on the augment program: C-minor image
tensors get layout {3,2,1,0:T(8,128)(2,1)} — 3 lanes padded to 128, a 42.7x
physical blowup on every materialized gather/transpose. If true, the NCHW
variant should be ~an order of magnitude faster.

  python tools/archive/layout_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

B, H, W = 8, 1024, 1024
OH, OW = 512, 512
R = 16   # repeats inside one dispatch (amortize the ~100 ms tunnel latency)


def sync(x):
    np.asarray(jax.device_get(x if getattr(x, "ndim", 0) == 0 else x[(0,) * x.ndim]))


def bench(fn, *args, n=3):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t)
    return min(ts) / R * 1e3


def main():
    key = jax.random.PRNGKey(0)
    mk_hwc = jax.jit(lambda k: jax.random.uniform(k, (B, H, W, 3), jnp.bfloat16))
    mk_chw = jax.jit(lambda k: jax.random.uniform(k, (B, 3, H, W), jnp.bfloat16))
    x_hwc, x_chw = mk_hwc(key), mk_chw(key)
    sync(x_hwc); sync(x_chw)

    yi = jnp.arange(OH) * 2
    xi = jnp.arange(OW) * 2

    @jax.jit
    def g_hwc(x):
        def once(c, _):
            r = jnp.take(c, yi, axis=1)          # (B, OH, W, 3)
            v = jnp.take(r, xi, axis=2)          # (B, OH, OW, 3)
            return c, v.sum()
        _, s = jax.lax.scan(once, x, None, length=R)
        return s.sum()

    @jax.jit
    def g_chw(x):
        def once(c, _):
            r = jnp.take(c, yi, axis=2)          # (B, 3, OH, W)
            v = jnp.take(r, xi, axis=3)          # (B, 3, OH, OW)
            return c, v.sum()
        _, s = jax.lax.scan(once, x, None, length=R)
        return s.sum()

    t_hwc = bench(g_hwc, x_hwc)
    t_chw = bench(g_chw, x_chw)
    print(f"row+col gather {B}x{H}x{W}x3 -> {OH}x{OW}: "
          f"NHWC {t_hwc:.2f} ms   NCHW {t_chw:.2f} ms   "
          f"ratio {t_hwc / t_chw:.1f}x", flush=True)


if __name__ == "__main__":
    main()
