"""Probe: can the image pool live in the TPU host's pinned memory?

The device-resident pool (data/pipeline.device_image_pool) removes the
per-batch image upload, but costs HBM that the train step needs (a 2 GB
pool OOMed the bs32 spd4 flagship run). A pool in `pinned_host` memory
would hold full KAIST (15.7 GB) at zero HBM cost IF XLA implements the
per-batch row gather as a host->device DMA of just the selected rows
(PCIe-speed, server-side — the slow axon tunnel link is only paid once at
pool build).

Measures, per batch of B rows from an N-row uint8 (H, W, 3) pool:
  a) gather from an HBM-resident pool           (today's fast path)
  b) gather from a pinned_host-resident pool    (the candidate)
  c) fresh h2d upload of B rows                 (the streaming baseline)

Timing mirrors bench.py: the gather runs inside a jitted fori_loop whose
carry perturbs the index vector (so XLA cannot hoist it), reduced to one
scalar; the 1-iter run is subtracted to cancel dispatch/fetch overhead.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import SingleDeviceSharding

N, B, H, W = 256, 64, 512, 640   # pool 63 MB/stream; batch gather 63 MB


def timed_loop(pool, iters):
    dev = jax.devices()[0]
    sharding = jax.typeof(pool).sharding if hasattr(jax, "typeof") else None

    def loop(p, n):
        def body(i, acc):
            idx = (jnp.arange(B, dtype=jnp.int32) * 3 + i
                   + (acc * 1e-18).astype(jnp.int32)) % N
            rows = jnp.take(p, idx, axis=0)
            return jnp.sum(rows, dtype=jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    loop_j = jax.jit(loop, static_argnums=1,
                     out_shardings=SingleDeviceSharding(dev))
    np.asarray(loop_j(pool, 1))
    np.asarray(loop_j(pool, 1 + iters))
    base_t, full_t = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop_j(pool, 1))
        base_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(loop_j(pool, 1 + iters))
        full_t.append(time.perf_counter() - t0)
    dt = (min(full_t) - min(base_t)) / iters
    gb = B * H * W * 3 / 1e9
    return dt, gb / dt


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}, memories: "
          f"{[m.kind for m in getattr(dev, 'addressable_memories', lambda: [])()]}",
          flush=True)
    rng = np.random.default_rng(0)
    pool_np = rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8)

    t0 = time.perf_counter()
    hbm = jax.device_put(pool_np, SingleDeviceSharding(dev))
    jax.block_until_ready(hbm)
    print(f"pool->HBM upload: {time.perf_counter() - t0:.2f}s", flush=True)
    dt, bw = timed_loop(hbm, 16)
    print(f"a) HBM-pool gather:    {dt * 1e3:7.2f} ms/batch  {bw:7.2f} GB/s",
          flush=True)

    try:
        hostmem = SingleDeviceSharding(dev, memory_kind="pinned_host")
        t0 = time.perf_counter()
        ph = jax.device_put(pool_np, hostmem)
        jax.block_until_ready(ph)
        print(f"pool->pinned_host upload: {time.perf_counter() - t0:.2f}s",
              flush=True)
        dt, bw = timed_loop(ph, 16)
        print(f"b) host-pool gather:   {dt * 1e3:7.2f} ms/batch  "
              f"{bw:7.2f} GB/s", flush=True)
    except Exception as e:  # noqa: BLE001 — probe: report and move on
        print(f"b) pinned_host path unavailable: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # b2) same, but the gather is explicitly host compute (XLA host
    # offloading): indices transferred to pinned_host, rows gathered there,
    # result transferred back to HBM
    try:
        from jax.experimental.compute_on import compute_on

        hostm = SingleDeviceSharding(dev, memory_kind="pinned_host")
        ph = jax.device_put(pool_np, hostm)
        jax.block_until_ready(ph)

        @compute_on("device_host")
        @jax.jit
        def host_gather(p, idx):
            # promise_in_bounds (.at[].get spelling — jnp.take rejects it):
            # the default clamp traces device-space constants into the host
            # computation, which XLA rejects
            return p.at[idx].get(mode="promise_in_bounds")

        devm = SingleDeviceSharding(dev, memory_kind="device")

        def loop2(p, n):
            def body(i, acc):
                idx = (jnp.arange(B, dtype=jnp.int32) * 3 + i
                       + (acc * 1e-18).astype(jnp.int32)) % N
                idx_h = jax.device_put(idx, hostm)
                rows_h = host_gather(p, idx_h)
                rows = jax.device_put(rows_h, devm)
                return jnp.sum(rows, dtype=jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        loop2_j = jax.jit(loop2, static_argnums=1,
                          out_shardings=SingleDeviceSharding(dev))
        np.asarray(loop2_j(ph, 1))
        np.asarray(loop2_j(ph, 17))
        base_t, full_t = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop2_j(ph, 1))
            base_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(loop2_j(ph, 17))
            full_t.append(time.perf_counter() - t0)
        dt = (min(full_t) - min(base_t)) / 16
        gb = B * H * W * 3 / 1e9
        print(f"b2) host-compute gather: {dt * 1e3:7.2f} ms/batch  "
              f"{gb / dt:7.2f} GB/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"b2) host-compute gather unavailable: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # c) streaming baseline: fresh h2d of B rows (new buffer each time so
    # the tunnel cannot dedupe), timed end-to-end
    ts = []
    for i in range(3):
        rows = pool_np[(np.arange(B) * 3 + i) % N].copy()
        t0 = time.perf_counter()
        a = jax.device_put(rows, SingleDeviceSharding(dev))
        np.asarray(jnp.sum(a, dtype=jnp.float32))
        ts.append(time.perf_counter() - t0)
    gb = B * H * W * 3 / 1e9
    print(f"c) fresh h2d upload:   {min(ts) * 1e3:7.2f} ms/batch  "
          f"{gb / min(ts):7.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
