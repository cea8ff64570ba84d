"""Production inference API: a batching, shape-bucketed Predictor.

The reference has no serving layer (detect.py is a one-off script); this is
the deployment-facing surface for the TPU build: BN-folded bf16 forward +
fixed-shape NMS compiled once per (batch, resolution) bucket, with automatic
padding of partial batches so no new XLA programs are compiled at serve time.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .config.ir import compile_cfg
from .data.pipeline import make_letterbox_fn
from .models import graph
from .ops import nms as NMS


class Predictor:
    def __init__(self, cfg: str, variables: dict, *, img_size: int = 512,
                 conf_thres: float = 0.1, iou_thres: float = 0.5,
                 multi_label: bool = True, max_det: int = 100,
                 batch_buckets: Sequence[int] = (1, 8, 32),
                 compute_dtype=jnp.bfloat16, int8: bool = False,
                 int8_mode: str = "chain", calibration_batches: int = 2,
                 calibration_pct: float = 100.0, calibration=None,
                 quantized=None, mesh=None):
        """``int8``: serve the post-training-quantized path
        (models/quantize.py). Activation scales are calibrated on the first
        ``calibration_batches`` batches served (production pattern: warm the
        server with representative traffic); until then requests run the
        bf16 path. ``calibration_pct``: percentile max-abs clipping.
        Default 100.0 (exact max-abs) everywhere — the framework-wide
        default, matching eval/evaluator.py and bench.py: with the small
        calibration sets used here (2 batches), percentile clipping
        discards genuine dynamic range and was measured to COST accuracy
        (overfit AP sweep: mode='all' 78.4% at pct=100 vs 56.2% at 99.9;
        no mode improved), while exact max-abs never lost AP. Pass 99.x
        only when calibrating on long outlier-prone traffic.

        ``calibration``: path to a calibration artifact
        (models/quantize.save_calibration, produced offline by
        tools/calibrate.py). If the file exists, activation scales load
        from it and the int8 path is live from the FIRST request — no
        traffic-dependent warmup window. If it doesn't exist yet, stats
        measured from the first ``calibration_batches`` requests are
        written there, freezing this server's calibration for the fleet.

        ``quantized``: path to a finished quantized-variables artifact
        (models/quantize.save_quantized). Loading it skips fold+quantize
        entirely — int8 replicas start as fast as bf16 ones (requantizing
        at startup costs a full quantize-jit compile, ~13 min for the
        flagship through the tunnel). If the file doesn't exist it is
        written after this server's first quantization. Takes precedence
        over ``calibration``.

        ``mesh``: optional jax.sharding.Mesh — every serve program runs
        data-parallel over the mesh's first axis (requests sharded over the
        batch, params replicated; outputs bit-identical to single-device).
        Batch buckets are rounded up to device-count multiples. This is how
        the flagship reaches past its single-chip roofline: per-chip fps is
        bandwidth/MXU bound (docs/ROADMAP.md), so deployment throughput
        scales with mesh size."""
        self.ir = compile_cfg(cfg) if isinstance(cfg, str) else cfg
        self.mesh = mesh
        self._ndev = 1
        self._rep = self._bsh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._ndev = int(mesh.shape[mesh.axis_names[0]])
            self._rep = NamedSharding(mesh, P())
            self._bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
        self.folded = jax.jit(
            lambda v: graph.prepare_folded(
                self.ir, graph.fold_batchnorm(self.ir, v),
                img_size, img_size))(variables)
        if self._rep is not None:
            self.folded = jax.device_put(self.folded, self._rep)
        self.img_size = img_size
        # buckets must shard evenly over the mesh's batch axis
        self.batch_buckets = sorted(
            {-(-b // self._ndev) * self._ndev for b in batch_buckets})
        self.conf_thres = conf_thres
        self._pre_cache: dict = {}
        self._dtype = compute_dtype
        self._int8 = int8
        self._int8_mode = int8_mode
        self._qvars = None
        self._cal_batches: list = []
        self._cal_needed = max(1, int(calibration_batches))
        self._cal_pct = float(calibration_pct)

        def _nms(io):
            return NMS.non_max_suppression(
                io.astype(jnp.float32), conf_thres=conf_thres,
                iou_thres=iou_thres, multi_label=multi_label,
                max_det=max_det)

        def _jit(fn):
            if self.mesh is None:
                return jax.jit(fn)
            return jax.jit(fn, in_shardings=(self._rep, self._bsh,
                                             self._bsh),
                           out_shardings=self._bsh)

        def infer(params, xv, xl):
            io, _ = graph.apply_folded(self.ir, params, xv, xl,
                                       compute_dtype=compute_dtype)
            return _nms(io)

        self._jit = _jit
        self._infer = _jit(infer)
        self._infer_raw = infer
        self._infer_q_raw = None
        self._run_cache: dict = {}

        if int8:
            import os as _os

            from .models import quantize as Q

            # mirror evaluator.py's gate: a quantized artifact that exists
            # on disk is authoritative (it carries its own mode/hw
            # validation below) — only downgrade to bf16 on an empty plan
            # when no artifact will be loaded, otherwise an explicitly
            # provided artifact would silently serve bf16 unvalidated
            has_artifact = quantized and _os.path.exists(str(quantized))
            if not has_artifact and Q.warn_if_empty_plan(
                    self.ir, int8_mode, "serving bf16"):
                # e.g. the MobileNet family (measured 35% regression when
                # their stems were quantized): nothing to quantize, so
                # serve bf16 and skip calibration entirely
                int8 = self._int8 = False

        if int8:
            def infer_q(params, xv, xl):
                io, _ = Q.apply_quantized(self.ir, params, xv, xl,
                                          compute_dtype=compute_dtype,
                                          mode=int8_mode)
                return _nms(io)

            self._infer_q = _jit(infer_q)
            self._infer_q_raw = infer_q

        self._cal_path = str(calibration) if calibration else None
        self._q_path = str(quantized) if quantized else None
        if int8 and (self._q_path or self._cal_path):
            import os as _os

            from .models import quantize as Q
            if self._q_path and _os.path.exists(self._q_path):
                qv, qmode, qhw = Q.load_quantized(self._q_path)
                if qmode != int8_mode:
                    raise ValueError(
                        f"quantized artifact {self._q_path} was built for "
                        f"mode={qmode!r}, server requested {int8_mode!r}")
                if (qhw is not None and qhw != (img_size, img_size)
                        and graph._S2D_REGION):
                    # hw names the prepare size; for seed/chain/all the only
                    # hw-dependence is the s2d plan the kernels were
                    # transformed for (quantize.py), so an artifact prepared
                    # at a different size is fully valid whenever the plans
                    # agree (they are shape-stable across standard serving
                    # sizes — e.g. bench.py's 512x640 artifacts serve an
                    # img_size=512 server). With DYK_S2D_REGION=0 nothing
                    # hw-dependent is consulted, so any hw is fine. edge
                    # plans are hw-derived, so they keep the strict check.
                    if int8_mode == "edge":
                        raise ValueError(
                            f"quantized artifact {self._q_path} prepared "
                            f"for hw={qhw}, server img_size={img_size}: "
                            f"edge-mode plans are derived from the prepare "
                            f"size, so edge artifacts require an exact "
                            f"match — re-export with tools/calibrate.py")
                    if (graph.s2d_plan(self.ir, *qhw)
                            != graph.s2d_plan(self.ir, img_size, img_size)):
                        raise ValueError(
                            f"quantized artifact {self._q_path} prepared "
                            f"for hw={qhw}, server img_size={img_size}, "
                            f"and the s2d plans differ — its kernels would "
                            f"silently fall back to per-call transforms; "
                            f"re-export with tools/calibrate.py")
                qv = jax.tree.map(jnp.asarray, qv)
                self._qvars = (jax.device_put(qv, self._rep)
                               if self._rep is not None else qv)
            elif self._cal_path and _os.path.exists(self._cal_path):
                stats, _pct = Q.load_calibration(self._cal_path)
                self._quantize_from_stats(stats)

    def _full_program(self, src_hw, quant: bool):
        """One jitted program for the whole request: uint8 letterbox +
        forward + NMS, with the valid mask packed into the detections
        array — a single device dispatch and a single host fetch per
        bucket (the split pipeline costs 4 round trips, which dominates
        per-request latency over high-latency links and still wastes two
        host round trips on PCIe)."""
        key = (src_hw, quant)
        prog = self._run_cache.get(key)
        if prog is None:
            fn, _, _ = self._preprocess(src_hw)
            body = self._infer_q_raw if quant else self._infer_raw

            def run(params, v_u8, l_u8):
                xv, xl = fn(v_u8, l_u8)
                det, valid = body(params, xv, xl)
                return jnp.concatenate(
                    [det, valid[..., None].astype(det.dtype)], axis=-1)

            prog = self._run_cache[key] = self._jit(run)
        return prog

    def _quantize_from_stats(self, stats: dict) -> None:
        import os as _os

        from .models import quantize as Q
        hw = (self.img_size, self.img_size)
        self._qvars = jax.jit(
            lambda f: Q.quantize(self.ir, f, stats,
                                 mode=self._int8_mode, hw=hw))(self.folded)
        if self._rep is not None:
            self._qvars = jax.device_put(self._qvars, self._rep)
        if self._q_path and not _os.path.exists(self._q_path):
            Q.save_quantized(self._q_path, self._qvars,
                             mode=self._int8_mode, hw=hw)

    def _ensure_calibrated(self, xv, xl):
        """Accumulate warm-up batches, then quantize. Returns True once the
        int8 weights exist (traffic before that runs the bf16 path)."""
        if self._qvars is not None:
            return True
        self._cal_batches.append((xv, xl))
        if len(self._cal_batches) < self._cal_needed:
            return False
        from .models import quantize as Q
        stats = Q.calibrate(self.ir, self.folded, self._cal_batches,
                            compute_dtype=self._dtype, pct=self._cal_pct)
        if self._cal_path:
            Q.save_calibration(self._cal_path, stats, pct=self._cal_pct)
        self._quantize_from_stats(stats)
        self._cal_batches = []
        return True

    def warmup(self, src_hw: tuple, batch: int | None = None) -> None:
        """Precompile the serve-time programs for a native frame size WITHOUT
        touching int8 calibration state.

        Serving a dummy frame through ``__call__`` is the wrong warmup under
        ``int8=True``: the all-zeros batch would be appended to
        ``_cal_batches`` and consume one of the ``calibration_batches`` slots
        while contributing nothing to the max-abs statistics — activation
        scales would then be calibrated from less real traffic. This path
        compiles the bf16 full program (letterbox + forward + NMS) on a
        zeros batch and leaves calibration entirely to real requests.

        ``batch`` is snapped to the bucket __call__ would actually pick —
        warming an off-bucket shape would waste the compile AND, on a mesh,
        a batch not divisible by the device count fails the 'data' sharding
        outright."""
        b = self._bucket(batch) if batch else self.batch_buckets[0]
        z = np.zeros((b,) + tuple(src_hw) + (3,), np.uint8)
        np.asarray(self._full_program(tuple(src_hw), False)(
            self.folded, jnp.asarray(z), jnp.asarray(z)))

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.batch_buckets[-1]

    def _preprocess(self, src_hw):
        if src_hw not in self._pre_cache:
            s = self.img_size
            r = s / max(src_hw)
            dst = (int(np.ceil(src_hw[0] * r / 64) * 64),
                   int(np.ceil(src_hw[1] * r / 64) * 64))
            self._pre_cache[src_hw] = make_letterbox_fn(src_hw, dst,
                                                        scale_up=False)
        return self._pre_cache[src_hw]

    def __call__(self, v_imgs: np.ndarray, l_imgs: Optional[np.ndarray] = None):
        """v_imgs/l_imgs: (N, H, W, 3) uint8 RGB at native size.

        Returns list of (boxes xyxy in the ORIGINAL frame, scores, classes)
        per image."""
        n = len(v_imgs)
        if l_imgs is None:
            l_imgs = v_imgs
        src_hw = tuple(v_imgs.shape[1:3])
        fn, ratio, pad = self._preprocess(src_hw)

        bucket = self._bucket(n)
        out = []
        for b0 in range(0, n, bucket):
            chunk_v = v_imgs[b0:b0 + bucket]
            chunk_l = l_imgs[b0:b0 + bucket]
            real = len(chunk_v)
            if real < bucket:   # pad to the compiled batch shape
                padn = bucket - real
                chunk_v = np.concatenate(
                    [chunk_v, np.zeros((padn,) + chunk_v.shape[1:],
                                       chunk_v.dtype)])
                chunk_l = np.concatenate(
                    [chunk_l, np.zeros((padn,) + chunk_l.shape[1:],
                                       chunk_l.dtype)])
            if self._int8 and self._qvars is None:
                # calibration phase: split pipeline (needs the letterboxed
                # activations host-side accumulation)
                xv, xl = fn(jnp.asarray(chunk_v), jnp.asarray(chunk_l))
                if self._ensure_calibrated(xv, xl):
                    det, valid = self._infer_q(self._qvars, xv, xl)
                else:
                    det, valid = self._infer(self.folded, xv, xl)
                det = np.asarray(det)
                valid = np.asarray(valid).astype(bool)
            else:
                quant = self._int8
                params = self._qvars if quant else self.folded
                packed = np.asarray(self._full_program(src_hw, quant)(
                    params, jnp.asarray(chunk_v), jnp.asarray(chunk_l)))
                det, valid = packed[..., :6], packed[..., 6] > 0.5
            from .export import unpack_detections
            out.extend(unpack_detections(det, valid, real, ratio[0], pad,
                                         src_hw))
        return out


class QueueFull(RuntimeError):
    """Raised by MicroBatcher.submit when the pending queue exceeds
    max_queue — the server should shed the request (HTTP 503) instead of
    letting tail latency grow without bound."""


class MicroBatcher:
    """Cross-request micro-batching: coalesce concurrent single-frame
    requests into one batched predictor call.

    The reference serves detect.py one image at a time (detect.py:24-78);
    a production endpoint sees concurrent traffic, and running each request
    as its own bs-1 program serializes the device at single-image latency
    while the chip's bs-16 program is ~2x the aggregate throughput
    (docs/ROADMAP.md roofline). This wraps any batch-capable predictor
    (``Predictor`` or ``export.ExportedPredictor``) with the continuous-
    batching pattern:

    * a single dispatcher thread owns the device; request threads enqueue
      frames and block on a per-request event;
    * the dispatcher takes EVERYTHING pending (same source shape, up to
      ``max_batch``) the moment it is free — an idle server runs a lone
      request immediately, adding no latency;
    * while a batch executes on-device, new arrivals pile up and form the
      next batch, so under load the batch size self-adjusts to the device's
      throughput equilibrium — no tuning knob, no timer;
    * ``max_wait_ms`` (optional, default 0) additionally holds the FIRST
      request of a batch for a fixed window to reach bigger buckets at
      moderate load, trading tail latency for throughput.

    Results are bit-identical to unbatched serving: the fixed-shape NMS is
    per-image, and partial buckets are zero-padded by the predictor itself.
    """

    def __init__(self, predictor, *, max_batch: int = 16,
                 max_wait_ms: float = 0.0, max_queue: int | None = None):
        import threading

        self.predictor = predictor
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        # backpressure: beyond this many queued frames submit() fails fast
        # with QueueFull (callers map it to HTTP 503) instead of blocking
        # every server thread behind an unbounded queue
        self.max_queue = None if max_queue is None else int(max_queue)
        self._lock = threading.Lock()
        self._arrived = threading.Condition(self._lock)
        self._pending: list = []       # [request dicts], FIFO
        self._stop = False
        # dispatch statistics (read via .stats for observability/load tests)
        self._n_batches = 0
        self._n_frames = 0
        self._size_hist: dict = {}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="microbatch-dispatcher")
        self._thread.start()

    @property
    def stats(self) -> dict:
        """Coalescing statistics: how well concurrent traffic batches."""
        n = max(self._n_batches, 1)
        return {"batches": self._n_batches, "frames": self._n_frames,
                "mean_batch": round(self._n_frames / n, 2),
                "size_hist": dict(sorted(self._size_hist.items()))}

    def close(self) -> None:
        with self._lock:
            self._stop = True
            self._arrived.notify()
        self._thread.join(timeout=5)

    def submit(self, v_img: np.ndarray, l_img: np.ndarray | None = None):
        """One frame in (H, W, 3) uint8 -> (boxes, scores, classes).
        Blocks until the coalesced batch containing this frame completes.
        Thread-safe; call from each request handler thread."""
        import threading

        req = {"v": np.asarray(v_img),
               "l": np.asarray(v_img if l_img is None else l_img),
               "done": threading.Event(), "t0": time.monotonic()}
        if req["v"].shape != req["l"].shape:
            raise ValueError(f"visible/lwir shape mismatch: "
                             f"{req['v'].shape} vs {req['l'].shape}")
        with self._lock:
            if self._stop:
                raise RuntimeError("MicroBatcher is closed")
            if (self.max_queue is not None
                    and len(self._pending) >= self.max_queue):
                raise QueueFull(
                    f"{len(self._pending)} requests already queued "
                    f"(max_queue={self.max_queue})")
            self._pending.append(req)
            self._arrived.notify()
        req["done"].wait()
        if "err" in req:
            raise req["err"]
        return req["res"]

    # ------------------------------------------------------------- internal

    def _take_batch(self) -> list:
        """Called with the lock held and _pending non-empty: pop the oldest
        request plus every same-shape request after it, up to max_batch."""
        if self.max_wait > 0:
            deadline = self._pending[0]["t0"] + self.max_wait
            while (len(self._pending) < self.max_batch and not self._stop):
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                self._arrived.wait(left)
                if not self._pending:   # raced with close()
                    return []
        shape = self._pending[0]["v"].shape
        take, keep = [], []
        for r in self._pending:
            if r["v"].shape == shape and len(take) < self.max_batch:
                take.append(r)
            else:
                keep.append(r)
        self._pending = keep
        return take

    def _loop(self) -> None:
        while True:
            with self._lock:
                while not self._pending and not self._stop:
                    self._arrived.wait()
                if self._stop:
                    batch, self._pending = self._pending, []
                    for r in batch:
                        r["err"] = RuntimeError("MicroBatcher closed")
                        r["done"].set()
                    return
                batch = self._take_batch()
            if not batch:
                continue
            self._n_batches += 1
            self._n_frames += len(batch)
            self._size_hist[len(batch)] = (
                self._size_hist.get(len(batch), 0) + 1)
            try:
                res = self.predictor(np.stack([r["v"] for r in batch]),
                                     np.stack([r["l"] for r in batch]))
                for r, out in zip(batch, res):
                    r["res"] = out
            except Exception as e:  # noqa: BLE001 — deliver to submitters
                for r in batch:
                    r["err"] = e
            for r in batch:
                r["done"].set()
