"""Offline evaluation driver: COCO 12-stat summary + VOC-AP@0.5 + LAMR + FPS
over a KAIST split (re-architecture of reference evaluate.py:31-123 and the
in-train eval kaist_train_eval_utils.py:121-190).

Device side: jitted forward + decode + fixed-shape NMS (no per-image Python).
Host side: letterbox undo, metric accumulation (numpy).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data.pipeline import eval_batches
from ..models import graph
from ..ops import nms as NMS
from .coco_map import evaluate_coco
from .metrics import compute_ap_lamr


def _undo_letterbox(boxes: np.ndarray, ratio, pad, orig_hw):
    """scale_coords on host numpy (reference utils.py:60-84)."""
    gain = ratio[0]
    out = boxes.copy()
    out[:, [0, 2]] -= pad[0]
    out[:, [1, 3]] -= pad[1]
    out /= gain
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, orig_hw[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, orig_hw[0])
    return out


# jitted infer/fold programs reused across evaluate_dataset calls (a fresh
# closure per call would re-trace the full model every epoch); bounded so
# model/size sweeps in one process can't pin compiled executables forever
# (same rationale as data/pipeline._TRAIN_AUG_CACHE)
_INFER_CACHE: dict = {}
_INFER_CACHE_MAX = 8


def _cached(key, build):
    fn = _INFER_CACHE.get(key)
    if fn is None:
        if len(_INFER_CACHE) >= _INFER_CACHE_MAX:
            _INFER_CACHE.pop(next(iter(_INFER_CACHE)))
        fn = _INFER_CACHE[key] = build()
    return fn


def evaluate_dataset(ir, variables, dataset, *, batch_size: int = 32,
                     conf_thres: float = 0.01, iou_thres: float = 0.6,
                     multi_label: bool = False, compute_dtype=jnp.bfloat16,
                     folded: bool = True, max_det: int = 100,
                     progress: bool = False, int8: bool = False,
                     int8_mode: str = "chain", calibration_batches: int = 2,
                     calibration_pct: float = 100.0, calibration=None,
                     quantized=None, merge: bool = False, mesh=None,
                     device_cache: bool | None = None):
    """Run the full eval loop. Returns dict with coco stats (12,), ap, lamr,
    fps, curves, and per-image predictions. ``int8``: selective PTQ inference
    calibrated on the first ``calibration_batches`` eval batches;
    ``int8_mode``: quantization plan (models/quantize.plan_quantization).

    ``mesh``: optional jax.sharding.Mesh — the fused infer program (forward
    + decode + NMS) runs DATA-PARALLEL over its first axis: batch leaves
    sharded, params replicated, per-image NMS is embarrassingly parallel so
    no cross-device collectives are needed and outputs are bit-identical to
    the single-device program. Partial batches are zero-padded to a
    device-count multiple and the padding sliced off after the fetch. This
    is the deployment-scale path: per-chip throughput is bandwidth/MXU
    bound (docs/ROADMAP.md roofline), so aggregate fps scales linearly over
    the mesh (SURVEY §2.3 — DP first-class, replacing dormant DDP).

    ``device_cache``: eval-split residency tier (data/pipeline.eval_batches)
    — None auto-pools the split (HBM under the shared DYK_DEVICE_CACHE_GB
    budget, else pinned host memory) so repeated/in-train evals skip the
    per-epoch upload; False streams."""
    if int8 and not (quantized and os.path.exists(str(quantized))):
        from ..models import quantize as Q

        # must happen BEFORE the program-cache key is built: the
        # downgraded run compiles/reuses the folded program, not the
        # quantized one (a frozen --int8-qvars artifact, when present,
        # is still evaluated literally — hence the exists() gate)
        if Q.warn_if_empty_plan(ir, int8_mode,
                                "evaluating the folded bf16 path"):
            int8 = False

    ir_key = (ir.cfg_path, ir.num_layers, ir.second_index)
    mesh_key = None
    if mesh is not None:
        mesh_key = (mesh.axis_names,
                    tuple(d.id for d in mesh.devices.flat))
    key = (ir_key, conf_thres, iou_thres, multi_label, max_det,
           str(compute_dtype), folded, int8, int8_mode, merge, mesh_key)

    def _nms(io):
        return NMS.non_max_suppression(
            io.astype(jnp.float32), conf_thres=conf_thres,
            iou_thres=iou_thres, multi_label=multi_label, max_det=max_det,
            merge=merge)

    def _prepare_hw():
        """Deployment size for prepare_folded/quantize kernel precompute.
        rect datasets run RECTANGULAR batches (e.g. 512x640) — preparing
        for (img_size, img_size) would mismatch the active s2d plan and
        silently fall back to per-call .at[].set weight edits inside the
        jitted program (the serialized cost the prepare pass removes)."""
        if getattr(dataset, "rect", False):
            return tuple(int(x) for x in dataset.batch_shapes[0])
        s = int(getattr(dataset, "img_size", 512))
        return (s, s)

    def _jit(fn):
        """jit the fused infer program; with a mesh, data-parallel over its
        first axis (batch sharded, params replicated, outputs sharded)."""
        if mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
        return jax.jit(fn, in_shardings=(rep, bsh, bsh), out_shardings=bsh)

    if int8 and quantized and os.path.exists(str(quantized)):
        # the strongest certification: evaluate the LITERAL quantized
        # variables a deployment serves (models/quantize.save_quantized),
        # bypassing fold/calibrate/quantize entirely. A prepare-size
        # mismatch (serving prepares square img_size; rect eval runs e.g.
        # 512x640) only costs speed — mismatched precomputed s2d kernels
        # fail their shape check and fall back to per-call transforms.
        from ..models import quantize as Q

        run_vars, qmode, qhw = Q.load_quantized(str(quantized))
        if qmode != int8_mode:
            raise ValueError(
                f"quantized artifact {quantized} was built for mode="
                f"{qmode!r}, eval requested {int8_mode!r}")
        if qhw is not None and tuple(qhw) != _prepare_hw():
            print(f"note: artifact prepared for hw={qhw}, eval runs "
                  f"{_prepare_hw()} — s2d kernels transform per call "
                  f"(slower, same numbers)", flush=True)
        run_vars = jax.tree.map(jnp.asarray, run_vars)

        def build():
            def infer(params, xv, xl):
                io, _ = Q.apply_quantized(ir, params, xv, xl,
                                          compute_dtype=compute_dtype,
                                          mode=int8_mode)
                return _pack(_nms(io))
            return _jit(infer)
    elif int8:
        from ..models import quantize as Q

        fold = _cached((ir_key, "fold"),
                       lambda: jax.jit(lambda v: graph.fold_batchnorm(ir, v)))
        fvars = fold(variables)
        if calibration and os.path.exists(str(calibration)):
            # frozen artifact (tools/calibrate.py / Predictor) — evaluate
            # the SAME quantization deployment serves, instead of
            # re-calibrating on this split's first batches
            stats, _ = Q.load_calibration(str(calibration))
        else:
            cal = []
            for v, l, idx, _ in eval_batches(dataset, batch_size,
                                             device_cache=device_cache):
                cal.append((v, l))
                if len(cal) >= calibration_batches:
                    break
            stats = Q.calibrate(ir, fvars, cal, compute_dtype=compute_dtype,
                                pct=calibration_pct)
            if calibration:
                Q.save_calibration(str(calibration), stats,
                                   pct=calibration_pct)
        hw = _prepare_hw()
        run_vars = jax.jit(lambda f: Q.quantize(ir, f, stats,
                                                mode=int8_mode,
                                                hw=hw))(fvars)

        def build():
            def infer(params, xv, xl):
                io, _ = Q.apply_quantized(ir, params, xv, xl,
                                          compute_dtype=compute_dtype,
                                          mode=int8_mode)
                return _pack(_nms(io))
            return _jit(infer)
    elif folded:
        hw = _prepare_hw()
        fold = _cached((ir_key, "fold", hw),
                       lambda: jax.jit(lambda v: graph.prepare_folded(
                           ir, graph.fold_batchnorm(ir, v), *hw)))
        run_vars = fold(variables)

        def build():
            def infer(params, xv, xl):
                io, _ = graph.apply_folded(ir, params, xv, xl,
                                           compute_dtype=compute_dtype)
                return _pack(_nms(io))
            return _jit(infer)
    else:
        run_vars = variables

        def build():
            def infer(params, xv, xl):
                (io, _), _ = graph.apply(ir, params, xv, xl, train=False,
                                         compute_dtype=compute_dtype)
                return _pack(_nms(io))
            return _jit(infer)

    def _pack(dv):
        # valid mask as a 7th channel: ONE host fetch per batch instead of
        # two (each fetch is a full round trip over high-latency links)
        det, valid = dv
        return jnp.concatenate([det, valid[..., None].astype(det.dtype)],
                               axis=-1)

    infer = _cached(key, build)

    ndev = 1
    if mesh is not None:
        ndev = int(mesh.shape[mesh.axis_names[0]])
        from jax.sharding import NamedSharding, PartitionSpec as P
        # replicate once — per-call host->mesh transfer would serialize
        run_vars = jax.device_put(run_vars, NamedSharding(mesh, P()))

    preds = []
    coco_preds = {}
    n_images = 0
    fwd_time = 0.0
    from ..data.pipeline import prefetch
    # decode overlaps device (streaming tier; pooled tiers do no host decode)
    it = prefetch(eval_batches(dataset, batch_size,
                               device_cache=device_cache))
    if progress:
        import tqdm
        it = tqdm.tqdm(it, desc="evaluating")

    for v, l, idx, (ratio, pad) in it:
        t0 = time.perf_counter()
        if ndev > 1 and v.shape[0] % ndev:
            padn = -v.shape[0] % ndev     # pad to a shardable multiple;
            z = jnp.zeros((padn,) + v.shape[1:], v.dtype)
            v, l = jnp.concatenate([v, z]), jnp.concatenate([l, z])
        # single-stream graphs simply ignore the second input
        packed = np.asarray(infer(run_vars, v, l))   # one fetch = sync
        packed = packed[:len(idx)]                   # drop padding rows
        det, valid = packed[..., :6], packed[..., 6] > 0.5
        fwd_time += time.perf_counter() - t0
        n_images += len(idx)

        for bi, img_id in enumerate(idx):
            orig_wh = dataset.shapes[img_id]
            orig_hw = (orig_wh[1], orig_wh[0])
            d = det[bi][valid[bi]]
            if len(d):
                boxes = _undo_letterbox(d[:, :4], ratio, pad, orig_hw)
            else:
                boxes = np.zeros((0, 4))
            coco_preds[int(img_id)] = (boxes, d[:, 4])
            for b, s in zip(boxes, d[:, 4]):
                preds.append({"img_id": int(img_id), "conf": float(s),
                              "bbox": b})

    preds.sort(key=lambda p: -p["conf"])
    ap_lamr = compute_ap_lamr(preds, dataset.labels, dataset.shapes)
    coco_stats = evaluate_coco(coco_preds, dataset.coco_ground_truth())
    # NB: this times forward + NMS + device->host fetch (one fused program;
    # splitting would add a tunnel round-trip per batch). The reference times
    # forward-only (evaluate.py:70-74), so this fps is the CONSERVATIVE side
    # of any comparison; bench.py measures forward-only throughput.
    fps = n_images / fwd_time if fwd_time > 0 else 0.0
    return {"coco_stats": coco_stats, "ap": ap_lamr["ap"],
            "lamr": ap_lamr["lamr"], "fps": fps, "fps_timed": "fwd+nms+fetch",
            "curves": {k: ap_lamr[k] for k in
                       ("recall", "precision", "fppi", "mr")},
            "predictions": coco_preds}
