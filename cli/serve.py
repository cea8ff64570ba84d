"""Minimal production inference server over the batching Predictor.

POST /detect with a JSON body:
  {"visible": <base64 jpg/png>, "lwir": <base64 jpg/png>}
-> {"boxes": [[x1,y1,x2,y2],...], "scores": [...], "classes": [...]}
GET /healthz -> {"status": "ok", "model": ...}

Stdlib-only (http.server); the heavy lifting is the compiled Predictor
(shape-bucketed XLA programs, see double_yolo_kaist_tpu/serving.py).
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import time
from http.server import BaseHTTPRequestHandler
from http.server import ThreadingHTTPServer as _ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from double_yolo_kaist_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

from cli.common import build_model  # noqa: E402


class ThreadingHTTPServer(_ThreadingHTTPServer):
    # stdlib default listen backlog is 5 — a burst of concurrent clients
    # (load tests, replica warm-up floods) overflows the accept queue and
    # the kernel resets connections before a handler ever runs
    request_queue_size = 128


def make_handler(predictor, model_name: str):
    """``predictor`` is anything mapping stacked frames -> per-frame results:
    a Predictor/ExportedPredictor (called as predictor(v[None], l[None])) or
    a MicroBatcher (requests coalesce across handler threads)."""
    import cv2

    from double_yolo_kaist_tpu.serving import MicroBatcher, QueueFull

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                payload = {"status": "ok", "model": model_name}
                if isinstance(predictor, MicroBatcher):
                    payload["microbatch"] = predictor.stats
                self._send(200, payload)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/detect":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                if req.get("encoding") == "raw":
                    # raw uint8 RGB HxWx3 frames ("shape": [H, W]) — for
                    # upstream services that already hold decoded frames;
                    # also isolates device throughput from the host's
                    # single-core JPEG decode in load tests
                    h, w = req["shape"]

                    def dec(b64):
                        a = np.frombuffer(base64.b64decode(b64), np.uint8)
                        return a.reshape(h, w, 3)
                else:
                    def dec(b64):
                        return cv2.imdecode(np.frombuffer(
                            base64.b64decode(b64), np.uint8),
                            cv2.IMREAD_COLOR)[:, :, ::-1]
                v = dec(req["visible"])
                l = dec(req["lwir"]) if "lwir" in req else v
                if isinstance(predictor, MicroBatcher):
                    boxes, scores, classes = predictor.submit(v, l)
                else:
                    (boxes, scores, classes), = predictor(v[None], l[None])
                self._send(200, {"boxes": boxes.tolist(),
                                 "scores": scores.tolist(),
                                 "classes": classes.tolist()})
            except QueueFull as e:  # shed load instead of queueing forever
                self._send(503, {"error": f"overloaded: {e}",
                                 "retry": True})
            except Exception as e:  # noqa: BLE001 — report to client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default="")
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--exported", type=str, default="",
                   help="serve a one-file AOT artifact (.dykx from "
                        "tools/export_model.py) — no cfg/weights/model "
                        "code; frames must match its compiled src_hw")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--conf-thres", type=float, default=0.1)
    p.add_argument("--int8", action="store_true",
                   help="serve the int8 PTQ path (calibrates on first request)")
    p.add_argument("--int8-mode", default="chain",
                   choices=("seed", "chain", "all", "edge", "spine", "spineall"))
    p.add_argument("--int8-calib", default="",
                   help="calibration artifact (.npz from tools/calibrate.py): "
                        "if it exists the server starts fully quantized; "
                        "otherwise the first requests' stats are saved there")
    p.add_argument("--int8-qvars", default="",
                   help="quantized-variables artifact (.npz, "
                        "tools/calibrate.py --quantized-out): loads the "
                        "finished int8 model, skipping the startup "
                        "quantize compile; saved there after first "
                        "quantization if missing")
    p.add_argument("--calibration-batches", type=int, default=2,
                   help="requests to gather activation stats from before "
                        "quantizing (--int8 without --int8-calib artifact)")
    p.add_argument("--calibration-pct", type=float, default=100.0,
                   help="max-abs calibration percentile (100.0 = exact "
                        "max-abs, the measured-best default with few "
                        "batches; 99.x clips outlier-prone traffic)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel serving over N devices (-1 = all): "
                        "requests shard over the batch, params replicate — "
                        "aggregate fps scales with the mesh (per-chip fps is "
                        "roofline-bound, docs/ROADMAP.md)")
    p.add_argument("--microbatch", type=int, default=16,
                   help="coalesce concurrent /detect requests into one "
                        "batched device call (continuous batching: an idle "
                        "server runs a lone request immediately; under load "
                        "the batch self-sizes up to this cap, pushing "
                        "aggregate fps toward the chip's batched roofline). "
                        "0 disables (bs-1 program per request)")
    p.add_argument("--microbatch-wait-ms", type=float, default=0.0,
                   help="optionally hold the first request of a batch this "
                        "long so more arrivals join (trades tail latency "
                        "for bigger buckets at moderate load)")
    p.add_argument("--max-queue", type=int, default=256,
                   help="shed load (HTTP 503) once this many requests are "
                        "queued behind the device instead of growing tail "
                        "latency without bound; 0 = unbounded")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the startup warmup inference (first /detect "
                        "then pays the XLA compile, seconds to ~1 min)")
    p.add_argument("--warmup-hw", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="native frame size to precompile for "
                        "(default: KAIST 512 640 scaled to --img-size)")
    opt = p.parse_args(argv)

    if opt.exported:
        from double_yolo_kaist_tpu.export import ExportedPredictor

        # everything about an exported artifact is baked in at export time;
        # flags that would silently change behavior are errors, cosmetic
        # ones get a visible ignore warning (values compared to defaults)
        if opt.int8 or opt.dp:
            raise SystemExit(
                "--exported bakes precision and replica layout into the "
                "artifact: re-export with tools/export_model.py --int8 "
                "for int8, and scale out by running one server per chip "
                "instead of --dp")
        ignored = [name for name, val, dflt in (
            ("--cfg", opt.cfg, ""), ("--weights", opt.weights, ""),
            ("--conf-thres", opt.conf_thres, 0.1),
            ("--img-size", opt.img_size, 512),
            ("--int8-calib", opt.int8_calib, ""),
            ("--int8-qvars", opt.int8_qvars, ""),
            ("--calibration-batches", opt.calibration_batches, 2),
            ("--calibration-pct", opt.calibration_pct, 100.0),
            ("--warmup-hw", opt.warmup_hw, None)) if val != dflt]
        if ignored:
            print(f"# --exported: ignoring {', '.join(ignored)} (baked "
                  f"into the artifact at export time)", flush=True)
        predictor = ExportedPredictor(opt.exported)
        if predictor.batch > 1:
            print(f"# note: artifact compiled for batch {predictor.batch}; "
                  f"this server issues single-frame requests, each padded "
                  f"to {predictor.batch} — export with --batch 1 for "
                  f"lowest per-request latency", flush=True)
        if not opt.no_warmup:
            t0 = time.perf_counter()
            predictor.warmup()
            print(f"# warmup {predictor.src_hw} compiled in "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
        if opt.microbatch:
            from double_yolo_kaist_tpu.serving import MicroBatcher

            # coalesced groups fill the artifact's compiled batch instead of
            # each request padding it alone
            predictor = MicroBatcher(predictor, max_batch=opt.microbatch,
                                     max_wait_ms=opt.microbatch_wait_ms,
                                     max_queue=opt.max_queue or None)
        server = ThreadingHTTPServer(
            (opt.host, opt.port),
            make_handler(predictor, os.path.basename(opt.exported)))
        print(f"serving exported artifact on http://{opt.host}:{opt.port}",
              flush=True)
        server.serve_forever()
        return

    if not opt.cfg:
        raise SystemExit("--cfg is required (or pass --exported)")

    from double_yolo_kaist_tpu.serving import Predictor

    ir, variables = build_model(opt.cfg, opt.weights)
    mesh = None
    if opt.dp:
        import jax

        from double_yolo_kaist_tpu.parallel import mesh as M
        devs = jax.devices()
        n = len(devs) if opt.dp < 0 else opt.dp
        if n > len(devs):
            raise SystemExit(f"--dp {n}: only {len(devs)} device(s) visible")
        mesh = M.make_mesh(devices=devs[:n])
        print(f"# data-parallel serving over {n} device(s)", flush=True)
    # with micro-batching on, coalesced groups need padded batch programs
    # beyond bs1; each bucket compiles lazily on the first group that
    # reaches it (one-time cost per size)
    buckets = ((1,) if not opt.microbatch
               else tuple(sorted({1, 4, opt.microbatch})))
    predictor = Predictor(ir, variables, img_size=opt.img_size,
                          conf_thres=opt.conf_thres, batch_buckets=buckets,
                          int8=opt.int8, int8_mode=opt.int8_mode,
                          calibration_batches=opt.calibration_batches,
                          calibration_pct=opt.calibration_pct,
                          calibration=opt.int8_calib or None,
                          quantized=opt.int8_qvars or None, mesh=mesh)
    if not opt.no_warmup:
        h, w = opt.warmup_hw or (max(64, opt.img_size),
                                 max(64, int(opt.img_size * 1.25)))
        t0 = time.perf_counter()
        # Predictor.warmup, not predictor(dummy): a dummy request under
        # --int8 would consume a calibration-batch slot with zeros
        predictor.warmup((h, w))
        print(f"# warmup ({h}x{w}) compiled in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    if opt.microbatch:
        from double_yolo_kaist_tpu.serving import MicroBatcher

        predictor = MicroBatcher(predictor, max_batch=opt.microbatch,
                                 max_wait_ms=opt.microbatch_wait_ms,
                                 max_queue=opt.max_queue or None)
    server = ThreadingHTTPServer(
        (opt.host, opt.port),
        make_handler(predictor, os.path.basename(str(opt.cfg))))
    print(f"serving on http://{opt.host}:{opt.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
