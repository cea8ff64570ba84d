"""Load-test cli/serve.py: N concurrent clients against /detect.

Measures aggregate requests/sec at increasing concurrency, demonstrating
the MicroBatcher coalescing concurrent traffic into batched device calls
(serving.py): without it a ThreadingHTTPServer serializes the device at
bs-1 latency; with it aggregate throughput climbs toward the chip's
batched rate (bench.py / tools/serving_bench.py numbers).

Usage:
  # against a live server
  python tools/serve_loadtest.py --port 8321 [--concurrency 1 4 16]
  # spawn + test a flagship server on the chip
  python tools/serve_loadtest.py --spawn --cfg configs/<model>.cfg \
      --weights <ckpt> [--int8]
"""

from __future__ import annotations

import argparse
import base64
import concurrent.futures
import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _detect(port: int, payload: bytes, timeout: float = 600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/detect", data=payload,
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        json.loads(r.read())
    return time.perf_counter() - t0


def run_level(port: int, payloads: list, conc: int, n_req: int):
    lat = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=conc) as ex:
        t0 = time.perf_counter()
        futs = [ex.submit(_detect, port, payloads[i % len(payloads)])
                for i in range(n_req)]
        for f in futs:
            lat.append(f.result())
        wall = time.perf_counter() - t0
    lat = np.asarray(sorted(lat))
    return {"concurrency": conc, "requests": n_req,
            "rps": n_req / wall,
            "p50_ms": float(lat[len(lat) // 2] * 1e3),
            "p95_ms": float(lat[min(int(len(lat) * 0.95), len(lat) - 1)] * 1e3),
            "p99_ms": float(lat[min(int(len(lat) * 0.99), len(lat) - 1)] * 1e3)}


def run_inproc(args):
    """Drive MicroBatcher.submit directly from N threads (no HTTP).

    Separates the two halves of the serving story on this 1-core host:
    the HTTP wire path (JSON + base64 + sockets, shared core with the
    client) caps rps far below the chip, while this path shows what the
    batcher + predictor + chip deliver when the wire isn't the limiter.
    """
    sys.path.insert(0, REPO)
    import jax
    from double_yolo_kaist_tpu.config.ir import compile_cfg
    from double_yolo_kaist_tpu.models import graph
    from double_yolo_kaist_tpu.models.zoo import FLAGSHIP, cfg_path
    from double_yolo_kaist_tpu.serving import MicroBatcher, Predictor
    from double_yolo_kaist_tpu.utils.general import enable_compile_cache

    enable_compile_cache()
    model = args.cfg or FLAGSHIP
    ir = compile_cfg(cfg_path(model) if not os.path.exists(model) else model)
    variables = jax.jit(lambda k: graph.init(ir, k))(jax.random.PRNGKey(0))
    kw = {}
    if args.int8 and os.environ.get("DYK_INT8_QVARS"):
        kw["quantized"] = os.environ["DYK_INT8_QVARS"]
    pred = Predictor(ir, variables, img_size=args.img_size,
                     batch_buckets=(1, 2, 4, 8, 16), int8=args.int8,
                     calibration_batches=1, **kw)
    mb = MicroBatcher(pred, max_batch=args.microbatch)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (*args.hw, 3), dtype=np.uint8)
              for _ in range(8)]

    def one(i):
        t0 = time.perf_counter()
        mb.submit(frames[i % len(frames)], frames[(i + 1) % len(frames)])
        return time.perf_counter() - t0

    # warm every bucket deterministically (compiles are one-time; int8 also
    # calibrates) — a free-form concurrent warmup mostly lands on buckets 1
    # and max, and the first c=4 level then eats a ~30 s mid-bucket compile
    for b in (1, 2, 4, 8, 16):
        big = np.stack([frames[i % len(frames)] for i in range(b)])
        pred(big, big)
        pred(big, big)
    prev = mb.stats
    for conc in args.concurrency:
        lat = []
        with concurrent.futures.ThreadPoolExecutor(conc) as ex:
            t0 = time.perf_counter()
            for dt in ex.map(one, range(args.requests)):
                lat.append(dt)
            wall = time.perf_counter() - t0
        lat = np.asarray(sorted(lat))
        cur = mb.stats
        db = cur["batches"] - prev["batches"]
        df = cur["frames"] - prev["frames"]
        prev = cur
        print(json.dumps(
            {"concurrency": conc, "requests": args.requests,
             "fps": args.requests / wall,
             "p50_ms": float(lat[len(lat) // 2] * 1e3),
             "p95_ms": float(lat[min(int(len(lat) * .95), len(lat) - 1)] * 1e3),
             "p99_ms": float(lat[min(int(len(lat) * .99), len(lat) - 1)] * 1e3),
             "mean_batch": round(df / max(db, 1), 2)}), flush=True)
    mb.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 640),
                    metavar=("H", "W"))
    ap.add_argument("--concurrency", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16])
    ap.add_argument("--requests", type=int, default=64,
                    help="requests per concurrency level")
    ap.add_argument("--spawn", action="store_true",
                    help="spawn cli/serve.py first (pass --cfg/--weights/"
                         "--int8/--microbatch through)")
    ap.add_argument("--cfg", default="")
    ap.add_argument("--weights", default="")
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--microbatch", type=int, default=16)
    ap.add_argument("--payload", choices=("jpeg", "raw"), default="jpeg",
                    help="request encoding: 'jpeg' exercises the full "
                         "production path incl. the server's image decode "
                         "(single-core hosts bottleneck there); 'raw' "
                         "sends decoded uint8 frames, isolating the "
                         "device-side serving throughput")
    ap.add_argument("--inproc", action="store_true",
                    help="skip HTTP entirely: build Predictor+MicroBatcher "
                         "in-process and fire N threads submitting ndarray "
                         "frames — measures the serving stack + chip with "
                         "the wire (JSON/base64/socket, all single-core "
                         "here) removed")
    args = ap.parse_args()

    if args.inproc:
        return run_inproc(args)

    import cv2
    rng = np.random.default_rng(0)
    payloads = []
    for _ in range(8):
        v = rng.integers(0, 256, (*args.hw, 3), dtype=np.uint8)
        if args.payload == "raw":
            b64 = base64.b64encode(v.tobytes()).decode()
            payloads.append(json.dumps(
                {"visible": b64, "lwir": b64, "encoding": "raw",
                 "shape": list(args.hw)}).encode())
            continue
        ok, buf = cv2.imencode(".jpg", v)
        assert ok
        b64 = base64.b64encode(buf.tobytes()).decode()
        payloads.append(json.dumps({"visible": b64, "lwir": b64}).encode())

    proc = None
    if args.spawn:
        cmd = [sys.executable, os.path.join(REPO, "cli", "serve.py"),
               "--cfg", args.cfg, "--weights", args.weights,
               "--img-size", str(args.img_size),
               "--microbatch", str(args.microbatch),
               "--port", str(args.port)]
        if args.int8:
            cmd.append("--int8")
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        deadline = time.time() + 1200
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{args.port}/healthz",
                        timeout=2) as r:
                    if json.loads(r.read()).get("status") == "ok":
                        break
            except OSError:
                if proc.poll() is not None:
                    raise RuntimeError(proc.stdout.read())
            time.sleep(2)
        else:
            raise TimeoutError("server did not come up")

    try:
        # warm every bucket the batcher can hit (compiles are one-time)
        run_level(args.port, payloads, max(args.concurrency),
                  2 * max(args.concurrency))
        def mb_stats():
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{args.port}/healthz",
                    timeout=10) as rr:
                return json.loads(rr.read()).get("microbatch") or {}

        prev = mb_stats()
        for conc in args.concurrency:
            r = run_level(args.port, payloads, conc, args.requests)
            cur = mb_stats()
            if cur:
                db = cur["batches"] - prev.get("batches", 0)
                df = cur["frames"] - prev.get("frames", 0)
                r["mean_batch"] = round(df / max(db, 1), 2)
                prev = cur
            print(json.dumps(r), flush=True)
    finally:
        if proc is not None:
            proc.kill()


if __name__ == "__main__":
    main()
