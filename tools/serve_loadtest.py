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
            "p95_ms": float(lat[int(len(lat) * 0.95)] * 1e3)}


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
    args = ap.parse_args()

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
