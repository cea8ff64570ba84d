"""HTTP inference server: spawn cli/serve.py, hit /healthz and /detect."""

import base64
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(REPO, "tests", "fixtures", "tiny_dyolov3.cfg")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_server(extra_argv, timeout=180):
    """Launch cli/serve.py on a free port; poll /healthz until live.
    Returns (proc, port); caller kills proc."""
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "cli", "serve.py"),
         *extra_argv, "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                if json.loads(r.read()).get("status") == "ok":
                    return proc, port
        except (OSError, ValueError, KeyError):
            if proc.poll() is not None:
                raise RuntimeError(proc.stdout.read())
        time.sleep(1)
    proc.kill()
    raise TimeoutError("server did not come up")


@pytest.fixture(scope="module")
def server():
    proc, port = _spawn_server(["--cfg", TINY, "--img-size", "64",
                                "--conf-thres", "0.005"], timeout=120)
    yield port
    proc.kill()


@pytest.fixture(scope="module")
def exported_server(tmp_path_factory):
    """Export a tiny .dykx artifact, then serve it via --exported."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from double_yolo_kaist_tpu.config.ir import compile_cfg
    from double_yolo_kaist_tpu.export import export_serving_artifact
    from double_yolo_kaist_tpu.models import graph
    from double_yolo_kaist_tpu.serving import Predictor

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    pred = Predictor(ir, variables, img_size=64, conf_thres=0.005,
                     batch_buckets=(1,), compute_dtype=jnp.float32)
    path = str(tmp_path_factory.mktemp("dykx") / "tiny.dykx")
    export_serving_artifact(pred, (96, 128), 1, path)

    proc, port = _spawn_server(["--exported", path])
    yield port
    proc.kill()


def _b64_jpg(img):
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def _detect(port, v, timeout=120):
    body = json.dumps({"visible": _b64_jpg(v), "lwir": _b64_jpg(v)}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/detect", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_detect_endpoint(server):
    rng = np.random.default_rng(0)
    v = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    out = _detect(server, v)
    assert set(out) == {"boxes", "scores", "classes"}
    assert len(out["boxes"]) == len(out["scores"]) == len(out["classes"])
    for b in out["boxes"]:
        assert 0 <= b[0] <= 128 and 0 <= b[1] <= 96


def test_detect_raw_encoding(server):
    """encoding='raw' (decoded uint8 frames) must match the JPEG path's
    schema; raw frames skip the server-side cv2.imdecode entirely."""
    rng = np.random.default_rng(3)
    v = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    body = json.dumps({
        "visible": base64.b64encode(v.tobytes()).decode(),
        "lwir": base64.b64encode(v.tobytes()).decode(),
        "encoding": "raw", "shape": [96, 128]}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/detect", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    assert set(out) == {"boxes", "scores", "classes"}


def test_bad_request(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/detect", data=b"not json",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_exported_detect_endpoint(exported_server):
    """cli/serve.py --exported: the artifact answers /detect with the same
    contract as the live-model server (frames at the exported src_hw)."""
    rng = np.random.default_rng(1)
    v = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    out = _detect(exported_server, v)
    assert set(out) == {"boxes", "scores", "classes"}
    assert len(out["boxes"]) == len(out["scores"]) == len(out["classes"])
    for b in out["boxes"]:
        assert 0 <= b[0] <= 128 and 0 <= b[1] <= 96


def test_exported_rejects_conflicting_flags():
    """--exported with --dp/--int8 must exit with the baked-in error."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "serve.py"),
         "--exported", "whatever.dykx", "--dp", "-1"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode != 0
    assert "bakes precision and replica layout" in proc.stderr


def test_concurrent_requests_microbatch(server):
    """The server default (--microbatch 16) coalesces concurrent /detect
    requests through serving.MicroBatcher; every client must get ITS OWN
    frame's detections back, and results must match the same frame served
    alone (coalescing is semantically invisible)."""
    import concurrent.futures

    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
              for _ in range(8)]
    solo = [_detect(server, v) for v in frames[:2]]   # also warms bucket 1
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        outs = list(ex.map(lambda v: _detect(server, v, timeout=300),
                           frames))
    for out in outs:
        assert set(out) == {"boxes", "scores", "classes"}
    # response routing: concurrent result for frame i == its solo result
    for i in range(2):
        assert np.allclose(outs[i]["boxes"], solo[i]["boxes"], atol=1e-3)
        assert np.allclose(outs[i]["scores"], solo[i]["scores"], atol=1e-4)
