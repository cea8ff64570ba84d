"""TWO-PROCESS multi-host smoke test: launches two coordinated CPU
processes via ``jax.distributed.initialize`` on localhost and exercises the
code paths that only exist at process_count > 1 — the real allgather branch
of ``allgather_predictions`` (multihost.py's non-identity path) and the
process-0 checkpoint write gating (reference save_on_master semantics,
distributed_utils.py:283-297).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); coord = sys.argv[2]; out = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[4])
import numpy as np
from double_yolo_kaist_tpu.parallel import multihost as MH

ok = MH.maybe_initialize_distributed(coordinator=coord, num_processes=2,
                                     process_id=pid)
assert ok, "initialize returned False"
assert jax.process_count() == 2, jax.process_count()
assert MH.process_index() == pid
assert MH.is_main_process() == (pid == 0)

# non-identity allgather: every leaf gains a leading process axis
tree = {"boxes": np.arange(4, dtype=np.float32) + 10 * pid,
        "n": np.asarray([pid + 1], np.int32)}
merged = MH.allgather_predictions(tree)
a = np.asarray(merged["boxes"])
assert a.shape == (2, 4), a.shape
assert np.allclose(a[0], np.arange(4)), a
assert np.allclose(a[1], np.arange(4) + 10), a
assert np.asarray(merged["n"]).tolist() == [[1], [2]]

# write gating: each process calls save_checkpoint into its OWN dir; only
# process 0's gate opens, so exactly ck0 must exist afterwards
import jax.numpy as jnp
from double_yolo_kaist_tpu.utils.checkpoint import save_checkpoint
save_checkpoint(os.path.join(out, f"ck{pid}"),
                params={"w": jnp.ones(2)}, bn_state={})
print(f"proc{pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_allgather_and_gating(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # worker sets its own (1 device)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), coord, str(tmp_path),
         os.path.abspath(REPO)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc{pid} rc={rc}\n{out}\n{err[-3000:]}"
        assert f"proc{pid} OK" in out
    # exactly one writer: process 0's checkpoint exists, process 1's doesn't
    assert (tmp_path / "ck0" / "manifest.json").exists()
    assert not (tmp_path / "ck1").exists()
