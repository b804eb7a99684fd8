"""Two-process jax.distributed validation of the multi-host path.

Launches 2 REAL processes through scripts/run_multihost.py (the pod
launcher), each with 2 virtual CPU devices, forming a 4-device global
mesh whose target axis spans the process (DCN) boundary.  The selftest
inside each process scores a deterministic workload through the
shard_map step and checks it against the single-device kernel; this
test asserts both processes agree and that the distributed topology was
real.  (The reference has no distributed tests at all — SURVEY §4; its
distribution is validated operationally.)
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_scoring(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "scripts" / "run_multihost.py"),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--platform", "cpu", "--selftest", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))

    results = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=420)
            results.append((p.returncode, stdout, stderr))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, stdout, stderr in results:
        assert rc == 0, stderr.decode()[-2000:]

    docs = [json.loads(o.read_text()) for o in outs]
    for i, d in enumerate(docs):
        assert d["ok"], d
        assert d["num_processes"] == 2
        assert d["n_global_devices"] == 4  # 2 procs x 2 local devices
        assert d["process"] == i
    # both processes assembled identical global scores and pmax results
    assert docs[0]["scores"] == docs[1]["scores"]
    assert docs[0]["global_max"] == docs[1]["global_max"]
    assert any(s > 0 for row in docs[0]["scores"] for s in row)
