"""Multi-PROCESS distributed BA (jax.distributed over a coordinator).

SURVEY §4(e): the multi-host story is validated by multiple processes on
one host, one CPU device each, joined through jax.distributed.initialize —
the same program/mesh layout that runs over DCN on real multi-host pods.
The worker asserts the SPMD result matches a single-process solve of the
identical problem; this test just orchestrates the processes.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_ba_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    nprocs = 2
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "result")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # children must manage their own XLA flags (1 device per process)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, str(nprocs), str(pid), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nprocs)]
    outputs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for pid, p in enumerate(procs):
        assert p.returncode == 0, (pid, outputs[pid][-2000:])
    for pid in range(nprocs):
        with open(f"{out}.{pid}") as f:
            line = f.read().strip()
        assert "ok=1" in line, (pid, line)
        assert f"nglobal={nprocs}" in line, (pid, line)
