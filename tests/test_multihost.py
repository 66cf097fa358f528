"""Real multi-process ``jax.distributed`` smoke (SURVEY §2.3/§5 closure).

Spawns TWO separate Python processes (2 CPU devices each) that bring up a
jax.distributed cluster over a local coordinator and run the sharded
pipeline on a (time=4, band=1) mesh — the halo ppermute crosses the
process boundary.  This is the piece virtual-device tests cannot cover:
actual cross-process collectives and global-array assembly.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "benchmarks", "multihost_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    port = _free_port()
    env = dict(os.environ)
    # children configure their own backend; scrub the test harness's
    # virtual-device forcing so each worker gets exactly 2 CPU devices
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER,
                "--process-id", str(pid),
                "--num-processes", "2",
                "--coordinator", f"localhost:{port}",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {pid} failed (rc={p.returncode}):\n{out}"
        )
        assert "MULTIHOST_SMOKE_OK" in out, f"process {pid} output:\n{out}"
        assert "devices=4" in out
