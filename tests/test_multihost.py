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


def _run_cluster(num_processes: int, extra_args=(), devices_per_process=2,
                 timeout=540):
    port = _free_port()
    env = dict(os.environ)
    # children configure their own backend; scrub the test harness's
    # virtual-device forcing so each worker gets its own CPU devices
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER,
                "--process-id", str(pid),
                "--num-processes", str(num_processes),
                "--coordinator", f"localhost:{port}",
                "--devices-per-process", str(devices_per_process),
                *extra_args,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in range(num_processes)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
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
    return outs


def test_two_process_distributed_smoke():
    outs = _run_cluster(2)
    assert all("devices=4" in o for o in outs)


def test_four_process_streaming_monitor_persist_resume(tmp_path):
    """StreamingMonitor on a 4-process (time=4, band=1) cluster: process 0
    persists, the resume scan is broadcast so every process executes the
    same collective batches, and deleting one segment re-runs exactly it
    (VERDICT r3 item 7)."""
    outs = _run_cluster(
        4,
        extra_args=["--monitor-dir", str(tmp_path)],
        devices_per_process=1,
    )
    assert all("monitor segments=" in o for o in outs)


def test_eight_process_2x4_mesh():
    """8 processes x 1 device on the MULTICHIP dryrun mesh (time=2,
    band=4): halo ppermute + band-sharded slot-bucket consts across
    process boundaries at the full dryrun geometry."""
    outs = _run_cluster(
        8,
        extra_args=["--mesh-time", "2", "--mesh-band", "4"],
        devices_per_process=1,
    )
    assert all("mesh=(2x4)" in o for o in outs)


def test_four_process_2x2_mesh_lts():
    """Four jax.distributed processes on a (time=2, band=2) mesh running the
    robust LTS solver: the halo ppermute AND the band-sharded slot-bucket
    constants both cross process boundaries, and every output (including
    the flag tensor) must equal the unsharded sequential run
    (VERDICT r2 'Next round' #4)."""
    outs = _run_cluster(
        4,
        extra_args=["--mesh-time", "2", "--mesh-band", "2",
                    "--alpha", "0.75"],
        devices_per_process=1,
    )
    assert all("mesh=(2x2) alpha=0.75" in o for o in outs)
