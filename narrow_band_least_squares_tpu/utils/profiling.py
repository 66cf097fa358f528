"""Tracing / profiling / structured run summaries.

The reference's only observability is debug prints (SURVEY §5: import-path
echoes at example.py:29-31, BT warnings, per-band row counts).  Here:

- `phase_timer`: wall-clock per-phase timers with a structured report,
- `trace`: context manager around ``jax.profiler`` for TensorBoard traces,
- `op_profile_summary`: hardware-counter roofline numbers (measured HBM
  bytes/bandwidth utilization, FLOP utilization, device busy time) parsed
  from a captured trace's xplane — the measurement bench.py's
  ``profile_measured`` uses; XLA's static cost model over-reports HBM
  traffic (a buffer is counted once per consuming fusion), so bandwidth
  claims should come from here,
- `RunSummary`: the per-run record (windows per band = the
  ``num_compute_list`` analog, solves/sec, device info) serializable to
  JSON for fleet monitoring.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List

logger = logging.getLogger("nbls_tpu")


class PhaseTimers:
    """Accumulating named wall-clock timers.

    >>> timers = PhaseTimers()
    >>> with timers.phase("filter"):
    ...     run_filter()
    >>> timers.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "calls": self.counts[name],
                "mean_s": self.totals[name] / self.counts[name],
            }
            for name in self.totals
        }

    def log(self) -> None:
        for name, r in self.report().items():
            logger.info(
                "phase %-16s total=%.3fs calls=%d mean=%.4fs",
                name, r["total_s"], r["calls"], r["mean_s"],
            )


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# standalone so it can run via `python -c` in a subprocess: the xplane
# parser lives in TensorFlow's profiler plugin, which must not load into
# a process that owns TPU devices
_XPLANE_PARSER = r"""
import glob, json, sys
from tensorflow.python.profiler.internal import _pywrap_profiler_plugin as pp
xs = sorted(glob.glob(sys.argv[1] + "/plugins/profile/*/*.xplane.pb"))
data, _ = pp.xspace_to_tools_data([xs[-1]], "op_profile", {})
d = json.loads(data if isinstance(data, str) else bytes(data).decode())
m = d["byCategoryExcludeIdle"]["metrics"]
print(json.dumps({
    "flops_frac": m.get("flops", 0.0),
    "bw_utils": m.get("bandwidthUtils", []),
    "raw_time_ps": m.get("rawTime", 0),
    "raw_flops": m.get("rawFlops", 0),
    "raw_bytes": m.get("rawBytesAccessedArray", []),
}))
"""


def op_profile_summary(trace_dir: str, timeout: float = 300.0) -> Dict:
    """Hardware-counter op-profile metrics of a captured device trace.

    ``trace_dir`` is the directory passed to `trace` /
    ``jax.profiler.trace``.  Returns measured (not cost-model) numbers:
    ``hw_flop_util`` (time-weighted fraction of the device's FLOP issue
    rate — counts every hardware pass, so ``matmul_precision='high'``'s
    3 bf16 passes show up 3x), ``hbm_util`` (fraction of HBM bandwidth),
    ``hbm_bytes`` (actual bytes moved), ``device_busy_s``, and
    ``tflops`` (logical).  The xplane conversion runs in a subprocess so
    TensorFlow never loads into the calling process.  Raises RuntimeError
    when no xplane exists or the parser is unavailable.
    """
    import glob
    import subprocess
    import sys

    if not glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"):
        raise RuntimeError(f"no xplane under {trace_dir}")
    proc = subprocess.run(
        [sys.executable, "-c", _XPLANE_PARSER, trace_dir],
        capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"xplane parse failed: {proc.stderr[-400:]}")
    m = json.loads(proc.stdout.strip().splitlines()[-1])
    busy_s = m["raw_time_ps"] * 1e-12
    hbm_bytes = m["raw_bytes"][0] if m["raw_bytes"] else 0
    out = {
        "hw_flop_util": m["flops_frac"],
        "hbm_util": m["bw_utils"][0] if m["bw_utils"] else None,
        "hbm_bytes": hbm_bytes,
        "device_busy_s": busy_s,
    }
    if busy_s > 0:
        out["hbm_gbps"] = hbm_bytes / busy_s / 1e9
        out["tflops"] = m["raw_flops"] / busy_s / 1e12
    return out


@dataclass
class RunSummary:
    """Structured per-run record for logging/monitoring."""

    workload: str
    nbands: int
    num_compute_list: List[int]
    nchans: int
    alpha: float
    device: str
    wall_s: float
    phases: Dict[str, Dict[str, float]] = field(default_factory=dict)

    @property
    def total_solves(self) -> int:
        return int(sum(self.num_compute_list))

    @property
    def solves_per_s(self) -> float:
        return self.total_solves / self.wall_s if self.wall_s > 0 else 0.0

    def to_json(self) -> str:
        d = dict(self.__dict__)
        d["total_solves"] = self.total_solves
        d["solves_per_s"] = self.solves_per_s
        return json.dumps(d)

    def log(self) -> None:
        logger.info("run summary: %s", self.to_json())
