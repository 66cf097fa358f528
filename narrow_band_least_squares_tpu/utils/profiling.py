"""Tracing / profiling / structured run summaries.

The reference's only observability is debug prints (SURVEY §5: import-path
echoes at example.py:29-31, BT warnings, per-band row counts).  Here:

- `phase_timer`: wall-clock per-phase timers with a structured report,
- `trace`: context manager around ``jax.profiler`` for TensorBoard traces,
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
