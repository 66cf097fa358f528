"""Device meshes for the narrow-band workload.

The workload's two natural scaling axes are contiguous **time segments** and
**frequency bands** (SURVEY §2.3): the reference's only intra-run parallelism
is a joblib process per band (reference ``narrow_band_least_squares.py:285``),
and its only long-duration mechanism is chunked re-runs (SURVEY §3.5).  Here
both become axes of a ``jax.sharding.Mesh``:

    mesh = Mesh(devices.reshape(nt, nb), ("time", "band"))

Time-segment shards exchange an IIR-warmup halo with their left neighbor
over ICI/DCN (`parallel.sharded`); bands need no communication at all.
Multi-host runs initialize ``jax.distributed`` and lay time along the
outer (DCN) axis so the only cross-host traffic is the thin halo.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

TIME_AXIS = "time"
BAND_AXIS = "band"


def auto_mesh_shape(
    n_devices: int, nbands: Optional[int] = None,
    min_bands_per_shard: int = 6,
) -> Tuple[int, int]:
    """Pick (time_shards, band_shards) for n devices.

    Band sharding is zero-communication but pays slot-template padding:
    an SPMD band shard runs one program whose per-slot shapes are the max
    over the ``nb`` bands dealt to that slot, so the padding tracks the
    window-length spread of ``nb`` consecutive sorted lengths.  With few
    bands per shard that spread is large (measured v5e, canonical 8
    bands: +6.8% at nb=2, +24% at nb=4 per chip —
    BENCH_SHARDED_PARITY.json), while time sharding costs only the halo
    ppermute (~50 KB/step) and the halo samples in the filter FFT.  So:
    prefer the largest band-shard count that keeps at least
    ``min_bands_per_shard`` bands per shard (dense sweeps), else shard
    time (the canonical 8-band workload on 8 devices -> (8, 1)).
    """
    nb = 1
    if nbands:
        for cand in range(min(n_devices, nbands), 0, -1):
            if (
                n_devices % cand == 0
                and nbands % cand == 0
                and (cand == 1 or nbands // cand >= min_bands_per_shard)
            ):
                nb = cand
                break
    nt = n_devices // nb
    return nt, nb


def make_mesh(
    time_shards: int,
    band_shards: int,
    devices: Optional[Sequence] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = time_shards * band_shards
    if len(devices) < n:
        raise ValueError(
            f"mesh {time_shards}x{band_shards} needs {n} devices, "
            f"have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(time_shards, band_shards)
    return Mesh(dev, (TIME_AXIS, BAND_AXIS))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``).

    No-op on a single host.  On a pod slice, call once per host before any
    device computation; afterwards ``jax.devices()`` spans the slice and
    `make_mesh` lays the time axis across hosts (outer dimension) so halo
    exchange rides DCN while band sharding stays on-host over ICI.

    ``auto=True`` lets JAX discover coordinator/process ids from the TPU
    pod metadata (the standard path on Cloud TPU slices; see
    scripts/launch_pod_slice.sh).  Explicit args are for CPU/GPU clusters
    and the 2-process CPU smoke test (benchmarks/multihost_smoke.py).

    Exercised end-to-end by tests/test_multihost.py: two local processes,
    4 CPU devices, halo ppermute crossing the process boundary.
    """
    if auto:
        jax.distributed.initialize()
        return
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
