#!/usr/bin/env bash
# Launch a narrow-band monitoring run on a Cloud TPU pod slice.
#
# A pod slice is a multi-host machine: each host sees 4 (v5e) or 8 local
# chips, and `jax.distributed.initialize()` (auto mode) discovers the
# coordinator and process ids from the TPU metadata server.  The same
# script runs on every host (SPMD single-program launch); gcloud fans it
# out with `--worker=all`.
#
# Usage (from a machine with gcloud configured):
#
#   TPU_NAME=nbls-v5e-16 ZONE=us-west4-a ./scripts/launch_pod_slice.sh \
#       examples/example_parallel.py
#
# What happens on each host:
#   1. initialize_distributed(auto=True)  -> jax.devices() spans the slice
#   2. make_mesh(time_shards, band_shards) lays the *time* axis across
#      hosts (outer mesh dim = DCN) and *bands* within a host (ICI), so the
#      only cross-host traffic is the thin IIR-warmup halo ppermute.
#   3. Every host feeds the same global (S, C, Tseg) segment array;
#      jax.device_put extracts each host's addressable shards; results are
#      re-assembled with process_allgather (parallel/sharded.py::_to_host).
#
# The 2-process CPU equivalent of this launch (runs anywhere, tested in CI)
# is benchmarks/multihost_smoke.py + tests/test_multihost.py.

set -euo pipefail

TPU_NAME="${TPU_NAME:?set TPU_NAME to the TPU VM/slice name}"
ZONE="${ZONE:?set ZONE, e.g. us-west4-a}"
SCRIPT="${1:-examples/example_parallel.py}"
REPO_DIR="${REPO_DIR:-\$HOME/narrow_band_least_squares_tpu}"

# 1) sync the repo to every worker
gcloud compute tpus tpu-vm scp --recurse \
    --zone="${ZONE}" --worker=all \
    . "${TPU_NAME}:${REPO_DIR}"

# 2) run the driver on every worker simultaneously; JAX auto-discovers the
#    cluster (equivalent to initialize_distributed(auto=True))
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
    --zone="${ZONE}" --worker=all \
    --command="cd ${REPO_DIR} && \
        PYTHONPATH=${REPO_DIR} NBLS_DISTRIBUTED=auto \
        python ${SCRIPT}"
