#!/usr/bin/env bash
# Chain-axis scaling on a real TPU pod slice (the BASELINE.md:25 north star:
# >= 80% linear traj/s scaling 1 -> N hosts at 64x64).
#
# Run THIS SAME SCRIPT on every host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command=...`).
# On Cloud TPU, jax.distributed auto-discovers the coordinator and process
# ids from the TPU metadata, so no --coordinator flags are needed: the tool
# detects the multi-process launch through multihost.maybe_initialize().
#
# Mesh layout (parallel/multihost.py): lattice axes on each host's
# ICI-connected local chips, the chain axis across hosts -- so the only
# DCN traffic is the once-per-block stats reduction; with unsharded
# per-chip lattices the CG loop runs with ZERO cross-host collectives
# (ops/geometry.py sync_any elides the chain-lockstep psum when both
# lattice axes are trivial).
#
# Single-host baseline first (for the efficiency denominator):
#   run with JAX_NUM_PROCESSES=1 on one host, then the full slice.
set -euo pipefail

NX="${NX:-64}"
NT="${NT:-64}"
CHAINS_PER_SLOT="${CHAINS_PER_SLOT:-4}"
N_TIMED="${N_TIMED:-200}"

cd "$(dirname "$0")/.."

python -m schwingermodel_tpu.tools.bench_scaling \
  --nx "$NX" --nt "$NT" \
  --beta 4.0 --m0 0.2 --md-steps 10 --tau 0.1 \
  --dtype float32 --tol 1e-6 \
  --n-therm 50 --n-timed "$N_TIMED" \
  --chains-per-slot "$CHAINS_PER_SLOT" \
  --chain-worker \
  ${JAX_COORDINATOR_ADDRESS:+--coordinator "$JAX_COORDINATOR_ADDRESS"} \
  ${JAX_NUM_PROCESSES:+--num-processes "$JAX_NUM_PROCESSES"} \
  ${JAX_PROCESS_ID:+--process-id "$JAX_PROCESS_ID"}
