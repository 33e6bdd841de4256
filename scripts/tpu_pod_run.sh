#!/usr/bin/env bash
# Multi-host TPU pod launch recipe — the cluster-script analog of the
# reference's scripts/quartz.llnl.gov/* (which sbatch/srun the MPI
# binaries; here the runtime is jax.distributed over a Cloud TPU pod).
#
# On a Cloud TPU pod slice every host must run the SAME command;
# jax.distributed auto-detects the coordinator, process count and process
# id from the TPU metadata, so no --coordinator flags are needed — the
# CLIs just need --distributed (utils/dist.init_distributed).
#
# Usage (from a machine with gcloud configured):
#   TPU_NAME=my-pod ZONE=us-central2-b ./scripts/tpu_pod_run.sh \
#       python -m fuzzypatternmatching_tpu.cli.run_pattern_matching \
#       -i /data/graph_db -p /data/patterns -o /data/out \
#       --lcc-engine sharded --mmap
#
# Notes:
# * The graph DB should be built once per host (or live on a shared
#   filesystem); --mmap opens only this host's shards.
# * build_mesh() orders devices host-major, so neighboring vertex blocks
#   stay on one host and boundary all_to_all traffic rides ICI; only
#   far-block traffic crosses DCN (utils/dist.py).
# * For a local multi-process rehearsal of the same code path (no pod
#   needed), use scripts/launch_multiprocess.py instead.

set -euo pipefail

: "${TPU_NAME:?set TPU_NAME to the pod slice name}"
: "${ZONE:?set ZONE to the pod's GCE zone}"

exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
  --zone "${ZONE}" \
  --worker=all \
  --command "cd $(pwd) && $* --distributed"
