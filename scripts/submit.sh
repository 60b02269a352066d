#!/usr/bin/env bash
# Multi-host TPU job launcher (replaces the reference's SGE qsub wrapper,
# scripts/submit.sh there).  Starts the same command on every worker of a
# pod slice with jax.distributed coordination env vars set.
#
#   ./scripts/submit.sh <num_hosts> <coordinator_ip:port> <experiment> [hp_file]
#
# Run once per host with HOST_ID=<i> (or use your scheduler, e.g.
# `gcloud compute tpus tpu-vm ssh --worker=all`, to fan out).
set -euo pipefail

NUM_HOSTS=${1:?num_hosts}
COORD=${2:?coordinator ip:port}
shift 2

export JAX_NUM_PROCESSES=$NUM_HOSTS
export JAX_COORDINATOR=$COORD
export JAX_PROCESS_ID=${HOST_ID:-0}

exec "$(dirname "$0")/run_taco_wrnn.sh" "$@"
