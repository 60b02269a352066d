#!/usr/bin/env bash
# TPU-pod experiment launcher (replaces the reference's SGE/qsub wrappers,
# scripts/run_taco_wrnn.sh there).  Runs the same experiment menu against a
# TPU VM / pod slice; multi-host runs launch one process per host with
# jax.distributed coordination.
#
# Usage:
#   ./scripts/run_taco_wrnn.sh <experiment> [hp_file]
# Experiments: preprocess | taco_tf | taco_gta | taco_attn | taco_af_online |
#              taco_af_offline | wrnn | wrnn_gta | gen | quick_start
set -euo pipefail

EXP=${1:?usage: run_taco_wrnn.sh <experiment> [hp_file]}
HP=${2:-}
HP_ARG=()
[[ -n "$HP" ]] && HP_ARG=(--hp_file "$HP")

# Multi-host settings (export before launching on each worker):
#   JAX_COORDINATOR=<host0-ip:port> JAX_NUM_PROCESSES=<n> JAX_PROCESS_ID=<i>
PYTHON=${PYTHON:-python}

case "$EXP" in
  preprocess)      $PYTHON -m wavernn_tpu.cli.preprocess "${HP_ARG[@]}" ;;
  taco_tf)         $PYTHON -m wavernn_tpu.cli.train_tacotron "${HP_ARG[@]}" ;;
  taco_gta)        $PYTHON -m wavernn_tpu.cli.train_tacotron --force_gta "${HP_ARG[@]}" ;;
  taco_attn)       $PYTHON -m wavernn_tpu.cli.train_tacotron --force_attn "${HP_ARG[@]}" ;;
  taco_af_online)  $PYTHON -m wavernn_tpu.cli.train_tacotron "${HP_ARG[@]}" ;;  # mode from hp file
  taco_af_offline) $PYTHON -m wavernn_tpu.cli.train_tacotron "${HP_ARG[@]}" ;;
  wrnn)            $PYTHON -m wavernn_tpu.cli.train_wavernn "${HP_ARG[@]}" ;;
  wrnn_gta)        $PYTHON -m wavernn_tpu.cli.train_wavernn --gta "${HP_ARG[@]}" ;;
  gen)             $PYTHON -m wavernn_tpu.cli.gen_tacotron "${HP_ARG[@]}" wavernn ;;
  quick_start)     $PYTHON -m wavernn_tpu.cli.quick_start "${HP_ARG[@]}" ;;
  *) echo "unknown experiment: $EXP" >&2; exit 1 ;;
esac
