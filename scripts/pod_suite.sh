#!/usr/bin/env bash
# Multi-host pod-slice launcher — the TPU analog of the reference's SLURM
# sweep scripts (/root/reference/deprecated/SC23_AD/scripts/*.pbs, e.g.
# fig7.pbs: srun ./crpspmm-cpu $MAT $N $NTEST $CHKRES on 32 nodes).
#
# On a TPU pod slice every host runs the SAME program; jax.distributed
# derives the process index from the TPU runtime env, after which
# jax.devices() spans all hosts and the engines run unchanged (the mesh
# builder keeps the per-exec exchange axis pm on ICI and the init-only A
# replication axis pn across slices — shard/layout.make_mesh_auto).
#
# Usage (from a machine with gcloud access to the pod):
#   TPU_NAME=my-v5e-pod ZONE=us-west4-a ./scripts/pod_suite.sh \
#       scaling synth:banded:217918:53:2500 256 --procs=8,16,32 --distributed
#
# Any crp-suite sweep (scaling / vary_n / modes / kernels) or crp-bench
# argument list works; results append to bench_results/ on worker 0.

set -euo pipefail

: "${TPU_NAME:?set TPU_NAME to the TPU pod/slice name}"
: "${ZONE:?set ZONE to the TPU zone}"
REPO="${REPO:-$(cd "$(dirname "$0")/.." && pwd)}"

exec gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
    --command "cd $REPO && python -m crp_tpu.cli.suite_cli $*"
