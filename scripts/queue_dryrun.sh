#!/bin/bash
# Dry-run every distinct command/env form used by the on-chip record queues
# (scripts/r3_records2.sh, scripts/r4_records.sh) at tiny scale on the
# 8-device virtual CPU mesh.  Purpose: a wedged chip gives us at most one
# short window — an argv typo or env-knob regression discovered on chip
# burns it.  Run this after any suite_cli / dispatch / synth change.
#
# Mirrors the reference's "check the driver works before the cluster run"
# habit (deprecated/SC23_AD/readme.md:62-70 runs tiny sanity shapes first).
set -e
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS=--xla_force_host_platform_device_count=8
export JAX_ENABLE_X64=1
OUT=${QUEUE_DRYRUN_OUT:-/tmp/queue_dryrun.jsonl}
rm -f "$OUT"
run() { echo "+ $*" >&2; timeout 900 "$@" >>/dev/null; }

# r3 step 1: banded matrix-table rows, pallas kernel at 3 operating points
for PREC in x3 default highest; do
  CRP_TPU_MXU_PREC=$PREC run python -m crp_tpu.cli.suite_cli kernels \
    synth:banded:4096:13:128 64 1 --engine=rowpara --list=pallas \
    --dtype=float32 --ntest=1 --inner=2 --project=1 --out="$OUT"
done
run python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:4096:13:128 64 1 --engine=rowpara --list=segsum \
  --dtype=float32 --ntest=1 --inner=2 --out="$OUT"

# r3 step 2: dd_mxu / dd fp64 rows
run python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:4096:13:96 64 1 --engine=rowpara --list=dd_mxu \
  --dtype=float64 --ntest=1 --inner=2 --out="$OUT"
CRP_TPU_DD_NO_MXU=1 run python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:4096:13:96 64 1 --engine=rowpara --list=dd \
  --dtype=float64 --ntest=1 --inner=2 --out="$OUT"

# r3 step 3/3b: cplaw ragged rows + forced-geometry A/B
CRP_TPU_MXU_PREC=x3 run python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:8192:8:64 64 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=1 --inner=2 --project=1 --out="$OUT"
CRP_TPU_MXU_PREC=x3 CRP_TPU_RAGGED_TM=256 CRP_TPU_RAGGED_WC=128 \
  run python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:8192:8:64 64 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=1 --inner=2 --out="$OUT"

# r3 step 4/4b: bigmat-form ragged + halo regression shape
run python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:16384:9:48 64 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=1 --inner=2 --out="$OUT"
run python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:4096:13:96 64 1 --engine=rowpara --list=pallas_halo \
  --dtype=float32 --ntest=1 --inner=2 --out="$OUT"

# r3 step 5: spill microbench (tiny spec via its env knobs)
SPILL_SPEC=synth:cplaw:8192:8:64 SPILL_N=64 \
  run python scripts/spill_microbench.py

# r3 step 6: vary_n sweep with planner attach
CRP_TPU_MXU_PREC=x3 run python -m crp_tpu.cli.suite_cli vary_n \
  synth:banded:4096:13:128 1 --engine=rowpara --kernel=pallas \
  --ns=16,32 --ntest=1 --inner=2 --plan-procs=8 --out="$OUT"

# r4 step 1: adaptive vs forced geometry
CRP_TPU_MXU_PREC=x3 CRP_TPU_RAGGED_AUTO=0 run python -m crp_tpu.cli.suite_cli \
  kernels synth:cplaw:8192:8:64 64 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=1 --inner=2 --out="$OUT"

# r4 step 1b: scrambled cplaw with and without --reorder=metis
CRP_TPU_MXU_PREC=x3 run python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:8192:8:64:85:perm 64 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=1 --inner=2 --out="$OUT"
CRP_TPU_MXU_PREC=x3 run python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:8192:8:64:85:perm 64 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=1 --inner=2 --reorder=metis --out="$OUT"

# r4 step 1c: segsum vs gather on the scrambled cplaw
for K in segsum gather; do
  CRP_TPU_MXU_PREC=x3 run python -m crp_tpu.cli.suite_cli kernels \
    synth:cplaw:8192:8:64:85:perm 64 1 --engine=rowpara --list=$K \
    --dtype=float32 --ntest=1 --inner=2 --out="$OUT"
done

# r4 step 2: spill formulations through the engine
for IMPL in clip twopass pallas; do
  CRP_TPU_MXU_PREC=x3 CRP_TPU_SPILL_IMPL=$IMPL run python -m \
    crp_tpu.cli.suite_cli kernels synth:cplaw:8192:8:64 64 1 \
    --engine=rowpara --list=ragged --dtype=float32 --ntest=1 --inner=2 \
    --out="$OUT"
done

N=$(wc -l <"$OUT")
echo "queue_dryrun: OK — $N records in $OUT"
