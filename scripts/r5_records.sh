#!/bin/bash
# Round-5 on-chip record queue: the r4 A/Bs (geometry, reorder, gather,
# spill formulations) plus the r3 leftovers the 13:30 deadline cut off
# (bigmat x3, halo smoke regression, spill microbench, Fig.7 n-sweep).
# Serial: one TPU job at a time. Deadline leaves the chip free at round end.
cd /root/repo
DEADLINE=${CRP_QUEUE_DEADLINE_EPOCH:-1787099400}  # 2026-08-19 00:30 UTC (round-5 end window)
check_deadline() {
  if [ "$(( $(date +%s) + ${1:-1200} ))" -ge "$DEADLINE" ]; then
    echo "[records] deadline reached; leaving the chip free for the driver"
    exit 0
  fi
}
set -x

# ---- round-4 A/B queue (geometry, reorder, gather-vs-ragged, spill impls)
CRP_QUEUE_DEADLINE_EPOCH=$DEADLINE bash scripts/r4_records.sh

# ---- r3 leftovers
# bigmat x3 (default-prec row already recorded)
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:2600000:39:150 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_bigmat.jsonl

# halo-kernel on-chip regression
check_deadline
timeout 1800 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:50000:53:256 256 1 --engine=rowpara --list=pallas_halo \
  --dtype=float32 --ntest=3 --inner=5 \
  --out=bench_results/r3_tpu_halo_smoke.jsonl

# spill-rate microbenchmark (sets the projection model's SPILL_NS)
check_deadline
timeout 1800 python scripts/spill_microbench.py \
  | tee -a bench_results/r3_tpu_spill.jsonl

# Fig.7-analog n-sweep at the headline x3 point
check_deadline 2400
CRP_TPU_MXU_PREC=x3 timeout 3600 python -m crp_tpu.cli.suite_cli vary_n \
  synth:banded:217918:53:2500 1 --engine=rowpara --kernel=pallas \
  --ns=16,64,256,1024,2048 --ntest=3 --inner=10 --plan-procs=8 \
  --out=bench_results/r3_tpu_matrix.jsonl

echo "[records] r5 queue complete at $(date -u +%H:%M:%S)"
