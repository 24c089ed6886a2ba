#!/bin/bash
# Round-5 follow-up on-chip records (run after scripts/r5_records.sh):
#   1. cluster-reorder A/B on the SCRAMBLED cplaw — the new recursive-
#      bisection ordering (sparse/reorder.py) vs the landed gather
#      fallback (0.169 s) and flat-GGGP reorder (0.221 s,
#      bench_results/r4_tpu_reorder.jsonl)
#   2. dd_mxu on the sorted cplaw — the fp64-class accuracy point on the
#      social-graph class (the reference's fp64 MKL bar on its SC23
#      matrices, src/rowpara_spmm.c:398-407)
#   3. the GCN/GAT training examples on the real chip — framework-surface
#      proof (DifferentiableSpmm / ValueParameterizedSpmm on TPU)
# Serial: one TPU job at a time; deadline leaves the chip free for the
# driver's bench.py at round end.
cd /root/repo
DEADLINE=${CRP_QUEUE_DEADLINE_EPOCH:-1787120400}  # 2026-08-19 06:20 UTC
check_deadline() {
  if [ "$(( $(date +%s) + ${1:-1200} ))" -ge "$DEADLINE" ]; then
    echo "[records] deadline reached; leaving the chip free for the driver"
    exit 0
  fi
}
set -x

# -1. bigmat x3 retry: the r5 queue's run raced a mid-edit working tree
#     (error row in r3_tpu_bigmat.jsonl); re-run with the fixed kernel
check_deadline 2400
CRP_TPU_MXU_PREC=x3 timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:2600000:39:150 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_bigmat.jsonl

# 0. chunk-pipeline depth A/B on the sorted cplaw: the round-5 deep
#    prefetch (default NSLOT=8) vs the old 2-slot double buffer — decides
#    whether DMA-latency serialization was the ~0.081 s bound the
#    geometry/spill A/Bs could not move (spmm_ragged.ragged_slots)
check_deadline
CRP_TPU_MXU_PREC=x3 CRP_TPU_RAGGED_SLOTS=2 timeout 3000 \
  python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=10 \
  --out=bench_results/r5_tpu_slots.jsonl
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3000 \
  python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=10 \
  --out=bench_results/r5_tpu_slots.jsonl
# 0b. the pwtk-class headline regression with the new kernel path is
#     covered by the driver's bench.py (uniform kernel family untouched)

# 1. cluster reorder on the scrambled cplaw (ragged x3 after recovery)
check_deadline 2400
CRP_TPU_MXU_PREC=x3 timeout 3600 python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024:85:perm 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=10 --reorder=cluster \
  --out=bench_results/r4_tpu_reorder.jsonl

# 2. dd_mxu fp64-class point on the sorted cplaw
check_deadline 2400
timeout 3600 python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=dd_mxu \
  --dtype=float64 --ntest=3 --inner=3 \
  --out=bench_results/r5_tpu_cplaw_dd.jsonl

# 3. training examples on the real chip (p=1), logged as smoke records
check_deadline
( timeout 1500 python examples/gcn_train.py --nodes=20000 --steps=10 --p=1 \
    && echo "gcn_train ON-CHIP OK" ) 2>&1 | tail -8 \
  | tee bench_results/r5_tpu_train_examples.log
check_deadline
( timeout 1500 python examples/gat_train.py --nodes=20000 --steps=10 --p=1 \
    && echo "gat_train ON-CHIP OK" ) 2>&1 | tail -8 \
  | tee -a bench_results/r5_tpu_train_examples.log

echo "[records] r5b queue complete at $(date -u +%H:%M:%S)"
