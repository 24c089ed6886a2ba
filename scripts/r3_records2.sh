#!/bin/bash
# Round-3 on-chip record queue, take 2 (serial: one TPU job at a time).
# Re-records everything with the single-pass pack paths (init is now
# pack ~3-45 s instead of 85-400 s) and the fixed dd_mxu block specs.
# Ordered by record value in case the chip window is short: matrix table
# points, dd on-chip, cplaw points, geometry A/B, reach, regressions,
# sweeps, headline.
cd /root/repo

# Stop launching new steps near round end so the chip is FREE when the
# driver runs its own bench.py (two TPU jobs OOM/contend; a held claim at
# round end loses the headline). Override with CRP_QUEUE_DEADLINE_EPOCH.
DEADLINE=${CRP_QUEUE_DEADLINE_EPOCH:-1787059800}  # 2026-08-18 13:30 UTC (round-4 end window)
check_deadline() {
  # only start a step that can plausibly FINISH before the deadline
  # (typical step ~5-20 min; $1 overrides the 1200 s budget)
  if [ "$(( $(date +%s) + ${1:-1200} ))" -ge "$DEADLINE" ]; then
    echo "[records] deadline reached; leaving the chip free for the driver"
    exit 0
  fi
}
set -x

# 1. consolidated matrix table rows: pwtk-class banded through the
#    uniform/sg kernel at all three fp32 operating points + segsum.
check_deadline
for PREC in x3 default highest; do
  check_deadline
  CRP_TPU_MXU_PREC=$PREC timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
    synth:banded:217918:53:2500 256 1 --engine=rowpara --list=pallas \
    --dtype=float32 --ntest=3 --inner=10 --project=1 \
    --out=bench_results/r3_tpu_matrix.jsonl
done
check_deadline
timeout 1800 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:217918:53:2500 256 1 --engine=rowpara --list=segsum \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_matrix.jsonl

# 2. fp64-class on-chip: dd_mxu at a bandwidth-256 pwtk-class shape (the
#    VPU dd ELL gather cannot fit it), plus a 50k-row shape where BOTH
#    run for a rate comparison.
check_deadline
timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:217918:53:256 256 1 --engine=rowpara --list=dd_mxu \
  --dtype=float64 --ntest=3 --inner=5 --out=bench_results/r3_tpu_dd.jsonl
check_deadline
timeout 1800 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:50000:53:256 256 1 --engine=rowpara --list=dd_mxu \
  --dtype=float64 --ntest=3 --inner=5 --out=bench_results/r3_tpu_dd.jsonl
check_deadline
CRP_TPU_DD_NO_MXU=1 timeout 1800 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:50000:53:256 256 1 --engine=rowpara --list=dd \
  --dtype=float64 --ntest=3 --inner=5 --out=bench_results/r3_tpu_dd.jsonl

# 3. cplaw (post-reorder social-graph analog) rows: ragged at all three
#    operating points (segsum row already recorded in r3_tpu_plaw.jsonl).
check_deadline
for PREC in x3 default highest; do
  check_deadline
  CRP_TPU_MXU_PREC=$PREC timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
    synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
    --dtype=float32 --ntest=3 --inner=10 --project=1 \
    --out=bench_results/r3_tpu_matrix.jsonl
done

# 3b. ragged geometry A/B on cplaw: taller row groups amortize the
#     TM-independent B-chunk traffic (host cost model: chunk time halves
#     at TM=512; spill is geometry-invariant at 2.04M nnz)
check_deadline
for TMWC in "512 256" "256 512"; do
  check_deadline
  set -- $TMWC
  CRP_TPU_MXU_PREC=x3 CRP_TPU_RAGGED_TM=$1 CRP_TPU_RAGGED_WC=$2 \
    timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
    synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
    --dtype=float32 --ntest=3 --inner=10 \
    --out=bench_results/r3_tpu_plaw_tm.jsonl
done

# 4. cage15-class reach: ~95M nnz packs + execs on one chip, bf16 then x3
#    (panel-vs-CSR byte accounting in kernel_detail).
check_deadline
CRP_TPU_MXU_PREC=default timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:2600000:39:150 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_bigmat.jsonl
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:2600000:39:150 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_bigmat.jsonl

# 4b. per-round halo-kernel on-chip regression (p=1 is the only shape one
#     chip can run; semaphore threading through repeated execs is the
#     thing being guarded — VERDICT r2 Weak #3)
check_deadline
timeout 1800 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:50000:53:256 256 1 --engine=rowpara --list=pallas_halo \
  --dtype=float32 --ntest=3 --inner=5 \
  --out=bench_results/r3_tpu_halo_smoke.jsonl

# 5. spill-rate microbenchmark (sets the projection model's SPILL_NS)
check_deadline
timeout 1800 python scripts/spill_microbench.py \
  | tee -a bench_results/r3_tpu_spill.jsonl

# 6. Fig.7-analog n-sweep at the headline x3 point (r2 ran it at
#    `highest` only — VERDICT r2 Weak #5); pack is memoized across n.
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3600 python -m crp_tpu.cli.suite_cli vary_n \
  synth:banded:217918:53:2500 1 --engine=rowpara --kernel=pallas \
  --ns=16,64,256,1024,2048 --ntest=3 --inner=10 --plan-procs=8 \
  --out=bench_results/r3_tpu_matrix.jsonl

# 7. headline bench (records the init breakdown)
check_deadline
CRP_BENCH_TOTAL_TIMEOUT_S=2600 CRP_BENCH_RETRIES=2 timeout 3000 python bench.py | tee /tmp/r3_bench_headline.json

# round-4 queue (adaptive geometry + spill formulation A/Bs)
bash scripts/r4_records.sh
