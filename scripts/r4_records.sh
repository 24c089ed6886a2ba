#!/bin/bash
# Round-4 on-chip record queue (serial: one TPU job at a time).
# A/Bs the round-4 ragged improvements on the cplaw social-graph matrix:
#   1. adaptive model-chosen geometry (default) vs the r3 fixed (128, 512)
#   2. spill formulations (CRP_TPU_SPILL_IMPL) through the engine
# The spill microbench (scripts/spill_microbench.py, run by r3_records2.sh
# step 5) prices the formulations in isolation, including the new segblock
# one-hot-MXU variant.
cd /root/repo
# Stop launching new steps near round end so the chip is FREE when the
# driver runs its own bench.py. Override with CRP_QUEUE_DEADLINE_EPOCH.
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

# 1. geometry A/B at the x3 operating point
check_deadline
CRP_TPU_MXU_PREC=x3 CRP_TPU_RAGGED_AUTO=0 timeout 3000 \
  python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=10 \
  --out=bench_results/r4_tpu_geometry.jsonl
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3000 \
  python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=10 \
  --out=bench_results/r4_tpu_geometry.jsonl

# 1b. reorder A/B on the SCRAMBLED-id cplaw (the raw-graph view): without
#     reorder the ragged cover refuses and the engine falls back to
#     segsum; --reorder=metis (GGGP here) restores community locality
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3000 \
  python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024:85:perm 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=5 \
  --out=bench_results/r4_tpu_reorder.jsonl
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3600 \
  python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024:85:perm 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=10 --reorder=metis \
  --out=bench_results/r4_tpu_reorder.jsonl

# 1c. gather-kernel A/B on the scrambled cplaw: same matrix as 1b without
#     reorder — segsum's scatter vs the one-hot-MXU gather-reduce
check_deadline
for K in segsum gather; do
  check_deadline
  CRP_TPU_MXU_PREC=x3 timeout 3000 \
    python -m crp_tpu.cli.suite_cli kernels \
    synth:cplaw:786432:16:1024:85:perm 256 1 --engine=rowpara --list=$K \
    --dtype=float32 --ntest=3 --inner=5 \
    --out=bench_results/r4_tpu_reorder.jsonl
done

# 2. spill formulation A/B through the engine (adaptive geometry);
#    "pallas" is the fused one-hot-MXU segmented reduce (no scatter)
check_deadline
for IMPL in clip twopass pallas; do
  check_deadline
  CRP_TPU_MXU_PREC=x3 CRP_TPU_SPILL_IMPL=$IMPL timeout 3000 \
    python -m crp_tpu.cli.suite_cli kernels \
    synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
    --dtype=float32 --ntest=3 --inner=10 \
    --out=bench_results/r4_tpu_spill_impl.jsonl
done

# 3. (round 5) gather on the SORTED cplaw — the same matrix as the ragged
#    headline rows — so the inflation-vs-exec tradeoff (VERDICT r4 next-6)
#    is decided on one matrix: ragged is 35x CSR bytes at x3, gather is
#    1.46x; if gather's exec matches, inflation is moot.
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3000 \
  python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=gather \
  --dtype=float32 --ntest=3 --inner=10 \
  --out=bench_results/r4_tpu_spill_impl.jsonl

# 4. (round 5) segsum on the sorted cplaw — completes the 3-way
#    (ragged/gather/segsum) exec comparison on the headline power-law
#    matrix that sets the auto-dispatch default.
check_deadline
CRP_TPU_MXU_PREC=x3 timeout 3000 \
  python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=segsum \
  --dtype=float32 --ntest=3 --inner=5 \
  --out=bench_results/r4_tpu_spill_impl.jsonl
