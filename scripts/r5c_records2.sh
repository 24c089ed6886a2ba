#!/bin/bash
# Round-5c follow-ups (run after scripts/r5c_spill_fused.sh):
#   1. cplaw with DEFAULT knobs — confirms CRP_TPU_SPILL_IMPL=auto
#      resolves to the fused pallas kernel (kernel_detail.spill_impl)
#      and that the default path carries the measured 77 ms win
#   2. bigmat x3 at n=128 — the cage15-class reach point at the 1e-5
#      operating point (n=256 x3 OOMed: 7.4 GB hi/lo panels + 5.3 GB
#      B/C left no headroom, r3_tpu_bigmat.jsonl error row)
#   3. dd_mxu cplaw retry — the committed tree refuses cleanly
#      (UnsupportedSparsity chain: total cover infeasible -> VPU dd
#      segsum past CRP_TPU_DD_SEGSUM_MAX_NNZ) instead of the r5b
#      mid-edit AssertionError
# Serial; deadline leaves the chip free for the driver's bench.py.
cd /root/repo
DEADLINE=${CRP_QUEUE_DEADLINE_EPOCH:-1787119200}  # 2026-08-19 06:00 UTC
check_deadline() {
  if [ "$(( $(date +%s) + ${1:-900} ))" -ge "$DEADLINE" ]; then
    echo "[records] deadline reached; leaving the chip free for the driver"
    exit 0
  fi
}
set -x

# geometry probes past the (512,512)=62.6 ms point — the step count
# dominates, so push Q/TMo another octave
for GEO in "512 1024" "1024 512"; do
  set -- $GEO
  check_deadline
  CRP_TPU_MXU_PREC=x3 CRP_TPU_SPILL_IMPL=pallas \
  CRP_TPU_SPILL_TMO=$1 CRP_TPU_SPILL_Q=$2 timeout 1500 \
    python -m crp_tpu.cli.suite_cli kernels \
    synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
    --dtype=float32 --ntest=3 --inner=10 \
    --out=bench_results/r5_tpu_spill_fused.jsonl
done

check_deadline
CRP_TPU_MXU_PREC=x3 timeout 1500 python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=10 \
  --out=bench_results/r5_tpu_spill_fused.jsonl

check_deadline
CRP_TPU_MXU_PREC=x3 timeout 2400 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:2600000:39:150 128 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_bigmat.jsonl

check_deadline
timeout 1200 python -m crp_tpu.cli.suite_cli kernels \
  synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=dd_mxu \
  --dtype=float64 --ntest=1 --inner=1 \
  --out=bench_results/r5_tpu_cplaw_dd.jsonl

echo "[records] r5c-2 queue complete at $(date -u +%H:%M:%S)"
