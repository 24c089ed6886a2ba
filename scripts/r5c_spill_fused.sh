#!/bin/bash
# Round-5c: fused spill-kernel A/B on the sorted cplaw point.
# Baseline rows (segsum 0.0795 s, pre-fusion pallas 0.0887 s) are in
# bench_results/r5_tpu_groupout.jsonl / r4_tpu_spill_impl.jsonl.
cd /root/repo
set -x
for GEO in "128 128" "512 256" "512 512"; do
  set -- $GEO
  CRP_TPU_MXU_PREC=x3 CRP_TPU_SPILL_IMPL=pallas \
  CRP_TPU_SPILL_TMO=$1 CRP_TPU_SPILL_Q=$2 timeout 1500 \
    python -m crp_tpu.cli.suite_cli kernels \
    synth:cplaw:786432:16:1024 256 1 --engine=rowpara --list=ragged \
    --dtype=float32 --ntest=3 --inner=10 \
    --out=bench_results/r5_tpu_spill_fused.jsonl
done
echo "[records] r5c fused-spill queue complete"
