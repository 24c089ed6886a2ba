#!/bin/bash
# Round-3 on-chip record queue (serial: one TPU job at a time).
cd /root/repo
set -x

# 1. cage15-class reach record: ~100M nnz packs + execs on one chip (bf16
#    point, then x3), with panel-vs-CSR byte accounting in kernel_detail.
CRP_TPU_MXU_PREC=default timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:2600000:39:150 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_bigmat.jsonl
CRP_TPU_MXU_PREC=x3 timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:2600000:39:150 256 1 --engine=rowpara --list=ragged \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_bigmat.jsonl

# 2. fp64-class on-chip: dd_mxu at a 217918x217918 bandwidth-256 banded
#    (the VPU dd ELL gather cannot fit this shape), plus a 50k-row shape
#    where BOTH run for a rate comparison.
timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:217918:53:256 256 1 --engine=rowpara --list=dd_mxu \
  --dtype=float64 --ntest=3 --inner=5 --out=bench_results/r3_tpu_dd.jsonl
timeout 1800 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:50000:53:256 256 1 --engine=rowpara --list=dd_mxu \
  --dtype=float64 --ntest=3 --inner=5 --out=bench_results/r3_tpu_dd.jsonl
CRP_TPU_DD_NO_MXU=1 timeout 1800 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:50000:53:256 256 1 --engine=rowpara --list=dd \
  --dtype=float64 --ntest=3 --inner=5 --out=bench_results/r3_tpu_dd.jsonl

# 3. consolidated matrix table rows: pwtk-class banded, all three fp32
#    operating points through the uniform/sg kernel + segsum baseline.
for PREC in highest x3 default; do
  CRP_TPU_MXU_PREC=$PREC timeout 3000 python -m crp_tpu.cli.suite_cli kernels \
    synth:banded:217918:53:2500 256 1 --engine=rowpara --list=pallas \
    --dtype=float32 --ntest=3 --inner=10 --project=1 \
    --out=bench_results/r3_tpu_matrix.jsonl
done
timeout 1800 python -m crp_tpu.cli.suite_cli kernels \
  synth:banded:217918:53:2500 256 1 --engine=rowpara --list=segsum \
  --dtype=float32 --ntest=3 --inner=5 --out=bench_results/r3_tpu_matrix.jsonl

# 4. headline bench (records init breakdown now)
python bench.py | tee /tmp/r3_bench_headline.json
