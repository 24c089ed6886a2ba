"""Calibrate the projection model against measured p=1 cplaw execs.

VERDICT r4 next-5: round 4's power-law projections carried
``calibration: 1.0`` placeholders (the model had no measured adaptive-
geometry point).  This script closes the loop: it reads the measured
p=1 on-chip rows (the r4 geometry A/B queue writes adaptive and fixed
(128,512) rows for the same matrix), recomputes the uncalibrated
projection for each geometry mode, derives ``calibration = measured /
projected``, and re-emits strong-scaling projection rows with the real
factor plus a per-term breakdown of where the uncalibrated gap lives
(A-panel/B-chunk/C HBM terms, MXU term, spill term).

Host-only (the projection is numpy): re-execs onto the CPU platform
before importing jax-adjacent modules (see scripts/pack_microbench.py
for why env-in-body is too late).

Usage:  python scripts/r5_calibrate.py
Inputs: bench_results/r5_tpu_slots.jsonl (newest: deep-pipeline default),
        bench_results/r4_tpu_geometry.jsonl (both geometry modes),
        bench_results/r3_tpu_matrix.jsonl (fallback: adaptive rows)
Output: bench_results/r5_project_cplaw.jsonl (fixed geometry),
        bench_results/r5_project_cplaw_adaptive.jsonl (adaptive)
"""

import json
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS", None) != "" or (
    os.environ.get("JAX_PLATFORMS") != "cpu"
):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BR = os.path.join(REPO, "bench_results")

SPEC = os.environ.get("CRP_CAL_SPEC", "synth:cplaw:786432:16:1024")
N = int(os.environ.get("CRP_CAL_N", 256))
PREC = os.environ.get("CRP_CAL_PREC", "x3")
PROCS = [1, 2, 4, 8, 16]


def _rows(path):
    if not os.path.exists(path):
        return
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                yield json.loads(line)


def _is_fixed(knobs):
    return (
        knobs.get("CRP_TPU_RAGGED_AUTO") == "0"
        or "CRP_TPU_RAGGED_TM" in knobs
        or "CRP_TPU_RAGGED_WC" in knobs
    )


def find_measured():
    """Newest measured p=1 ragged cplaw row per geometry mode."""
    out = {}
    for fname in ("r3_tpu_matrix.jsonl", "r4_tpu_geometry.jsonl",
                  "r5_tpu_slots.jsonl", "r5_tpu_spill_fused.jsonl"):
        for r in _rows(os.path.join(BR, fname)):
            if (
                r.get("spec") != SPEC
                or r.get("p") != 1
                or r.get("backend") != "tpu"
                or r.get("kernel_resolved") not in ("ragged",)
                or "exec_s" not in r
            ):
                continue
            knobs = r.get("knobs", {})
            if knobs.get("CRP_TPU_MXU_PREC", "highest") != PREC:
                continue
            mode = "fixed" if _is_fixed(knobs) else "adaptive"
            out[mode] = r  # later files/rows win (newest record)
    return out


def per_term_breakdown(a, prec):
    """p=1 kernel-term split at the geometry the pack would use."""
    from crp_tpu.kernels.spmm_ragged import (
        estimate_ragged, resolve_ragged_geometry,
    )
    from crp_tpu.plan.project import _rates

    rates = _rates()
    loc, _, _ = a.localize()
    TM, Wc = resolve_ragged_geometry(loc.rowptr, loc.colidx, prec)
    S, spill, G = estimate_ragged(loc.rowptr, loc.colidx, TM, Wc)
    passes = {"x3": 3, "highest": 6, "default": 1}.get(prec, 1)
    a_item = 4 if prec == "x3" else (2 if prec == "default" else 4)
    b_item = 2 if prec == "default" else 4
    n_pad = -(-N // 256) * 256
    a_b = S * TM * Wc * a_item
    b_b = S * Wc * n_pad * b_item
    c_b = G * TM * n_pad * 4
    return dict(
        TM=TM, Wc=Wc, S=int(S), spill_nnz=int(spill),
        a_panel_s=round(a_b / rates["hbm"], 6),
        b_chunk_s=round(b_b / rates["hbm"], 6),
        c_write_s=round(c_b / rates["hbm"], 6),
        mxu_s=round(passes * 2.0 * S * TM * Wc * n_pad / rates["mxu"], 6),
        spill_s=round(spill * rates["spill_ns"] * 1e-9, 6),
    )


def main():
    from crp_tpu.cli.plan_cli import load_matrix
    from crp_tpu.plan.project import RATE_PROVENANCE, project_exec_1d

    measured = find_measured()
    if not measured:
        print("no measured p=1 cplaw ragged rows yet; run the queue first",
              file=sys.stderr)
        return 1
    a = load_matrix(SPEC, need_symm=False)
    for mode, mrow in sorted(measured.items()):
        env_keys = ("CRP_TPU_RAGGED_AUTO", "CRP_TPU_RAGGED_TM",
                    "CRP_TPU_RAGGED_WC")
        saved = {k: os.environ.pop(k, None) for k in env_keys}
        try:
            if mode == "fixed":
                os.environ["CRP_TPU_RAGGED_AUTO"] = "0"
                for k in ("CRP_TPU_RAGGED_TM", "CRP_TPU_RAGGED_WC"):
                    if mrow.get("knobs", {}).get(k):
                        os.environ[k] = mrow["knobs"][k]
            meas = float(mrow["exec_s"]["min"])
            base = project_exec_1d(a, N, 1, mxu_prec=PREC)
            cal = meas / base["projected_s"] if base["projected_s"] else 1.0
            detail = per_term_breakdown(a, PREC)
            out_name = ("r5_project_cplaw.jsonl" if mode == "fixed"
                        else "r5_project_cplaw_adaptive.jsonl")
            with open(os.path.join(BR, out_name), "w") as out:
                for i, p in enumerate(PROCS):
                    rec = project_exec_1d(
                        a, N, p, mxu_prec=PREC, calibration=cal,
                        include_provenance=(i == 0),
                    )
                    rec.update(matrix=SPEC, n=N, prec=PREC,
                               geometry_mode=mode)
                    if i == 0:
                        rec["calib_detail"] = dict(
                            measured_p1_s=meas,
                            projected_uncal_p1_s=base["projected_s"],
                            gap_pct=round(
                                100 * (base["projected_s"] / meas - 1), 1
                            ),
                            measured_row=dict(
                                file=mrow.get("sweep"),
                                kernel_detail=mrow.get("kernel_detail"),
                            ),
                            terms=detail,
                        )
                    line = json.dumps(rec)
                    print(line, flush=True)
                    out.write(line + "\n")
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
