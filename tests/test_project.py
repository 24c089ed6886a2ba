"""Projected multi-chip exec model (plan/project.py)."""

import numpy as np

from crp_tpu.plan.project import project_exec_1d, project_scaling
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_community_csr


def test_projection_terms_scale_down():
    a = banded_random_csr(20000, nnz_per_row=9, bandwidth=300, seed=3)
    rows = project_scaling(a, 64, [1, 2, 4], mxu_prec="x3")
    # kernel term strictly shrinks with p; p=1 has no comm term
    assert rows[0]["comm_s"] == 0.0
    assert rows[0]["kernel_s"] > rows[1]["kernel_s"] > rows[2]["kernel_s"]
    for r in rows:
        assert r["projected_s"] >= r["projected_overlap_s"] > 0


def test_projection_comm_matches_exchange_plan():
    from crp_tpu.comm.exchange import build_b_exchange
    from crp_tpu.plan.partition1d import csr_row_partition

    a = banded_random_csr(8000, nnz_per_row=7, bandwidth=200, seed=5)
    p, n = 4, 64
    rec = project_exec_1d(a, n, p, mxu_prec="x3")
    displs = csr_row_partition(a.rowptr, p)
    shards = [a.row_slice(int(displs[i]), int(displs[i + 1]))
              for i in range(p)]
    xp = build_b_exchange([s.colidx for s in shards], displs, reidx=True)
    assert rec["comm_rows_logical_max"] == int(xp.rB_recv_rows.max())
    assert rec["comm_bytes_per_chip"] == (p - 1) * xp.S * n * 4


def test_projection_calibration_scales_kernel():
    a = powerlaw_community_csr(8192, avg_degree=10, comm_size=512, seed=7)
    base = project_exec_1d(a, 64, 1, mxu_prec="default")
    cal = project_exec_1d(a, 64, 1, mxu_prec="default", calibration=2.0)
    # kernel_s is rounded to 6 decimals in the record
    assert abs(cal["kernel_s"] - 2 * base["kernel_s"]) < 2e-6
