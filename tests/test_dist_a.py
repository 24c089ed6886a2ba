"""Distributed-A ingestion tests (v1 rd_Ai/rd_Av + Allgatherv-A parity).

The reference's v1 engine accepts A already distributed in per-rank row
ranges and reshards/replicates it with collectives
(``deprecated/src/crpspmm.c:240-265,559-584``); v2 replicates plan-layout A
blocks (``src/para2d_spmm.c:47-100``).  These tests hand A over as 8
per-device blocks and check result + audit parity with the host-global
path.
"""

import jax
import numpy as np
import pytest

from crp_tpu.config import SpmmConfig
from crp_tpu.engine.crp import CrpSpmm
from crp_tpu.engine.para2d import Para2dSpmm
from crp_tpu.plan.bandwidth import calc_bandwidth_part2d
from crp_tpu.plan.planner2d import plan_from_csr
from crp_tpu.shard.dist_a import DistCSR, ingest_dist_a, replicate_a0
from crp_tpu.shard.layout import make_mesh_2d
from crp_tpu.shard.redist import BlockDist
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_random_csr, fill_b
from crp_tpu.utils.blocks import uniform_displs
from crp_tpu.utils.norms import rel_fro_err


def test_dist_csr_metadata_matches_global():
    a = banded_random_csr(500, nnz_per_row=20, bandwidth=30, seed=50)
    d = DistCSR.from_global(a, uniform_displs(a.nrow, 8))
    assert np.array_equal(d.global_rowptr(), a.rowptr)
    assert np.array_equal(d.row_col_ranges(), a.row_col_ranges())
    assert d.nnz == a.nnz


def test_dist_csr_device_resident_blocks():
    """colidx/val handed over as device arrays: metadata still O(m)."""
    import jax.numpy as jnp

    a = banded_random_csr(300, nnz_per_row=10, bandwidth=20, seed=51)
    d = DistCSR.from_global(a, uniform_displs(a.nrow, 4))
    d.colidxs = [jnp.asarray(c) for c in d.colidxs]
    d.vals = [jnp.asarray(v) for v in d.vals]
    assert np.array_equal(d.row_col_ranges(), a.row_col_ranges())


def test_ingest_dist_a_assembles_panels(devices8):
    """rd_Ai/rd_Av + all_gather reproduce the exact row-panel CSRs."""
    a = banded_random_csr(400, nnz_per_row=25, bandwidth=30, seed=52)
    p = 8
    bp = calc_bandwidth_part2d(
        p, a.nrow, 16, a.ncol, a.rowptr, a.row_col_ranges_v1()
    )
    mesh = make_mesh_2d(bp.np_row, bp.np_col, devices=devices8)
    d = DistCSR.from_global(a, uniform_displs(a.nrow, p))
    panels, rd, agv = ingest_dist_a(
        d, bp.m_split_idx, bp.np_row, bp.np_col, mesh
    )
    assert rd == a.nnz
    assert agv == (0 if bp.np_col == 1 else a.nnz * bp.np_col)
    for i in range(bp.np_row):
        ref = a.row_slice(int(bp.m_split_idx[i]), int(bp.m_split_idx[i + 1]))
        assert np.array_equal(panels[i].rowptr, ref.rowptr)
        assert np.array_equal(panels[i].colidx, ref.colidx)
        assert np.array_equal(panels[i].val, ref.val)


@pytest.mark.parametrize("maker,seed", [
    (lambda: banded_random_csr(400, nnz_per_row=40, bandwidth=30, seed=53), 0),
    (lambda: powerlaw_random_csr(500, avg_degree=4, seed=54), 1),
])
def test_crp_dist_a_end_to_end(maker, seed, devices8):
    """CrpSpmm with A as 8 per-device blocks: <=1e-12 and audit equality
    with the host-global-A engine on the same plan."""
    a = maker()
    n = 16
    p = 8
    bp = calc_bandwidth_part2d(
        p, a.nrow, n, a.ncol, a.rowptr, a.row_col_ranges_v1()
    )
    mesh = make_mesh_2d(bp.np_row, bp.np_col, devices=devices8)
    user_B = BlockDist.from_grid(uniform_displs(a.ncol, p), uniform_displs(n, 1))
    user_C = BlockDist.from_grid(uniform_displs(a.nrow, 1), uniform_displs(n, p))

    # uneven user row ranges (not the internal layout) to force real motion
    cuts = np.linspace(0, a.nrow, p + 1).astype(np.int64)
    cuts[1:-1] += np.array([7, -11, 3, 19, -5, 2, -9], dtype=np.int64)[: p - 1]
    d = DistCSR.from_global(a, cuts)

    eng_d = CrpSpmm(d, n, user_B, user_C, nproc=p, mesh=mesh)
    eng_g = CrpSpmm(a, n, user_B, user_C, nproc=p, mesh=mesh)
    b = np.asarray(fill_b(0, a.ncol, 0, n))
    ref = a.spmm_ref(b)
    assert rel_fro_err(ref, eng_d.exec(b)) <= 1e-12
    assert eng_d.nelem_A_rd == eng_g.nelem_A_rd == a.nnz
    assert eng_d.nelem_A_agv == eng_g.nelem_A_agv
    assert eng_d.nelem_B_a2av == eng_g.nelem_B_a2av


def test_para2d_from_dist_a(devices8):
    """v2 path: A0-layout blocks replicated with a device all_gather;
    result and rA_cost match the host-global engine."""
    a = banded_random_csr(600, nnz_per_row=30, bandwidth=40, seed=55)
    n = 24
    plan = plan_from_csr(a, n, 8)
    mesh = make_mesh_2d(plan.pm, plan.pn, devices=devices8)
    d = DistCSR.from_global(a, plan.A0_rowptr)
    eng_d = Para2dSpmm.from_dist_a(d, plan, mesh=mesh)
    eng_g = Para2dSpmm(a, plan, mesh=mesh)
    b = np.asarray(fill_b(0, a.ncol, 0, n))
    ref = a.spmm_ref(b)
    assert rel_fro_err(ref, eng_d.exec(b)) <= 1e-12
    assert eng_d.rA_cost == eng_g.rA_cost
    assert eng_d.rB_recv_size == eng_g.rB_recv_size


def test_replicate_a0_panels_exact(devices8):
    a = banded_random_csr(512, nnz_per_row=12, bandwidth=25, seed=56)
    plan = plan_from_csr(a, 256, 8)
    if plan.pn == 1:
        pytest.skip("planner chose pure 1D for this matrix")
    mesh = make_mesh_2d(plan.pm, plan.pn, devices=devices8)
    d = DistCSR.from_global(a, plan.A0_rowptr)
    panels = replicate_a0(d, plan.A0_rowptr, plan.pm, plan.pn, mesh)
    for i in range(plan.pm):
        ref = a.row_slice(int(plan.AC_rowptr[i]), int(plan.AC_rowptr[i + 1]))
        assert np.array_equal(panels[i].rowptr, ref.rowptr)
        assert np.array_equal(panels[i].colidx, ref.colidx)
        assert np.array_equal(panels[i].val, ref.val)
