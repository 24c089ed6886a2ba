"""End-to-end 2D engine tests on the 8-device CPU mesh.

Mirrors the reference's ``test_para2d_spmm`` driver: plan -> distribute ->
replicate A -> exec -> redistribute C -> fp64 check (<= 1e-12).
"""

import numpy as np
import pytest

from crp_tpu.engine.para2d import Para2dSpmm
from crp_tpu.plan.planner2d import plan_from_csr, Plan2D
from crp_tpu.plan.partition1d import csr_row_partition
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_random_csr, fill_b
from crp_tpu.shard.layout import make_mesh_2d
from crp_tpu.utils.blocks import uniform_displs
from crp_tpu.utils.norms import rel_fro_err


def force_plan(a, n, pm, pn):
    """Build a plan with a forced grid (for exercising specific shapes)."""
    nproc = pm * pn
    rb = csr_row_partition(a.rowptr, nproc)
    AC = rb[::pn].copy()
    A0 = rb.copy()
    return Plan2D(
        nproc=nproc, m=a.nrow, n=n, k=a.ncol, pm=pm, pn=pn, comm_cost=0,
        A0_rowptr=A0, B_rowptr=AC if a.nrow == a.ncol else uniform_displs(a.ncol, pm),
        AC_rowptr=AC, BC_colptr=uniform_displs(n, pn),
    )


@pytest.mark.parametrize("pm,pn", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2), (3, 2)])
def test_para2d_grids(pm, pn, devices8):
    a = banded_random_csr(400, nnz_per_row=7, bandwidth=35, seed=30)
    n = 20
    plan = force_plan(a, n, pm, pn)
    mesh = make_mesh_2d(pm, pn, devices=devices8)
    eng = Para2dSpmm(a, plan, mesh=mesh)
    b = np.asarray(fill_b(0, a.ncol, 0, n))
    c = eng.exec(b)
    assert rel_fro_err(a.spmm_ref(b), c) <= 1e-12


@pytest.mark.parametrize("mode", [dict(rb_p2p=1), dict(overlap=1)])
def test_para2d_ring_and_overlap(mode, devices8):
    """Ring exchange and overlapped exec on a pm x pn grid (exchange along
    pm inside each of the pn column groups)."""
    from crp_tpu.config import SpmmConfig

    a = banded_random_csr(400, nnz_per_row=7, bandwidth=45, seed=33)
    n = 20
    plan = force_plan(a, n, 4, 2)
    mesh = make_mesh_2d(4, 2, devices=devices8)
    eng = Para2dSpmm(a, plan, mesh=mesh, config=SpmmConfig(**mode))
    b = np.asarray(fill_b(0, a.ncol, 0, n))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12


def test_para2d_dd_kernel(devices8):
    """Double-float kernel on a 2D grid: fp32 device arrays, fp64-class
    result, including narrow (padded) column slabs."""
    from crp_tpu.config import SpmmConfig

    a = banded_random_csr(400, nnz_per_row=7, bandwidth=40, seed=37)
    n = 13  # not divisible by pn -> narrow last slab exercises the hi/lo halves
    plan = force_plan(a, n, 2, 4)
    mesh = make_mesh_2d(2, 4, devices=devices8)
    eng = Para2dSpmm(a, plan, mesh=mesh, config=SpmmConfig(kernel="dd"))
    b = np.asarray(fill_b(0, a.ncol, 0, n))
    c = eng.exec(b)
    assert c.dtype == np.float64
    assert rel_fro_err(a.spmm_ref(b), c) <= 1e-12


def test_para2d_planner_chosen_grid(devices8):
    """Use the actual planner decision end-to-end (flagship path,
    SURVEY.md section 3.1)."""
    a = powerlaw_random_csr(600, avg_degree=12, seed=31)
    n = 64
    plan = plan_from_csr(a, n, 8)
    mesh = make_mesh_2d(plan.pm, plan.pn, devices=devices8)
    eng = Para2dSpmm(a, plan, mesh=mesh)
    b = np.asarray(fill_b(0, a.ncol, 0, n))
    c = eng.exec(b)
    assert rel_fro_err(a.spmm_ref(b), c) <= 1e-12


def test_para2d_uneven_column_slabs(devices8):
    """n not divisible by pn -> padded column slabs must still be exact."""
    a = banded_random_csr(300, nnz_per_row=5, bandwidth=25, seed=32)
    plan = force_plan(a, 13, 2, 4)
    eng = Para2dSpmm(a, plan, mesh=make_mesh_2d(2, 4, devices=devices8))
    b = np.asarray(fill_b(0, a.ncol, 0, 13))
    c = eng.exec(b)
    assert rel_fro_err(a.spmm_ref(b), c) <= 1e-12


def test_para2d_audit_and_stats(devices8):
    a = banded_random_csr(300, nnz_per_row=6, bandwidth=30, seed=33)
    plan = force_plan(a, 16, 4, 2)
    eng = Para2dSpmm(a, plan, mesh=make_mesh_2d(4, 2, devices=devices8))
    b = np.asarray(fill_b(0, a.ncol, 0, 16))
    eng.exec(b)
    # rA_cost formula parity: last A0 block nnz * (pn-1) * 1.5
    last_nnz = int(a.rowptr[plan.A0_rowptr[-1]] - a.rowptr[plan.A0_rowptr[-2]])
    assert eng.rA_cost == int(last_nnz * (plan.pn - 1) * 1.5)
    stat = eng.print_stat()
    assert "replicating A" in stat and "replicating B" in stat


def test_para2d_rB_volume_equals_plan_prediction(devices8):
    """Engine's audit count == planner's rB prediction (same counting)."""
    a = powerlaw_random_csr(500, avg_degree=9, seed=34)
    plan = plan_from_csr(a, 32, 8)
    if plan.pm == 1:
        pytest.skip("planner chose full replication; no B exchange")
    eng = Para2dSpmm(a, plan, mesh=make_mesh_2d(plan.pm, plan.pn, devices=devices8))
    assert eng.rB_recv_size * plan.n == plan.rB_cost


def test_para2d_spmv_n1(devices8):
    """n=1 (the reference's vary_n lower end, plot_vary_n2.m)."""
    a = banded_random_csr(600, nnz_per_row=6, bandwidth=30, seed=70)
    plan = plan_from_csr(a, 1, 8)
    eng = Para2dSpmm(a, plan,
                     mesh=make_mesh_2d(plan.pm, plan.pn, devices=devices8))
    b = np.asarray(fill_b(0, a.ncol, 0, 1))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12


def test_para2d_rectangular_planner(devices8):
    """m != k through the planner (uniform B rows, m==k rule off)."""
    from crp_tpu.sparse.csr import CSRMatrix

    a0 = banded_random_csr(500, nnz_per_row=6, bandwidth=40, seed=71)
    keep = a0.colidx < 300
    rows = np.repeat(np.arange(a0.nrow), np.diff(a0.rowptr))[keep]
    a = CSRMatrix.from_coo(500, 300, rows, a0.colidx[keep], a0.val[keep])
    plan = plan_from_csr(a, 16, 8)
    eng = Para2dSpmm(a, plan,
                     mesh=make_mesh_2d(plan.pm, plan.pn, devices=devices8))
    b = np.asarray(fill_b(0, 300, 0, 16))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12


def test_para2d_gather_and_pallas_spill(devices8, monkeypatch):
    """Round-4 kernel kinds through the 2D engine: the gather one-hot
    reduce and the fused pallas spill formulation both shard over pm."""
    from crp_tpu.config import SpmmConfig

    a = powerlaw_random_csr(1600, avg_degree=12, seed=41,
                            dtype=np.float32)
    n = 16
    plan = force_plan(a, n, 2, 2)
    mesh = make_mesh_2d(2, 2, devices=devices8)
    b = np.asarray(fill_b(0, a.ncol, 0, n, dtype=np.float32))
    ref = a.spmm_ref(b)

    eng = Para2dSpmm(a, plan, mesh=mesh, dtype=np.float32,
                     config=SpmmConfig(kernel="gather"))
    assert eng._local_fn.variant == "gather"
    assert rel_fro_err(ref, eng.exec(b)) <= 1e-5

    monkeypatch.setenv("CRP_TPU_SPILL_IMPL", "pallas")
    monkeypatch.setenv("CRP_TPU_RAGGED_TM", "128")
    monkeypatch.setenv("CRP_TPU_RAGGED_WC", "256")
    monkeypatch.setenv("CRP_TPU_RAGGED_MIN_NNZ", "40")
    eng = Para2dSpmm(a, plan, mesh=mesh, dtype=np.float32,
                     config=SpmmConfig(kernel="ragged"))
    assert eng._local_fn.roofline["spill_nnz"] > 0
    assert rel_fro_err(ref, eng.exec(b)) <= 1e-5


def test_para2d_fallback_lands_on_gather(devices8, monkeypatch):
    """The TPU sparsity-fallback chain (forced via CRP_TPU_FALLBACK on the
    CPU mesh) through the 2D engine: a pure-scatter matrix refused by the
    uniform and ragged covers lands on the gather kernel."""
    from crp_tpu.config import SpmmConfig
    from crp_tpu.sparse.csr import CSRMatrix

    monkeypatch.setenv("CRP_TPU_FALLBACK", "gather,segsum")
    rng = np.random.default_rng(62)
    nr, k = 512, 20000
    rows = np.arange(nr, dtype=np.int64).repeat(4)
    cols = rng.integers(0, k, size=4 * nr)
    a = CSRMatrix.from_coo(nr, k, rows, cols, np.ones(len(rows)))
    n = 16
    plan = force_plan(a, n, 2, 2)
    mesh = make_mesh_2d(2, 2, devices=devices8)
    eng = Para2dSpmm(a, plan, mesh=mesh, dtype=np.float32,
                     config=SpmmConfig(kernel="pallas", rb_reidx=0))
    assert eng.kernel_kind == "gather"
    b = np.asarray(fill_b(0, a.ncol, 0, n, dtype=np.float32))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-5
