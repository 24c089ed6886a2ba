"""Fused halo-push windowed kernel tests (remote DMA in interpret mode).

NOTE: meshes here use at most 7 of the 8 virtual devices — the pallas
interpreter deadlocks when blocking cross-device semaphore waits occupy
every host thread (real chips each have their own core).
"""

import numpy as np
import pytest

from crp_tpu.config import SpmmConfig
from crp_tpu.engine.rowpara import RowParaSpmm
from crp_tpu.plan.partition1d import csr_row_partition
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_random_csr, fill_b
from crp_tpu.shard.layout import make_mesh_1d
from crp_tpu.utils.norms import rel_fro_err


@pytest.mark.parametrize("p,n", [(1, 16), (4, 32), (7, 128)])
def test_halo_engine_matches_reference(p, n, devices8):
    a = banded_random_csr(2048, nnz_per_row=7, bandwidth=60, seed=60)
    displs = csr_row_partition(a.rowptr, p)
    eng = RowParaSpmm(a, displs, displs, n, mesh=make_mesh_1d(p, devices=devices8),
                      config=SpmmConfig(kernel="pallas_halo"), dtype=np.float64)
    b = np.asarray(fill_b(0, a.ncol, 0, n))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12
    # exec is repeatable: the window buffer threads through execs
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12


def test_halo_audit_and_stat(devices8):
    a = banded_random_csr(1024, nnz_per_row=5, bandwidth=30, seed=62)
    displs = csr_row_partition(a.rowptr, 4)
    eng = RowParaSpmm(a, displs, displs, 16, mesh=make_mesh_1d(4, devices=devices8),
                      config=SpmmConfig(kernel="pallas_halo"), dtype=np.float32)
    # physical pushes cover at least the logical requirement
    assert eng.hplan.halo_rows_pushed >= eng.rB_recv_size
    b = np.asarray(fill_b(0, a.ncol, 0, 16, dtype=np.float32))
    bs = eng.shard_b(b)
    eng.exec_timed(bs)
    assert "Total exec()" in eng.print_stat()


def test_halo_rejects_non_banded():
    from crp_tpu.kernels.spmm_halo import align_displs, build_halo_plan
    from crp_tpu.kernels.spmm_pallas import UnsupportedSparsity

    a = powerlaw_random_csr(3000, avg_degree=5, seed=63)
    displs = align_displs(csr_row_partition(a.rowptr, 4), a.ncol)
    shards = [a.row_slice(int(displs[i]), int(displs[i + 1])) for i in range(4)]
    with pytest.raises(UnsupportedSparsity):
        build_halo_plan(shards, displs, max_window=512)


def test_halo_rejects_overlap(devices8):
    a = banded_random_csr(300, nnz_per_row=5, bandwidth=20, seed=64)
    displs = csr_row_partition(a.rowptr, 2)
    with pytest.raises(ValueError, match="halo"):
        RowParaSpmm(a, displs, displs, 8, mesh=make_mesh_1d(2, devices=devices8),
                    config=SpmmConfig(kernel="pallas_halo", overlap=1))


def test_halo_para2d_grid(devices8):
    """Fused halo exec on a 2D pm x pn mesh: pushes along pm inside each
    column group, flattened logical device ids."""
    from crp_tpu.engine.para2d import Para2dSpmm
    from crp_tpu.shard.layout import make_mesh_2d
    from tests.test_para2d import force_plan

    a = banded_random_csr(2048, nnz_per_row=7, bandwidth=60, seed=65)
    n = 20
    plan = force_plan(a, n, 3, 2)  # 6 of 8 devices (interpreter headroom)
    mesh = make_mesh_2d(3, 2, devices=devices8)
    eng = Para2dSpmm(a, plan, mesh=mesh,
                     config=SpmmConfig(kernel="pallas_halo"), dtype=np.float64)
    b = np.asarray(fill_b(0, a.ncol, 0, n))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12


def test_kernel_fallbacks_on_unsupported_sparsity(devices8):
    """Documented behavior: pallas_halo rejects unsupported sparsity at
    pack time and the engine walks the fallback chain (halo -> pallas).
    A hub row spanning 20000 columns blows the uniform max_window cap for
    both, but the pallas seam now routes it to the ragged gathered-window
    pack; a fully unstructured scatter defeats ragged too -> segsum."""
    from crp_tpu.sparse.csr import CSRMatrix

    nrow = ncol = 20000
    rows = np.concatenate([np.zeros(ncol, np.int64),
                           np.arange(nrow, dtype=np.int64)])
    cols = np.concatenate([np.arange(ncol, dtype=np.int64),
                           np.arange(nrow, dtype=np.int64)])
    vals = np.ones(len(rows))
    hub = CSRMatrix.from_coo(nrow, ncol, rows, cols, vals)
    b = np.asarray(fill_b(0, ncol, 0, 8))
    for kernel in ("pallas", "pallas_halo"):
        eng = RowParaSpmm(hub, csr_row_partition(hub.rowptr, 4),
                          np.linspace(0, ncol, 5).astype(np.int64), 8,
                          mesh=make_mesh_1d(4, devices=devices8),
                          config=SpmmConfig(kernel=kernel))
        assert not eng.is_halo                           # halo rejected
        assert getattr(eng._local_fn, "variant", None) == "ragged"
        assert rel_fro_err(hub.spmm_ref(b), eng.exec(b)) <= 1e-12

    rng = np.random.default_rng(62)
    rows = np.arange(512, dtype=np.int64).repeat(3)
    cols = rng.integers(0, ncol, size=len(rows))
    rnd = CSRMatrix.from_coo(512, ncol, rows, cols, np.ones(len(rows)))
    # rb_reidx=0 keeps raw column coordinates (reidx compaction would
    # legitimately turn the scatter into a narrow uniform window)
    eng = RowParaSpmm(rnd, csr_row_partition(rnd.rowptr, 4),
                      np.linspace(0, ncol, 5).astype(np.int64), 8,
                      mesh=make_mesh_1d(4, devices=devices8),
                      config=SpmmConfig(kernel="pallas_halo", rb_reidx=0))
    assert not eng.is_halo
    assert not hasattr(eng._local_fn, "min_b_rows")  # ragged rejected too
    assert eng.kernel_kind == "segsum"
    assert rel_fro_err(rnd.spmm_ref(b), eng.exec(b)) <= 1e-12
