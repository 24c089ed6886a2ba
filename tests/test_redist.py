"""Redistribution engine tests (shard layer) — the mat_redist equivalent.

The reference exercises mat_redist in its own check path (reshard the
2D-blocked C to a full matrix on rank 0, ``examples/test_para2d_spmm.c:
193-200``); round-trips here mirror that.
"""

import numpy as np
import pytest

from crp_tpu.shard.layout import make_mesh_1d, make_mesh_2d
from crp_tpu.shard.redist import BlockDist, RedistEngine
from crp_tpu.utils.blocks import uniform_displs


def rand(m, n, seed=0):
    return np.random.default_rng(seed).standard_normal((m, n))


def roundtrip(src, dst, mesh, x, axes=None):
    eng = RedistEngine(src, dst, mesh, axes=axes)
    xs = eng.shard_src(x)
    out = eng.exec_device(xs)
    return eng, eng.unshard_dst(out, x.shape[0], x.shape[1])


def test_row_slabs_to_col_slabs(devices8):
    m, n, p = 53, 37, 4
    x = rand(m, n)
    src = BlockDist.from_row_slabs(uniform_displs(m, p), n)
    # column slabs: blocks (0, c0, m, w)
    cd = uniform_displs(n, p)
    dst = BlockDist(np.stack([np.zeros(p), cd[:-1], np.full(p, m),
                              np.diff(cd)], axis=1))
    mesh = make_mesh_1d(p, devices=devices8)
    _, y = roundtrip(src, dst, mesh, x)
    np.testing.assert_allclose(y, x, rtol=1e-15)


def test_grid_to_grid_2d_mesh(devices8):
    """2D-blocked -> differently 2D-blocked over a ('pm','pn') mesh."""
    m, n = 61, 45
    x = rand(m, n, seed=1)
    src = BlockDist.from_grid(uniform_displs(m, 4), uniform_displs(n, 2))
    dst = BlockDist.from_grid(
        np.array([0, 10, 61]), np.array([0, 7, 20, 33, 45])
    )
    mesh = make_mesh_2d(4, 2, devices=devices8)
    _, y = roundtrip(src, dst, mesh, x)
    np.testing.assert_allclose(y, x, rtol=1e-15)


def test_gather_to_root(devices8):
    """The drivers' validation reshard: everything to device 0."""
    m, n, p = 40, 24, 8
    x = rand(m, n, seed=2)
    src = BlockDist.from_row_slabs(uniform_displs(m, p), n)
    dst = src.gather_single(m, n, root=0)
    mesh = make_mesh_1d(p, devices=devices8)
    eng = RedistEngine(src, dst, mesh)
    out = np.asarray(eng.exec_device(eng.shard_src(x)))
    np.testing.assert_allclose(out[0], x, rtol=1e-15)
    assert eng.nelem_dst == m * n


def test_scatter_from_root(devices8):
    m, n, p = 30, 16, 4
    x = rand(m, n, seed=3)
    dst = BlockDist.from_row_slabs(uniform_displs(m, p), n)
    src = dst.gather_single(m, n, root=2)
    mesh = make_mesh_1d(p, devices=devices8)
    _, y = roundtrip(src, dst, mesh, x)
    np.testing.assert_allclose(y, x, rtol=1e-15)


def test_nnz_vector_redistribution(devices8):
    """1 x nnz 'row vector' redistribution — how the v1 engine moves
    colidx/val between nnz ranges (deprecated/src/crpspmm.c:240-265)."""
    nnz, p = 997, 4
    x = rand(1, nnz, seed=4)
    src_d = uniform_displs(nnz, p)
    a = np.array([0, 137, 400, 800, nnz])
    src = BlockDist(np.stack([np.zeros(p), src_d[:-1], np.ones(p),
                              np.diff(src_d)], axis=1))
    dst = BlockDist(np.stack([np.zeros(p), a[:-1], np.ones(p),
                              np.diff(a)], axis=1))
    mesh = make_mesh_1d(p, devices=devices8)
    _, y = roundtrip(src, dst, mesh, x)
    np.testing.assert_allclose(y, x, rtol=1e-15)


def test_volume_audit(devices8):
    m, n, p = 32, 8, 4
    x = rand(m, n, seed=5)
    displs = uniform_displs(m, p)
    src = BlockDist.from_row_slabs(displs, n)
    # shift ownership by one block -> every element moves off-device
    dst = BlockDist.from_row_slabs(displs, n)
    dst.blocks = np.roll(src.blocks, 1, axis=0)
    mesh = make_mesh_1d(p, devices=devices8)
    eng, y = roundtrip(src, dst, mesh, x)
    np.testing.assert_allclose(y, x, rtol=1e-15)
    assert eng.nelem_moved == m * n          # all moved
    assert eng.nelem_dst == m * n
    assert eng.nelem_physical >= eng.nelem_moved


def test_identity_redistribution_moves_nothing(devices8):
    m, n, p = 24, 12, 4
    x = rand(m, n, seed=6)
    src = BlockDist.from_row_slabs(uniform_displs(m, p), n)
    mesh = make_mesh_1d(p, devices=devices8)
    eng, y = roundtrip(src, src, mesh, x)
    np.testing.assert_allclose(y, x, rtol=1e-15)
    assert eng.nelem_moved == 0
