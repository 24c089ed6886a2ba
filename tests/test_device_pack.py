"""Device-side uniform-window densify (CRP_TPU_DEVICE_PACK).

The relay-tunneled chip makes panel upload the dominant init cost
(~25 MB/s for multi-GB panels); the device pack uploads O(nnz) scatter
indices instead and densifies on device.  These tests pin (a) bit
parity with the native host pack for both bf16 operating points, (b)
the monotone-flat safety fallbacks (duplicates / unsorted rows refuse),
and (c) end-to-end engine correctness with the device pack forced on
the CPU backend.
"""

import numpy as np
import pytest

from crp_tpu.sparse.synth import banded_random_csr, fill_b


def _pack(shard, prec, monkeypatch, on):
    from crp_tpu.kernels import dispatch

    monkeypatch.setenv("CRP_TPU_DEVICE_PACK", "1" if on else "0")
    return dispatch._pack_uniform_single_bf16(shard, 0, prec)


@pytest.mark.parametrize("prec", ["x3", "default"])
def test_device_pack_bit_parity(monkeypatch, prec):
    a = banded_random_csr(1500, nnz_per_row=7, bandwidth=40, seed=3,
                          dtype=np.float32)
    shard = (a.rowptr, a.colidx.astype(np.int32), a.val)
    host = _pack(shard, prec, monkeypatch, on=False)
    dev = _pack(shard, prec, monkeypatch, on=True)
    assert host is not None and dev is not None
    h_arrays, _ = host
    d_arrays, _ = dev
    assert len(h_arrays) == len(d_arrays)
    for h, d in zip(h_arrays, d_arrays):
        hn = np.asarray(h)
        dn = np.asarray(d)
        assert hn.shape == dn.shape
        # bf16 panels: compare raw bits (RNE split must match native's)
        assert np.array_equal(
            hn.view(np.uint16) if hn.dtype.itemsize == 2 else hn,
            dn.view(np.uint16) if dn.dtype.itemsize == 2 else dn,
        )


def test_device_pack_refuses_duplicates(monkeypatch):
    from crp_tpu.kernels.device_pack import uniform_fill_bf16

    monkeypatch.setenv("CRP_TPU_DEVICE_PACK", "1")
    # two entries at the same (row, col): flat not strictly increasing
    rowptr = np.array([0, 2], dtype=np.int64)
    cc = np.array([5, 5], dtype=np.int32)
    v = np.array([1.0, 2.0], dtype=np.float32)
    ws = np.array([0], dtype=np.int32)
    assert uniform_fill_bf16(rowptr, cc, v, 1, 256, 128, 1, ws, True) is None


def test_device_pack_refuses_unsorted_rows(monkeypatch):
    from crp_tpu.kernels.device_pack import uniform_fill_bf16

    monkeypatch.setenv("CRP_TPU_DEVICE_PACK", "1")
    rowptr = np.array([0, 2], dtype=np.int64)
    cc = np.array([9, 3], dtype=np.int32)  # descending within the row
    v = np.array([1.0, 2.0], dtype=np.float32)
    ws = np.array([0], dtype=np.int32)
    assert uniform_fill_bf16(rowptr, cc, v, 1, 256, 128, 1, ws, True) is None


def test_device_pack_budget_falls_back(monkeypatch):
    from crp_tpu.kernels.device_pack import uniform_fill_bf16

    monkeypatch.setenv("CRP_TPU_DEVICE_PACK_BUDGET_GB", "0")
    rowptr = np.array([0, 1], dtype=np.int64)
    cc = np.array([0], dtype=np.int32)
    v = np.array([1.0], dtype=np.float32)
    ws = np.array([0], dtype=np.int32)
    assert uniform_fill_bf16(rowptr, cc, v, 1, 256, 128, 1, ws, True) is None


def test_device_pack_f32_highest_parity(monkeypatch):
    """The HIGHEST operating point's device fill produces the same
    (ws, fp32 tiles, bases) as the generic host pack."""
    from crp_tpu.kernels.dispatch import _pack_pallas_uniform

    a = banded_random_csr(1500, nnz_per_row=7, bandwidth=40, seed=3,
                          dtype=np.float32)
    shards = [(a.rowptr, a.colidx.astype(np.int32), a.val)]
    monkeypatch.setenv("CRP_TPU_DEVICE_PACK", "0")
    h_arrays, _, = _pack_pallas_uniform(shards, a.nrow, np.float32)
    monkeypatch.setenv("CRP_TPU_DEVICE_PACK", "1")
    d_arrays, _ = _pack_pallas_uniform(shards, a.nrow, np.float32)
    assert len(h_arrays) == len(d_arrays) == 3
    for h, d in zip(h_arrays, d_arrays):
        assert np.array_equal(np.asarray(h), np.asarray(d))


def _cplaw(n, seed):
    from crp_tpu.sparse.synth import powerlaw_community_csr

    return powerlaw_community_csr(n, avg_degree=8, comm_size=n // 8,
                                  seed=seed)


@pytest.mark.parametrize("split", [True, False])
def test_ragged_device_pack_parity(monkeypatch, split):
    """Ragged device fill matches the native host fill bit-for-bit:
    panels (bf16 raw bits) and the spill COO set."""
    from crp_tpu.kernels.spmm_ragged import pack_ragged_window_bf16

    a = _cplaw(3000, seed=7)
    args = (a.rowptr, a.colidx.astype(np.int32),
            np.asarray(a.val, np.float32), a.ncol)
    kw = dict(TM=128, Wc=256, split=split)
    monkeypatch.setenv("CRP_TPU_DEVICE_PACK", "0")
    host = pack_ragged_window_bf16(*args, **kw)
    monkeypatch.setenv("CRP_TPU_DEVICE_PACK", "1")
    dev = pack_ragged_window_bf16(*args, **kw)
    assert host is not None and dev is not None
    rw_h, ah_h, al_h = host
    rw_d, ah_d, al_d = dev
    assert np.array_equal(rw_h.starts, rw_d.starts)
    assert np.array_equal(
        np.asarray(ah_h).view(np.uint16), np.asarray(ah_d).view(np.uint16)
    )
    if split:
        assert np.array_equal(
            np.asarray(al_h).view(np.uint16),
            np.asarray(al_d).view(np.uint16),
        )
    assert rw_h.spill_nnz == rw_d.spill_nnz
    if rw_h.spill_nnz:
        # same (row, col, val) set regardless of emission order
        def key(sp):
            r, c, v = (np.asarray(x) for x in sp)
            o = np.lexsort((c, r))
            return r[o], c[o], v[o]

        for h, d in zip(key(rw_h.spill), key(rw_d.spill)):
            assert np.array_equal(h, d)


def test_engine_end_to_end_with_device_pack(devices8, monkeypatch):
    """p=1 RowParaSpmm through the forced device pack matches the host
    fp64 reference at the x3 operating point's tolerance."""
    from crp_tpu.config import SpmmConfig
    from crp_tpu.engine.rowpara import RowParaSpmm
    from crp_tpu.plan.partition1d import csr_row_partition
    from crp_tpu.shard.layout import make_mesh_1d
    from crp_tpu.utils.norms import rel_fro_err

    monkeypatch.setenv("CRP_TPU_DEVICE_PACK", "1")
    a = banded_random_csr(2000, nnz_per_row=9, bandwidth=64, seed=11,
                          dtype=np.float32)
    displs = csr_row_partition(a.rowptr, 1)
    cfg = SpmmConfig(kernel="pallas", mxu_precision="x3")
    eng = RowParaSpmm(a, displs, displs, 64, mesh=make_mesh_1d(1),
                      config=cfg, dtype=np.float32)
    assert eng.kernel_kind == "pallas"
    b = np.asarray(fill_b(0, a.ncol, 0, 64, dtype=np.float32))
    c = eng.unshard_c(eng.exec_device(eng.shard_b(b)))
    ref = a.spmm_ref(b.astype(np.float64))
    assert rel_fro_err(ref, np.asarray(c, np.float64)) < 5e-6
