"""Direct-to-bf16 pack fast paths vs the generic fp32 pack + host cast.

The single-shard bf16 operating points densify straight to bf16 panels
(``native.pack_window_flat_bf16`` / ``native.ragged_fill_bf16``) so every
fresh output page is written once; these tests pin them bit-exactly to
the fp32-pack-then-convert path they replace.
"""

import numpy as np
import pytest

from crp_tpu import native
from crp_tpu.kernels.dispatch import (
    _pack_pallas_uniform, _pack_uniform_single_bf16,
)
from crp_tpu.kernels.spmm_pallas import np_bf16, np_split_bf16
from crp_tpu.kernels.spmm_ragged import (
    pack_ragged_window, pack_ragged_window_bf16,
)
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_community_csr

pytestmark = pytest.mark.skipif(
    native._load() is None, reason="native fastops unavailable"
)


@pytest.mark.parametrize("split", [False, True], ids=["bf16", "pair"])
def test_ragged_bf16_fill_matches_f32_then_cast(split):
    a = powerlaw_community_csr(1536, avg_degree=9, comm_size=256, seed=5)
    got = pack_ragged_window_bf16(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, split=split
    )
    assert got is not None
    rw, ah, al = got
    ref = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, dtype=np.float32
    )
    assert rw.S == ref.S and rw.spill_nnz == ref.spill_nnz
    np.testing.assert_array_equal(rw.starts, ref.starts)
    if split:
        rh, rl = np_split_bf16(ref.panels)
        np.testing.assert_array_equal(ah.view(np.uint16), rh.view(np.uint16))
        np.testing.assert_array_equal(al.view(np.uint16), rl.view(np.uint16))
    else:
        rh = np_bf16(ref.panels)
        np.testing.assert_array_equal(ah.view(np.uint16), rh.view(np.uint16))
        assert al is None
    if rw.spill is not None:
        for x, y in zip(rw.spill, ref.spill):
            np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("prec", ["default", "x3"])
def test_uniform_single_bf16_matches_generic(monkeypatch, prec):
    a = banded_random_csr(3000, nnz_per_row=9, bandwidth=100, seed=3)
    shard = (a.rowptr, a.colidx, a.val)
    fast = _pack_uniform_single_bf16(shard, a.nrow, prec)
    if fast is None:
        pytest.skip("no super-group plan at interpreter budget")
    # force the generic fp32-tiles path for the reference arrays
    monkeypatch.setattr(native, "pack_window_flat_bf16", lambda *a_: None)
    ref = _pack_pallas_uniform([shard], a.nrow, np.float32, prec)
    f_arrays, f_fn = fast
    r_arrays, r_fn = ref
    assert len(f_arrays) == len(r_arrays)
    for fa, ra in zip(f_arrays, r_arrays):
        assert fa.shape == ra.shape, (fa.shape, ra.shape)
        np.testing.assert_array_equal(
            np.asarray(fa).view(np.uint16)
            if fa.dtype.itemsize == 2 else np.asarray(fa),
            np.asarray(ra).view(np.uint16)
            if ra.dtype.itemsize == 2 else np.asarray(ra),
        )
    assert f_fn.min_b_rows == r_fn.min_b_rows
    assert f_fn.roofline == r_fn.roofline


def test_uniform_single_bf16_engine_end_to_end(devices8):
    # the fast path feeding the real engine must keep results identical
    # to the fp32-pack build (same bf16 bits -> same kernel output)
    import jax

    from crp_tpu.config import SpmmConfig
    from crp_tpu.engine.rowpara import RowParaSpmm
    from crp_tpu.plan.partition1d import csr_row_partition
    from crp_tpu.shard.layout import make_mesh_1d
    from crp_tpu.utils.norms import rel_fro_err

    a = banded_random_csr(3000, nnz_per_row=9, bandwidth=120, seed=7)
    displs = csr_row_partition(a.rowptr, 1)
    eng = RowParaSpmm(
        a, displs, displs, 16,
        mesh=make_mesh_1d(1, devices=jax.devices()[:1]),
        config=SpmmConfig(kernel="pallas", mxu_precision="x3"),
    )
    b = np.random.default_rng(0).standard_normal((a.ncol, 16))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-5
