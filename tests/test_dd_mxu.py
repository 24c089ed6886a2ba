"""fp64-class MXU kernel (Ozaki exact slicing, kernels/spmm_dd_mxu.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crp_tpu.config import SpmmConfig
from crp_tpu.engine.rowpara import RowParaSpmm
from crp_tpu.kernels.spmm_dd import pack_b_dd, unpack_c_dd
from crp_tpu.kernels.spmm_dd_mxu import (
    PASSES, QA, pack_ragged_dd, slice_a_f64, spmm_ragged_dd,
)
from crp_tpu.kernels.spmm_ragged import pack_ragged_window
from crp_tpu.plan.partition1d import csr_row_partition
from crp_tpu.shard.layout import make_mesh_1d
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_community_csr
from crp_tpu.utils.norms import rel_fro_err


def test_blockspec_validator_matches_mosaic_rule():
    from crp_tpu.kernels.spmm_pallas import assert_tpu_blockable

    # legal: trailing two dims equal the array dims (mu rides as (S, 1, TM))
    assert_tpu_blockable((1, 1, 128), (3402, 1, 128))
    # legal: divisible by the (8, 128) quantum
    assert_tpu_blockable((8, 128), (3400, 128))
    # the exact shape the chip rejected for the r3 dd_mxu record: a (1, TM)
    # block over (S, TM) with S % 8 != 0 lowers in the interpreter but not
    # on hardware
    with pytest.raises(ValueError, match="not TPU-lowerable"):
        assert_tpu_blockable((1, 128), (3402, 128))
    # sublane quantum is dtype-dependent: 8 rows passes for fp32 but not
    # for 2-byte types (16), and a rank-1 block constrains the lane dim
    assert_tpu_blockable((16, 128), (3400, 128), itemsize=2)
    with pytest.raises(ValueError, match="not TPU-lowerable"):
        assert_tpu_blockable((8, 128), (3400, 128), itemsize=2)
    with pytest.raises(ValueError, match="not TPU-lowerable"):
        assert_tpu_blockable((8,), (3402,))


def test_native_dd_slice_matches_numpy(monkeypatch):
    from crp_tpu import native

    if native._load() is None:
        pytest.skip("native fastops unavailable")
    rng = np.random.default_rng(11)
    panels = rng.standard_normal((5, 8, 256)) * np.exp2(
        rng.integers(-40, 40, (5, 8, 256))
    )
    panels[0, 0] = 0.0  # all-zero lane: mu must stay 1
    mu_n, sl_n = slice_a_f64(panels)
    monkeypatch.setattr(native, "dd_slice_f64", lambda *a, **k: None)
    mu_p, sl_p = slice_a_f64(panels)
    assert np.array_equal(mu_n, mu_p)
    assert np.array_equal(sl_n.view(np.uint16), sl_p.view(np.uint16))


def test_pass_schedule():
    # 34 exact passes, none beyond the slice planes, p+q <= 7
    assert len(PASSES) == 34
    assert all(p < QA and q < QA and p + q <= 7 for p, q in PASSES)


def test_a_slices_reconstruct_to_49_bits():
    a = banded_random_csr(600, nnz_per_row=7, bandwidth=80, seed=7)
    rw = pack_ragged_window(a.rowptr, a.colidx, a.val, a.ncol, TM=128,
                            Wc=256, min_chunk_nnz=1, dtype=np.float64)
    mu, slices = slice_a_f64(rw.panels)
    rec = np.zeros(rw.panels.shape)
    for p in range(QA):
        rec += slices[p].astype(np.float64) * 2.0 ** (-7 * (p + 1))
    rec *= mu[:, :, None].astype(np.float64)
    scale = np.abs(rw.panels).max()
    assert np.abs(rec - rw.panels).max() <= 2.0 ** -48 * scale
    # slices are bf16-exact integers within the 7-bit budget
    for p in range(QA):
        sp = slices[p].astype(np.float64)
        assert np.all(sp == np.rint(sp)) and np.abs(sp).max() <= 128


@pytest.mark.parametrize(
    "gen",
    [
        lambda: banded_random_csr(1500, nnz_per_row=7, bandwidth=120, seed=7),
        lambda: powerlaw_community_csr(1536, avg_degree=9, comm_size=256,
                                       seed=3),
    ],
    ids=["banded", "cplaw"],
)
def test_dd_mxu_kernel_fp64_class(gen):
    a = gen()
    rw, mu, slices = pack_ragged_dd(a.rowptr, a.colidx, a.val, a.ncol,
                                    TM=128, Wc=256)
    assert rw.spill_nnz == 0  # total cover: dd accuracy has no spill tier
    b = np.random.default_rng(0).standard_normal((a.ncol, 40))
    bp = pack_b_dd(b)
    bp = np.pad(bp, ((0, max(0, rw.min_b_rows - bp.shape[0])), (0, 0)))
    c_packed = spmm_ragged_dd(
        rw.step_g, rw.step_first, rw.starts, mu, slices,
        jnp.asarray(np.asarray(bp, np.float32)),
        G=rw.G, TM=rw.TM, Wc=rw.Wc, TN=128, interpret=True,
    )
    c = unpack_c_dd(np.asarray(c_packed))[: a.nrow]
    assert rel_fro_err(a.spmm_ref(b), c) <= 1e-13


@pytest.mark.parametrize("p", [1, 4])
def test_engine_dd_mxu(p, devices8):
    a = banded_random_csr(3000, nnz_per_row=9, bandwidth=150, seed=7)
    displs = csr_row_partition(a.rowptr, p)
    eng = RowParaSpmm(a, displs, displs, 24,
                      mesh=make_mesh_1d(p, devices=devices8[:p]),
                      config=SpmmConfig(kernel="dd_mxu"))
    assert getattr(eng._local_fn, "variant", None) == "dd_mxu"
    assert eng.is_dd  # B/C travel as packed hi/lo halves
    b = np.random.default_rng(0).standard_normal((a.ncol, 24))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-13


def test_dd_stays_vpu_off_tpu(devices8):
    # kernel="dd" keeps the VPU double-float path on non-TPU backends
    a = banded_random_csr(800, nnz_per_row=5, bandwidth=40, seed=9)
    displs = csr_row_partition(a.rowptr, 2)
    eng = RowParaSpmm(a, displs, displs, 8,
                      mesh=make_mesh_1d(2, devices=devices8[:2]),
                      config=SpmmConfig(kernel="dd"))
    assert getattr(eng._local_fn, "variant", None) is None
    b = np.random.default_rng(1).standard_normal((a.ncol, 8))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12


def test_dd_slice_range_rejected(monkeypatch):
    # mu is stored/applied as fp32: row scales outside the fp32 NORMAL
    # range must be rejected (-> UnsupportedSparsity -> VPU dd fallback),
    # not silently turned into inf / flushed to zero — in both the native
    # slicer and its numpy twin (ADVICE r3: native/fastops.cpp:443)
    from crp_tpu import native
    from crp_tpu.kernels.spmm_pallas import UnsupportedSparsity

    big = np.zeros((1, 8, 256))
    big[0, 0, 0] = float(np.ldexp(1.5, 127))   # amax in (2^127, 2^128)
    tiny = np.zeros((1, 8, 256))
    tiny[0, 0, 0] = float(np.ldexp(1.0, -130))  # mu = 2^-129 would flush
    ok = np.zeros((1, 8, 256))
    ok[0, 0, 0] = float(np.ldexp(1.0, 126))     # mu = 2^127: still normal
    for panels in (big, tiny):
        if native._load() is not None:
            with pytest.raises(UnsupportedSparsity):
                slice_a_f64(panels)
        with monkeypatch.context() as mp:
            mp.setattr(native, "dd_slice_f64", lambda *a, **k: None)
            with pytest.raises(UnsupportedSparsity):
                slice_a_f64(panels)
    mu, _ = slice_a_f64(ok)
    assert mu[0, 0] == np.float32(np.ldexp(1.0, 127))


def test_dd_mxu_wc_clamped_for_exactness(monkeypatch):
    # fp32 accumulation of Wc products bounded by 2^14 is exact only for
    # Wc <= 1024: the pack must clamp independently of the shared
    # CRP_TPU_RAGGED_WC knob (ADVICE r3: kernels/dispatch.py:840)
    import jax as _jax

    from crp_tpu.kernels.dispatch import _pack_dd_mxu

    monkeypatch.setenv("CRP_TPU_RAGGED_WC", "2048")
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    a = banded_random_csr(256, nnz_per_row=5, bandwidth=30, seed=3,
                          dtype=np.float64)
    _, fn = _pack_dd_mxu([(a.rowptr, a.colidx, a.val)], 256)
    assert fn.roofline["W"] <= 1024


def test_dd_fallback_skips_mxu_retry(monkeypatch):
    # after an explicit dd_mxu pack raised UnsupportedSparsity, the dd
    # retry must not re-run the identical MXU cover just to fail again
    # (ADVICE r3: kernels/dispatch.py:131)
    import jax as _jax

    import crp_tpu.kernels.dispatch as dispatch
    from crp_tpu.kernels.spmm_pallas import UnsupportedSparsity

    calls = []

    def boom(*args, **kwargs):
        calls.append(1)
        raise UnsupportedSparsity("forced")

    monkeypatch.setattr(dispatch, "_pack_dd_mxu", boom)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    a = banded_random_csr(64, nnz_per_row=3, bandwidth=8, seed=0,
                          dtype=np.float64)
    shards = [(a.rowptr, a.colidx, a.val)]
    _, fn = dispatch.pack_local_kernel(
        shards, 64, np.float64, "dd", dd_skip_mxu=True
    )
    assert calls == []
    assert getattr(fn, "variant", None) is None  # VPU dd pack, not MXU
    _, _ = dispatch.pack_local_kernel(shards, 64, np.float64, "dd")
    assert calls == [1]
