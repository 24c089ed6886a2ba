"""Ragged gathered-window kernel tests (kernels/spmm_ragged.py).

Covers the cover/fill native-vs-numpy parity, the Pallas kernel on the
sparsity classes the uniform windowed kernel rejects (variable bandwidth,
multi-band, power-law), the VPU spill hybrid, and the engine integration
(kernel="ragged" and the pallas -> ragged fallback).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crp_tpu import native
from crp_tpu.config import SpmmConfig
from crp_tpu.engine.rowpara import RowParaSpmm
from crp_tpu.kernels.spmm_ragged import (
    RaggedWindow,
    estimate_ragged,
    pack_ragged_window,
    pack_spill,
    ragged_cover_np,
    spmm_ragged,
    spmm_ragged_bf16,
    spmm_ragged_presplit,
    spmm_spill_chunked,
)
from crp_tpu.plan.partition1d import csr_row_partition
from crp_tpu.shard.layout import make_mesh_1d
from crp_tpu.sparse.csr import CSRMatrix
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_random_csr
from crp_tpu.utils.norms import rel_fro_err


def _multiband(n, seed=5):
    """Two diagonal bands + a hub column block: exercises disjoint chunks."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), 6)
    off = rng.integers(-60, 61, size=(n, 3))
    c1 = np.clip(np.arange(n)[:, None] + off, 0, n - 1)
    c2 = np.clip((np.arange(n)[:, None] + n // 2 + off) % n, 0, n - 1)
    cols = np.concatenate([c1, c2], axis=1).ravel()
    vals = rng.standard_normal(len(rows))
    return CSRMatrix.from_coo(n, n, rows, cols, vals)


def _ragged_apply(rw: RaggedWindow, b: np.ndarray, TN=128) -> np.ndarray:
    bp = np.pad(b, ((0, max(0, rw.min_b_rows - b.shape[0])), (0, 0)))
    c = spmm_ragged(
        rw.step_g, rw.step_first, rw.starts, rw.panels, jnp.asarray(bp),
        G=rw.G, TM=rw.TM, Wc=rw.Wc, TN=TN, interpret=True,
    )
    c = np.asarray(c)
    if rw.spill_nnz:
        rows, cols, vals = pack_spill(
            rw.spill, rw.spill_nnz, rw.G * rw.TM, rw.panels.dtype
        )
        c = c + np.asarray(
            spmm_spill_chunked(
                jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
                jnp.asarray(bp), rw.G * rw.TM,
            )
        )
    return c[: rw.nrow]


def test_cover_native_numpy_parity():
    a = banded_random_csr(3000, nnz_per_row=9, bandwidth=300, seed=7)
    st_n, gp_n, sp_n = ragged_cover_np(a.rowptr, a.colidx, 128, 256, 20)
    if not native._load():
        pytest.skip("native unavailable")
    got = native.ragged_cover(
        np.asarray(a.rowptr, np.int64), np.asarray(a.colidx, np.int32),
        128, 128, 256, 20, len(gp_n) - 1,
    )
    st_c, gp_c, sp_c = got
    assert np.array_equal(st_n, st_c)
    assert np.array_equal(gp_n, gp_c)
    assert sp_n == sp_c


def test_pack_native_numpy_parity(monkeypatch):
    a = _multiband(2000)
    rw = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=30,
        dtype=np.float32,
    )
    monkeypatch.setattr(native, "ragged_cover", lambda *a, **k: None)
    monkeypatch.setattr(native, "ragged_fill_f32", lambda *a, **k: None)
    rw2 = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=30,
        dtype=np.float32,
    )
    assert np.array_equal(rw.panels, rw2.panels)
    assert rw.spill_nnz == rw2.spill_nnz
    if rw.spill is not None:
        def key(s):
            return sorted(zip(s[0].tolist(), s[1].tolist(), s[2].tolist()))

        assert key(rw.spill) == key(rw2.spill)


@pytest.mark.parametrize(
    "gen",
    [
        lambda: banded_random_csr(3000, nnz_per_row=9, bandwidth=350, seed=7),
        lambda: _multiband(2000),
        lambda: powerlaw_random_csr(2000, avg_degree=12, seed=3),
    ],
    ids=["banded", "multiband", "plaw"],
)
def test_ragged_kernel_matches_reference(gen):
    a = gen()
    rw = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=25,
        dtype=np.float64,
    )
    # every group must own at least one chunk (output init invariant)
    assert np.all(np.diff(rw.group_ptr) >= 1)
    b = np.random.default_rng(0).standard_normal((a.ncol, 64))
    c = _ragged_apply(rw, b)
    assert rel_fro_err(a.spmm_ref(b), c) <= 1e-12


def test_ragged_accounts_every_nnz():
    a = _multiband(1500)
    rw = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=40,
        dtype=np.float64,
    )
    # duplicate (row, col) entries accumulate inside panels, so compare
    # signed sums (linear in the values) rather than absolute mass
    total = float(a.val.sum())
    packed = float(rw.panels.sum())
    spilled = float(rw.spill[2].sum()) if rw.spill else 0.0
    assert abs(total - packed - spilled) < 1e-9 * max(abs(total), 1)
    assert rw.mxu_nnz + rw.spill_nnz == a.nnz


def test_spill_chunked_matches_dense():
    rng = np.random.default_rng(11)
    m, k, n, nnz = 300, 400, 32, 5000
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, k, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz)
    b = rng.standard_normal((k, n))
    dense = np.zeros((m, k))
    np.add.at(dense, (rows, cols), vals)
    ref = dense @ b
    # multi-chunk path with non-dividing chunk size + dropped pad rows
    pr, pc, pv = pack_spill((rows, cols, vals), nnz + 37, m, np.float64)
    c = spmm_spill_chunked(
        jnp.asarray(pr), jnp.asarray(pc), jnp.asarray(pv), jnp.asarray(b),
        m, chunk=999,
    )
    assert rel_fro_err(ref, np.asarray(c)) <= 1e-12


def test_trailing_empty_rows_and_empty_groups():
    # nnz only in the first 100 rows; groups 1.. are dummy chunks
    rows = np.repeat(np.arange(100, dtype=np.int64), 3)
    cols = np.tile(np.array([5, 60, 900], dtype=np.int64), 100)
    a = CSRMatrix.from_coo(400, 1000, rows, cols, np.ones(300))
    rw = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=10,
        dtype=np.float64,
    )
    b = np.random.default_rng(1).standard_normal((a.ncol, 16))
    c = _ragged_apply(rw, b)
    assert rel_fro_err(a.spmm_ref(b), c) <= 1e-12
    assert np.all(np.abs(c[100:]) == 0)


def test_estimate_matches_pack():
    a = _multiband(1500)
    S, spill, G = estimate_ragged(a.rowptr, a.colidx, 128, 256, 40)
    rw = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=40,
        dtype=np.float32,
    )
    assert S == rw.S and G == rw.G
    assert spill >= rw.spill_nnz  # cover count is an upper bound


def test_ragged_bf16_and_presplit_fp32():
    import ml_dtypes

    a = banded_random_csr(2000, nnz_per_row=9, bandwidth=200, seed=9)
    rw = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=25,
        dtype=np.float32,
    )
    b = np.random.default_rng(2).standard_normal((a.ncol, 32)).astype(np.float32)
    bp = np.pad(b, ((0, max(0, rw.min_b_rows - b.shape[0])), (0, 0)))
    ref = a.spmm_ref(b.astype(np.float64))
    norm = np.abs(ref).max()

    ah = rw.panels.astype(ml_dtypes.bfloat16)
    al = (rw.panels - ah.astype(np.float32)).astype(ml_dtypes.bfloat16)
    c3 = spmm_ragged_presplit(
        rw.step_g, rw.step_first, rw.starts, jnp.asarray(ah), jnp.asarray(al),
        jnp.asarray(bp), G=rw.G, TM=rw.TM, Wc=rw.Wc, TN=128, interpret=True,
    )
    err3 = np.abs(np.asarray(c3)[: rw.nrow] - ref).max() / norm
    assert err3 < 1e-4, err3

    c1 = spmm_ragged_bf16(
        rw.step_g, rw.step_first, rw.starts, jnp.asarray(ah),
        jnp.asarray(bp).astype(jnp.bfloat16),
        G=rw.G, TM=rw.TM, Wc=rw.Wc, TN=128, interpret=True,
    )
    err1 = np.abs(np.asarray(c1)[: rw.nrow] - ref).max() / norm
    assert err1 < 3e-2, err1
    assert err3 < err1  # x3 strictly tighter than 1-pass


@pytest.mark.parametrize("p", [1, 4])
def test_engine_ragged_kernel(p, devices8):
    a = powerlaw_random_csr(2500, avg_degree=13, seed=4)
    displs = csr_row_partition(a.rowptr, p)
    eng = RowParaSpmm(
        a, displs, displs, 24,
        mesh=make_mesh_1d(p, devices=devices8[:p]),
        config=SpmmConfig(kernel="ragged"),
    )
    assert getattr(eng._local_fn, "variant", None) == "ragged"
    b = np.random.default_rng(3).standard_normal((a.ncol, 24))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12
    # roofline record carries the hybrid accounting
    rl = eng._local_fn.roofline
    assert 0 < rl["mxu_frac"] <= 1 and rl["S"] >= rl["G"]


def test_break_even_amortizes_tall_groups():
    """The physical break-even model: the B-chunk term (Wc*n) dominates
    and is TM-independent, so quadrupling TM must far less than quadruple
    the keep threshold (the old TM*Wc/1024 heuristic scaled linearly)."""
    from crp_tpu.kernels.spmm_ragged import default_min_chunk_nnz

    be128 = default_min_chunk_nnz(128, 512)
    be512 = default_min_chunk_nnz(512, 512)
    assert be512 < 2.1 * be128
    # and the measured r3 break-even (~52-60 nnz at (128, 512)) is matched
    assert 40 <= be128 <= 80


def test_choose_geometry_model_and_env_override(monkeypatch):
    """Model-based (TM, Wc): valid grid point, env knobs win, interpret
    restricts Wc (the CPU interpreter's per-step cost scales with
    scratch)."""
    from crp_tpu.kernels.dispatch import pack_local_kernel
    from crp_tpu.kernels.spmm_ragged import choose_ragged_geometry

    a = powerlaw_random_csr(4096, avg_degree=13, seed=8)
    tm, wc = choose_ragged_geometry(a.rowptr, a.colidx, "x3")
    assert tm in (128, 256, 512) and wc in (128, 256, 512)
    tm_i, wc_i = choose_ragged_geometry(
        a.rowptr, a.colidx, "x3", interpret=True
    )
    assert wc_i <= 256
    monkeypatch.setenv("CRP_TPU_RAGGED_TM", "256")
    monkeypatch.setenv("CRP_TPU_RAGGED_WC", "256")
    _, fn = pack_local_kernel(
        [(a.rowptr, a.colidx, a.val)], a.nrow, np.float64, "ragged"
    )
    assert fn.roofline["TM"] == 256 and fn.roofline["W"] == 256


def test_panel_cap_escalates_spill_instead_of_refusing():
    """A cap the default break-even cover exceeds must produce a valid
    (more-spilled) pack, not UnsupportedSparsity — cage15-class reach
    (VERDICT r3 weak #3)."""
    a = powerlaw_random_csr(3000, avg_degree=14, seed=9)
    full = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=2,
        dtype=np.float64,
    )
    cap = full.S * 128 * 256 * 8 // 3  # ~1/3 of the fp64 panel bytes
    rw = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=128, Wc=256, min_chunk_nnz=2,
        max_panel_bytes=cap, dtype=np.float64,
    )
    assert rw.S * 128 * 256 * 8 <= cap
    assert rw.spill_nnz > full.spill_nnz
    assert rw.mxu_nnz + rw.spill_nnz == a.nnz
    b = np.random.default_rng(5).standard_normal((a.ncol, 16))
    assert rel_fro_err(a.spmm_ref(b), _ragged_apply(rw, b)) <= 1e-12


@pytest.mark.parametrize("impl,dtype,tol", [
    ("segsum", np.float64, 1e-12),
    ("clip", np.float64, 1e-12),
    ("twopass", np.float64, 1e-12),
    # the fused one-hot-MXU kernel is fp32-only (fp64 dd keeps the VPU
    # path); HIGHEST operating point -> fp32-class error
    ("pallas", np.float32, 1e-5),
])
def test_spill_impl_variants(impl, dtype, tol, monkeypatch, devices8):
    """All spill formulations (CRP_TPU_SPILL_IMPL) agree with the
    reference through the engine."""
    monkeypatch.setenv("CRP_TPU_SPILL_IMPL", impl)
    # pin geometry + break-even so the cover is guaranteed to spill
    # (the adaptive chooser is free to pick a spill-free cover here)
    monkeypatch.setenv("CRP_TPU_RAGGED_TM", "128")
    monkeypatch.setenv("CRP_TPU_RAGGED_WC", "256")
    monkeypatch.setenv("CRP_TPU_RAGGED_MIN_NNZ", "40")
    a = powerlaw_random_csr(2500, avg_degree=13, seed=4)
    displs = csr_row_partition(a.rowptr, 3)
    eng = RowParaSpmm(
        a, displs, displs, 24,
        mesh=make_mesh_1d(3, devices=devices8[:3]),
        config=SpmmConfig(kernel="ragged"), dtype=dtype,
    )
    assert eng._local_fn.roofline["spill_nnz"] > 0  # variant exercised
    b = np.random.default_rng(3).standard_normal((a.ncol, 24)).astype(dtype)
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= tol


def test_spill_pallas_geometry_knobs(monkeypatch, devices8):
    """CRP_TPU_SPILL_TMO/Q reshape the fused spill's step geometry (bigger
    blocks -> fewer grid steps) without changing the result."""
    monkeypatch.setenv("CRP_TPU_SPILL_IMPL", "pallas")
    monkeypatch.setenv("CRP_TPU_SPILL_TMO", "256")
    monkeypatch.setenv("CRP_TPU_SPILL_Q", "256")
    monkeypatch.setenv("CRP_TPU_RAGGED_TM", "128")
    monkeypatch.setenv("CRP_TPU_RAGGED_WC", "256")
    monkeypatch.setenv("CRP_TPU_RAGGED_MIN_NNZ", "40")
    a = powerlaw_random_csr(2500, avg_degree=13, seed=4)
    displs = csr_row_partition(a.rowptr, 3)
    eng = RowParaSpmm(
        a, displs, displs, 24,
        mesh=make_mesh_1d(3, devices=devices8[:3]),
        config=SpmmConfig(kernel="ragged"), dtype=np.float32,
    )
    assert eng._local_fn.roofline["spill_nnz"] > 0
    b = np.random.default_rng(3).standard_normal((a.ncol, 24))
    b = b.astype(np.float32)
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-5


@pytest.mark.parametrize("prec", ["highest", "x3", "default"])
def test_spill_pallas_direct(prec):
    """Fused spill kernel vs the dense reference at every operating
    point, including dummy blocks (rows with no spill) and multi-step
    blocks."""
    from crp_tpu.kernels.spmm_ragged import (
        pack_spill_blocks, spmm_spill_pallas,
    )

    rng = np.random.default_rng(11)
    M, n, Q = 512, 40, 128
    z = 700
    rows = np.sort(rng.integers(0, 260, z)).astype(np.int32)  # blocks 0-2
    cols = rng.integers(0, 300, z).astype(np.int32)
    vals = rng.standard_normal(z).astype(np.float32)
    b = rng.standard_normal((300, n)).astype(np.float32)
    c0 = rng.standard_normal((M, n)).astype(np.float32)
    ref = c0.astype(np.float64).copy()
    for r, cc, v in zip(rows, cols, vals):
        ref[r] += float(v) * b[cc].astype(np.float64)
    rel, pc, pv, first, blk = pack_spill_blocks(
        (rows, cols, vals), 64, M, np.float32, TMo=128, Q=Q
    )
    out = np.asarray(spmm_spill_pallas(
        jnp.asarray(c0), rel, pc, pv, first, blk, jnp.asarray(b),
        TMo=128, Q=Q, mxu_precision=prec, interpret=True,
    ))
    tol = {"highest": 2e-6, "x3": 2e-4, "default": 2e-2}[prec]
    assert rel_fro_err(ref, out) <= tol


@pytest.mark.parametrize("p", [1, 3])
def test_engine_gather_kernel(p, devices8, monkeypatch):
    """kernel="gather": every nnz through the bulk-gather + one-hot-MXU
    block reduce — the scrambled/pure-power-law path (no cover, no
    scatter). Forcing a tiny contrib budget exercises the block-aligned
    chunking."""
    monkeypatch.setenv("CRP_TPU_GATHER_GB", "0.001")  # force multi-chunk
    a = powerlaw_random_csr(2500, avg_degree=13, seed=4,
                            dtype=np.float32)
    displs = csr_row_partition(a.rowptr, p)
    eng = RowParaSpmm(
        a, displs, displs, 24,
        mesh=make_mesh_1d(p, devices=devices8[:p]),
        config=SpmmConfig(kernel="gather"), dtype=np.float32,
    )
    assert eng._local_fn.variant == "gather"
    b = np.random.default_rng(3).standard_normal((a.ncol, 24)) \
        .astype(np.float32)
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-5


def test_gather_rejects_fp64(devices8):
    """fp64 keeps its accuracy contract: gather is fp32-only, the engine
    falls back to the VPU dd path."""
    a = banded_random_csr(600, nnz_per_row=5, bandwidth=40, seed=9)
    displs = csr_row_partition(a.rowptr, 2)
    eng = RowParaSpmm(
        a, displs, displs, 8,
        mesh=make_mesh_1d(2, devices=devices8[:2]),
        config=SpmmConfig(kernel="gather"), dtype=np.float64,
    )
    assert eng.kernel_kind in ("dd", "segsum")
    b = np.random.default_rng(1).standard_normal((a.ncol, 8))
    assert rel_fro_err(a.spmm_ref(b), eng.exec(b)) <= 1e-12


def test_spill_impl_validates(monkeypatch):
    from crp_tpu.kernels.spmm_ragged import spill_impl

    monkeypatch.delenv("CRP_TPU_SPILL_IMPL", raising=False)
    assert spill_impl() == "auto"  # resolved per-pack by spill density
    monkeypatch.setenv("CRP_TPU_SPILL_IMPL", "palas")  # typo must raise
    with pytest.raises(ValueError, match="CRP_TPU_SPILL_IMPL"):
        spill_impl()


@pytest.mark.parametrize("seed", range(6))
def test_block_pack_invariants_fuzz(seed):
    """pack_spill_blocks / pack_gather_blocks invariants under random
    shapes: every nnz lands in exactly one (step, slot) with the right
    block, rel ids stay in [0, TMo], blk is sorted with every block
    present, and first marks exactly the block starts."""
    from crp_tpu.kernels.spmm_ragged import (
        gather_step_layout, pack_gather_blocks, pack_spill_blocks,
    )

    rng = np.random.default_rng(seed)
    TMo = Q = 128
    nrow = int(rng.integers(1, 1200))
    M = -(-nrow // TMo) * TMo
    z = int(rng.integers(0, 5000))
    rows = np.sort(rng.integers(0, nrow, z)).astype(np.int64)
    cols = rng.integers(0, 3000, z).astype(np.int32)
    vals = rng.standard_normal(z).astype(np.float32)

    counts = np.bincount(rows // TMo, minlength=M // TMo)
    ns = int(np.maximum(-(-counts // Q), 1).sum())
    rel, pc, pv, first, blk = pack_spill_blocks(
        (rows, cols, vals) if z else None, ns + 3, M, np.float32,
        TMo=TMo, Q=Q,
    )
    assert rel.shape == (ns + 3, 1, Q)
    assert np.all(np.diff(blk) >= 0)
    assert set(np.unique(blk[: ns])) == set(range(M // TMo))
    assert first[0] == 1 and first.sum() == M // TMo
    live = rel[:, 0, :] < TMo  # pad slots carry rel == TMo
    assert int(live.sum()) == z
    # reconstruct (row, col, val) multiset from the pack
    rr = (blk[:, None] * TMo + rel[:, 0, :])[live]
    assert sorted(zip(rr.tolist(), pc[live].tolist(), pv[live].tolist())) \
        == sorted(zip(rows.tolist(), cols.tolist(), vals.tolist()))

    # gather pack over a CSR built from the same entries
    if z:
        from crp_tpu.sparse.csr import CSRMatrix

        a = CSRMatrix.from_coo(nrow, 3000, rows, cols,
                               vals.astype(np.float64), dtype=np.float32)
        step_base = gather_step_layout(
            [np.diff(a.rowptr[np.minimum(
                np.arange(M // TMo + 1) * TMo, nrow)]).astype(np.int64)],
            Q,
        )
        grel, gc, gv, gfirst, gblk = pack_gather_blocks(
            a.rowptr, a.colidx, a.val, step_base, M, TMo=TMo, Q=Q,
        )
        glive = grel[:, 0, :] < TMo
        assert int(glive.sum()) == a.nnz
        grr = (gblk[:, None] * TMo + grel[:, 0, :])[glive]
        got = sorted(zip(grr.tolist(), gc[glive].tolist()))
        # from_coo keeps duplicate (row, col) entries (column-sorted)
        exp = sorted(zip(rows.tolist(), [int(c2) for c2 in cols]))
        assert got == exp
