"""Local CSR x dense SpMM — ragged gathered-window Pallas MXU kernel.

Generalizes the uniform windowed kernel (``spmm_pallas.py``) from "one
contiguous window per row group" to "a ragged LIST of fixed-width chunks
per row group", lifting the two limits the round-2 review called out
against the reference's any-CSR local kernels (MKL
``src/rowpara_spmm.c:398-407``, cuSPARSE
``deprecated/src/cuda_proxy.cu:122-182``):

  * variable / large bandwidth: panel storage is ``sum_g chunks_g * TM *
    Wc`` — proportional to the *covered intervals*, not ``G * max_window``
    — so cage15-class (~100M nnz) shards pack on a single chip;
  * unstructured / power-law sparsity: each group's nonzero columns are
    greedily covered by ``Wc``-wide TK-aligned intervals; chunks whose nnz
    count cannot pay for their dense panel (``min_chunk_nnz``) are dropped
    and their nonzeros *spill* to a memory-bounded VPU scatter-add path —
    the hybrid serves hub tiles and community-local blocks on the MXU and
    the random tail on the VPU.

Kernel shape: grid ``(NJ, S)`` — n-tiles outer so that each ``(group,
n-tile)`` output block is visited on consecutive steps (all of a group's
chunks are adjacent in the flat step order).  Per step the A panel chunk
``(TM, Wc)`` streams through the BlockSpec pipeline while the B chunk
``B[starts[s] : +Wc, j*TN : +TN]`` is DMA'd HBM->VMEM double-buffered
across steps; chunk starts are data-dependent, hence scalar-prefetched
(``PrefetchScalarGridSpec``) like the uniform kernel's window starts.

Precision follows the windowed family: fp32 panels + HIGHEST (~1e-7),
pre-split bf16 hi/lo panels with in-kernel B split ("x3", ~1e-6), or
bf16 hi-only 1-pass ("default", ~1e-3, half the panel bytes).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np

from .spmm_pallas import TK, UnsupportedSparsity


@dataclasses.dataclass
class RaggedWindow:
    """Host-side packed form of one shard for the ragged kernel."""

    nrow: int              # rows covered (G * TM >= nrow)
    ncol: int              # rB rows (gather space)
    TM: int
    G: int                 # row groups
    Wc: int                # chunk width (rows of B per chunk, TK-aligned)
    starts: np.ndarray     # (S,) int32 B-row start per chunk (TK-aligned)
    group_ptr: np.ndarray  # (G+1,) int64 chunk range per group (>=1 each)
    panels: np.ndarray     # (S, TM, Wc) dense A chunk panels
    # spilled nonzeros (rows relative to the shard, cols in rB space);
    # None when every nnz landed in a kept chunk
    spill: tuple[np.ndarray, np.ndarray, np.ndarray] | None
    mxu_nnz: int
    spill_nnz: int

    @property
    def S(self) -> int:
        return len(self.starts)

    @property
    def step_g(self) -> np.ndarray:
        return np.repeat(
            np.arange(self.G, dtype=np.int32), np.diff(self.group_ptr)
        )

    @property
    def step_first(self) -> np.ndarray:
        first = np.zeros(self.S, dtype=np.int32)
        first[self.group_ptr[:-1]] = 1
        return first

    @property
    def min_b_rows(self) -> int:
        return int(self.starts.max()) + self.Wc if self.S else self.Wc


def default_panel_cap_bytes() -> int:
    """Cap on a shard's kept dense panels, default 8 GiB (half of a v5e
    chip's 16 GB HBM — leaves room for B/C, spill arrays, and XLA
    temporaries).  ``CRP_TPU_RAGGED_PANEL_GB`` overrides (float GB): lower
    it to co-locate more shards or raise it for single-chip reach runs
    (the cage15-class bigmat records, VERDICT r3 weak #3)."""
    import os

    gb = float(os.environ.get("CRP_TPU_RAGGED_PANEL_GB", 8.0))
    return max(int(gb * (1 << 30)), 1 << 20)


def ragged_params() -> tuple[int, int]:
    """(TM, Wc) for the ragged kernel; env ``CRP_TPU_RAGGED_TM`` /
    ``CRP_TPU_RAGGED_WC`` override the defaults (128, 512)."""
    import os

    TM = int(os.environ.get("CRP_TPU_RAGGED_TM", 128))
    Wc = int(os.environ.get("CRP_TPU_RAGGED_WC", 512))
    assert Wc % TK == 0, Wc
    return TM, Wc


def default_min_chunk_nnz(TM: int, Wc: int) -> int:
    """Break-even nnz for keeping a chunk on the MXU.

    Physical model: a kept chunk streams its A panel (``TM*Wc`` fp32-byte
    equivalent — bf16 hi/lo pair at x3, fp32 at HIGHEST) plus its B chunk
    (``Wc*n`` fp32) from HBM, while a spilled nnz costs ~21 ns through the
    sorted segment-sum gather (both measured on chip, r3 786k-node cplaw:
    chunk ~1.1 us at (128, 512), spill ~21 ns/nnz).  The B term dominates
    and is TM-independent — taller row groups amortize it, which the old
    ``TM*Wc/1024`` heuristic missed.  n is not known at pack time; the
    reference's standard n = 256 is assumed (the breakpoint moves slowly
    with n).  Rates follow the projection model's measured effective
    numbers (``CRP_PROJ_HBM_GBPS`` / ``CRP_PROJ_SPILL_NS``); override the
    result directly with ``CRP_TPU_RAGGED_MIN_NNZ``.
    """
    import os

    env = os.environ.get("CRP_TPU_RAGGED_MIN_NNZ")
    if env is not None:
        return max(1, int(env))
    hbm = float(os.environ.get("CRP_PROJ_HBM_GBPS", 623)) * 1e9
    spill_ns = float(os.environ.get("CRP_PROJ_SPILL_NS", 21))
    n_ref = 256
    chunk_s = (TM * Wc + Wc * n_ref) * 4.0 / hbm
    return max(8, int(np.ceil(chunk_s / (spill_ns * 1e-9))))


def choose_ragged_geometry(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    mxu_precision: str = "highest",
    n_ref: int = 256,
    interpret: bool = False,
) -> tuple[int, int]:
    """Model-based (TM, Wc) choice for the ragged kernel (per matrix).

    The reference hardwires its local-kernel tiling to the library's
    (MKL/cuSPARSE pick internally); here the geometry trades three HBM
    terms the cost model can price exactly from a cover-only pass
    (``estimate_ragged``): A panel bytes (S*TM*Wc), B chunk traffic
    (S*Wc*n — TM-independent, so taller groups amortize it; the r3 cplaw
    matrix halves its non-spill time at TM=512/Wc=128), and C writeback.
    Spill cost uses the measured sorted-segment-sum rate.  Candidates are
    the 3x3 {128,256,512}^2 grid, thinned for very large shards to bound
    the host-side cover time; ``CRP_TPU_RAGGED_TM``/``WC`` (handled by the
    caller) override the choice entirely.
    """
    import os

    # defaults mirror plan/project.py's _rates() (same provenance): the
    # chooser and the projection model must price identical kernels
    # identically
    hbm = float(os.environ.get("CRP_PROJ_HBM_GBPS", 623)) * 1e9
    spill_ns = float(os.environ.get("CRP_PROJ_SPILL_NS", 21)) * 1e-9
    mxu = float(os.environ.get("CRP_PROJ_MXU_TFLOPS", 165)) * 1e12
    passes = {"x3": 3, "highest": 6, "default": 1}.get(mxu_precision, 1)
    a_itemsize = {"x3": 4, "default": 2}.get(mxu_precision, 4)
    b_itemsize = 2 if mxu_precision == "default" else 4
    nnz = int(rowptr[-1]) - int(rowptr[0])
    cands = [(tm, wc) for tm in (128, 256, 512) for wc in (128, 256, 512)]
    if nnz > 30_000_000:  # bound the host-side cover sweep on huge shards
        cands = [(128, 512), (256, 256), (512, 128), (512, 256)]
    if interpret:
        cands = [(tm, wc) for tm, wc in cands if wc <= 256]
    best, best_t = cands[0], float("inf")
    for tm, wc in cands:
        S, spill, G = estimate_ragged(rowptr, colidx, TM=tm, Wc=wc)
        a_b = S * tm * wc * a_itemsize
        b_b = S * wc * n_ref * b_itemsize
        c_b = G * tm * n_ref * 4
        t_hbm = (a_b + b_b + c_b) / hbm
        t_mxu = passes * 2.0 * S * tm * wc * n_ref / mxu
        t = max(t_hbm, t_mxu) + spill * spill_ns
        if t < best_t:
            best, best_t = (tm, wc), t
    return best


def resolve_ragged_geometry(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    mxu_precision: str = "highest",
    interpret: bool = False,
) -> tuple[int, int]:
    """(TM, Wc) the pack will actually use: env knobs / ``AUTO=0`` pin the
    fixed :func:`ragged_params` defaults, otherwise the model picks
    (:func:`choose_ragged_geometry`).  Shared by the dispatch pack and the
    projection model so projected rooflines mirror packed reality."""
    import os

    env_fixed = (
        "CRP_TPU_RAGGED_TM" in os.environ
        or "CRP_TPU_RAGGED_WC" in os.environ
        or os.environ.get("CRP_TPU_RAGGED_AUTO", "1") == "0"
    )
    nnz = (int(rowptr[-1]) - int(rowptr[0])) if len(rowptr) > 1 else 0
    if env_fixed or nnz == 0:
        TM, Wc = ragged_params()
        if interpret:
            Wc = min(Wc, 256)
        return TM, Wc
    return choose_ragged_geometry(
        rowptr, colidx, mxu_precision, interpret=interpret
    )


def _cover_group_np(cols_sorted: np.ndarray, Wc: int) -> list[int]:
    """Greedy fixed-width interval cover of sorted distinct columns.

    Chunks are TK-aligned, width Wc, disjoint (next start >= prev + Wc).
    """
    starts = []
    i = 0
    n = len(cols_sorted)
    while i < n:
        s = (int(cols_sorted[i]) // TK) * TK
        starts.append(s)
        i = int(np.searchsorted(cols_sorted, s + Wc, side="left"))
    return starts


def ragged_cover_np(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    TM: int,
    Wc: int,
    min_chunk_nnz: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    """numpy twin of the native cover: (starts, group_ptr, spill_nnz).

    Every group gets >= 1 chunk (an all-zero dummy when everything
    spilled) so its output block is always initialized.
    """
    nrow = len(rowptr) - 1
    G = max(-(-nrow // TM), 1)
    all_starts: list[int] = []
    group_ptr = np.zeros(G + 1, dtype=np.int64)
    spill_nnz = 0
    for g in range(G):
        j0 = int(rowptr[min(g * TM, nrow)])
        j1 = int(rowptr[min((g + 1) * TM, nrow)])
        kept: list[int] = []
        if j1 > j0:
            cols = np.unique(colidx[j0:j1])
            starts = np.asarray(_cover_group_np(cols, Wc), dtype=np.int64)
            # chunk of each nnz: disjoint chunks, cover is total
            ch = np.searchsorted(starts, colidx[j0:j1], side="right") - 1
            cnt = np.bincount(ch, minlength=len(starts))
            keep = cnt >= min_chunk_nnz
            kept = [int(s) for s, k in zip(starts, keep) if k]
            spill_nnz += int(cnt[~keep].sum())
        if not kept:
            kept = [0]
        all_starts.extend(kept)
        group_ptr[g + 1] = len(all_starts)
    return np.asarray(all_starts, dtype=np.int32), group_ptr, spill_nnz


def _cover_with_cap(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    TM: int,
    Wc: int,
    min_chunk_nnz: int,
    G: int,
    max_panel_bytes: int,
    itemsize: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Cover the shard; when the kept panels exceed ``max_panel_bytes``,
    escalate ``min_chunk_nnz`` (x4 per step) and re-cover — spilling more
    of the thin tail instead of refusing the matrix.  cage15-class reach
    on one chip depends on this: a fixed break-even inflates panels
    24-47x over the CSR on power-law inputs (VERDICT r3 weak #3).  Raises
    UnsupportedSparsity only when even an (almost) all-spill cover cannot
    fit (the per-group dummy chunks are the floor)."""
    from .. import native

    mn = min_chunk_nnz
    for _ in range(12):
        got = native.ragged_cover(rowptr, colidx, TM, TK, Wc, mn, G)
        if got is None:
            got = ragged_cover_np(rowptr, colidx, TM, Wc, mn)
        starts, group_ptr, spill_nnz = got
        panel_bytes = len(starts) * TM * Wc * itemsize
        if panel_bytes <= max_panel_bytes:
            return starts, group_ptr, spill_nnz
        if len(starts) <= G:  # already all-dummy: escalation is exhausted
            break
        mn *= 4
    raise UnsupportedSparsity(
        f"ragged panels {panel_bytes >> 20} MiB > cap even at "
        f"min_chunk_nnz={mn}"
    )


def pack_ragged_window(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    val: np.ndarray,
    ncol: int,
    TM: int = 128,
    Wc: int = 512,
    min_chunk_nnz: int | None = None,
    max_panel_bytes: int | None = None,
    dtype=np.float32,
) -> RaggedWindow:
    """Cover + densify a CSR shard into ragged chunk panels (+ spill COO).

    Raises UnsupportedSparsity when the kept panels would exceed
    ``max_panel_bytes``.
    """
    assert Wc % TK == 0, Wc
    nrow = len(rowptr) - 1
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    nnz = int(rowptr[-1]) - int(rowptr[0])
    if nnz == 0:
        raise UnsupportedSparsity("empty shard")
    if min_chunk_nnz is None:
        min_chunk_nnz = default_min_chunk_nnz(TM, Wc)
    if max_panel_bytes is None:
        max_panel_bytes = default_panel_cap_bytes()
    G = max(-(-nrow // TM), 1)

    from .. import native

    starts, group_ptr, spill_nnz = _cover_with_cap(
        rowptr, colidx, TM, Wc, min_chunk_nnz, G,
        max_panel_bytes, np.dtype(dtype).itemsize,
    )
    S = len(starts)

    filled = None
    if np.dtype(dtype) == np.float32:
        filled = native.ragged_fill_f32(
            rowptr, colidx, np.asarray(val, dtype=np.float32),
            TM, TK, Wc, G, starts, group_ptr, spill_nnz,
        )
    elif np.dtype(dtype) == np.float64:
        filled = native.ragged_fill_f64(
            rowptr, colidx, np.asarray(val, dtype=np.float64),
            TM, TK, Wc, G, starts, group_ptr, spill_nnz,
        )
    if filled is not None:
        panels, sp_rows, sp_cols, sp_vals = filled
        spill_nnz = len(sp_rows)
    else:
        panels = np.zeros((S, TM, Wc), dtype=dtype)
        sp_rows = np.zeros(spill_nnz, dtype=np.int32)
        sp_cols = np.zeros(spill_nnz, dtype=np.int32)
        sp_vals = np.zeros(spill_nnz, dtype=dtype)
        sp = 0
        counts = np.diff(rowptr)
        r_all = np.repeat(np.arange(nrow, dtype=np.int64), counts)
        for g in range(G):
            j0 = int(rowptr[min(g * TM, nrow)])
            j1 = int(rowptr[min((g + 1) * TM, nrow)])
            if j1 == j0:
                continue
            c0, c1 = int(group_ptr[g]), int(group_ptr[g + 1])
            sg = starts[c0:c1].astype(np.int64)
            cols = colidx[j0:j1].astype(np.int64)
            rows = r_all[j0:j1]
            ch = np.searchsorted(sg, cols, side="right") - 1
            inside = (ch >= 0) & (cols - sg[np.clip(ch, 0, None)] < Wc)
            pi = np.flatnonzero(inside)
            flat = (
                (c0 + ch[pi]) * TM + (rows[pi] - g * TM)
            ) * Wc + (cols[pi] - sg[ch[pi]])
            np.add.at(panels.reshape(-1), flat, val[j0:j1][pi].astype(dtype))
            si = np.flatnonzero(~inside)
            k = len(si)
            sp_rows[sp : sp + k] = rows[si]
            sp_cols[sp : sp + k] = cols[si]
            sp_vals[sp : sp + k] = val[j0:j1][si].astype(dtype)
            sp += k
        # the cover's count is an upper bound — dropped-chunk nnz inside a
        # kept/dummy chunk's range are absorbed into the panel instead
        assert sp <= spill_nnz, (sp, spill_nnz)
        sp_rows, sp_cols, sp_vals = sp_rows[:sp], sp_cols[:sp], sp_vals[:sp]
        spill_nnz = sp

    spill = (sp_rows, sp_cols, sp_vals) if spill_nnz else None
    return RaggedWindow(
        nrow=nrow, ncol=ncol, TM=TM, G=G, Wc=Wc,
        starts=starts, group_ptr=group_ptr,
        panels=np.asarray(panels, dtype=dtype),
        spill=spill, mxu_nnz=nnz - spill_nnz, spill_nnz=spill_nnz,
    )


def pack_ragged_window_bf16(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    val: np.ndarray,
    ncol: int,
    TM: int = 128,
    Wc: int = 512,
    split: bool = False,
    min_chunk_nnz: int | None = None,
    max_panel_bytes: int | None = None,
):
    """Cover + densify straight to bf16 (split=False, the 1-pass point)
    or a bf16 hi/lo pair (split=True, x3) — the fp32 panel intermediate
    never materializes, halving engine-init fresh-page traffic (this
    VM's first-touch fault path runs ~100 MB/s; see fastops.cpp).

    Returns (rw, ah, al_or_None) with ``rw.panels`` left empty, or None
    when the native path is unavailable (callers fall back to the fp32
    pack + host-side conversion).
    """
    assert Wc % TK == 0, Wc
    from .. import native

    nrow = len(rowptr) - 1
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    nnz = int(rowptr[-1]) - int(rowptr[0])
    if nnz == 0:
        raise UnsupportedSparsity("empty shard")
    if min_chunk_nnz is None:
        min_chunk_nnz = default_min_chunk_nnz(TM, Wc)
    if max_panel_bytes is None:
        max_panel_bytes = default_panel_cap_bytes()
    G = max(-(-nrow // TM), 1)
    if native._load() is None:  # direct-bf16 fill needs the native lib
        return None
    # fp32-bytes cap on purpose: kernel selection must not depend on
    # whether the native direct-bf16 path is available (the fp32 fallback
    # applies this same cap), so bf16's smaller footprint is not used to
    # admit matrices the fallback would reject
    starts, group_ptr, spill_nnz = _cover_with_cap(
        rowptr, colidx, TM, Wc, min_chunk_nnz, G, max_panel_bytes, 4,
    )
    S = len(starts)
    filled = None
    from . import device_pack

    if device_pack.enabled():
        # densify ON DEVICE: uploads O(nnz) scatter positions instead of
        # the multi-GB panels (the dominant init cost through the relay)
        filled = device_pack.ragged_fill_bf16(
            rowptr, colidx, val, TM, Wc, G, starts, group_ptr, split,
        )
    if filled is None:
        # the native fill stages one group's chunks in fp32; bound the
        # transient (hub-heavy groups can hold most of the matrix's width)
        max_nch = int(np.diff(group_ptr).max()) if G else 1
        if max_nch * TM * Wc * 4 > (1 << 30):
            return None
        filled = native.ragged_fill_bf16(
            rowptr, colidx, np.asarray(val, np.float32), TM, TK, Wc, G,
            starts, group_ptr, spill_nnz, split,
        )
        if filled is None:
            return None
    ah, al, sp_rows, sp_cols, sp_vals = filled
    spill_nnz = len(sp_rows)
    spill = (sp_rows, sp_cols, sp_vals) if spill_nnz else None
    rw = RaggedWindow(
        nrow=nrow, ncol=ncol, TM=TM, G=G, Wc=Wc,
        starts=starts, group_ptr=group_ptr,
        panels=np.zeros((0, TM, Wc), np.float32),
        spill=spill, mxu_nnz=nnz - spill_nnz, spill_nnz=spill_nnz,
    )
    return rw, ah, al


def estimate_ragged(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    TM: int = 128,
    Wc: int = 512,
    min_chunk_nnz: int | None = None,
) -> tuple[int, int, int]:
    """Cover-only pass for the dispatch cost model: (S, spill_nnz, G)."""
    if min_chunk_nnz is None:
        min_chunk_nnz = default_min_chunk_nnz(TM, Wc)
    nrow = len(rowptr) - 1
    G = max(-(-nrow // TM), 1)
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    from .. import native

    got = native.ragged_cover(rowptr, colidx, TM, TK, Wc, min_chunk_nnz, G)
    if got is None:
        got = ragged_cover_np(rowptr, colidx, TM, Wc, min_chunk_nnz)
    starts, _, spill_nnz = got
    return len(starts), int(spill_nnz), G


# --------------------------------------------------------------------- kernel


def ragged_slots(total: int) -> int:
    """Chunk-pipeline depth (B window + A panel DMA slots).

    The per-chunk MXU work is tiny (a (TM, Wc) x (Wc, TN) dot, ~0.5 us),
    so with the classic 2-slot double buffer every grid step exposes the
    B-window DMA's end-to-end latency — measured on the cplaw power-law
    class this serialization, not bandwidth or FLOPs, bounds the kernel
    (both (512,128)/S=12322 and (256,512)/S=8607 geometries landed at
    ~0.081 s, ~8% MXU; ``bench_results/r4_tpu_geometry.jsonl``).  A deeper
    rolling prefetch gives each transfer NSLOT-1 steps of flight time.
    ``CRP_TPU_RAGGED_SLOTS`` overrides (min 2, max 16)."""
    ns = int(os.environ.get("CRP_TPU_RAGGED_SLOTS", 8))
    return max(2, min(ns, 16, max(total, 2)))


def _chunk_pipeline(pl, pltpu, starts_ref, a_hbms, b_hbm, awins, asems,
                    bwin, bsem, *, TM, Wc, TN, S, NSLOT, lin, total):
    """Rolling NSLOT-deep prefetch of chunk (A panel, B window) pairs.

    Returns (slot, wait) — ``wait()`` blocks on chunk ``lin``'s transfers.
    A panels live in HBM as (S*TM, Wc) (one flat panel stack); chunk l's
    panel is rows [ss*TM, (ss+1)*TM).  The B window is the classic
    scalar-prefetched ``starts_ref`` slice.  Slot reuse distance equals
    NSLOT, one step beyond the consuming wait — the same safety margin as
    the original 2-slot double buffer."""

    def dmas(l, slot):
        jj = l // S
        ss = l - jj * S
        ops = [
            pltpu.make_async_copy(
                b_hbm.at[
                    pl.ds(pl.multiple_of(starts_ref[ss], TK), Wc),
                    pl.ds(pl.multiple_of(jj * TN, TN), TN),
                ],
                bwin.at[slot],
                bsem.at[slot],
            )
        ]
        ops += [
            pltpu.make_async_copy(
                hbm.at[pl.ds(pl.multiple_of(ss * TM, TM), TM)],
                win.at[slot],
                sem.at[slot],
            )
            for hbm, win, sem in zip(a_hbms, awins, asems)
        ]
        return ops

    @pl.when(lin == 0)
    def _():
        for k in range(min(NSLOT - 1, total)):
            for op in dmas(k, k % NSLOT):
                op.start()

    @pl.when(lin + NSLOT - 1 < total)
    def _():
        for op in dmas(lin + NSLOT - 1, (lin + NSLOT - 1) % NSLOT):
            op.start()

    slot = lin % NSLOT

    def wait():
        for op in dmas(lin, slot):
            op.wait()

    return slot, wait


def _acc_and_emit(pl, pltpu, jnp, first_ref, o_hbm, acc, osem,
                  *, TM, TN, G, S, NJ, lin, j, s, g, partial):
    """Accumulate chunk partials in a VMEM scratch; DMA each group's
    (TM, TN) block to the ANY-space output exactly once.

    The round-5 slots A/B (``bench_results/r5_tpu_slots.jsonl``) showed
    deeper INPUT pipelining moves the cplaw exec by only 1.5% — because
    the dominant traffic was never the inputs: with ``out_specs`` indexed
    by the data-dependent ``g_ref[s]``, the pipeline streams the (TM, TN)
    fp32 output block through VMEM on EVERY chunk step (read + write,
    ~1 MB x S steps ~ 12 GB on the cplaw pack vs 3.2 GB of panels).
    Chunks of one group are consecutive, so the correct shape is: keep
    the group's accumulator resident in VMEM and write it back once per
    group (G x TM*TN*4 bytes total), double-buffered across groups so the
    store of group ``lg-1`` overlaps the accumulation of ``lg``.
    """
    lg = j * G + g  # linear group counter (every group has >= 1 chunk)
    slot = lg % 2
    total = NJ * S

    def out_dma(lg_, slot_):
        jj = lg_ // G
        gg = lg_ - jj * G
        return pltpu.make_async_copy(
            acc.at[slot_],
            o_hbm.at[
                pl.ds(pl.multiple_of(gg * TM, TM), TM),
                pl.ds(pl.multiple_of(jj * TN, TN), TN),
            ],
            osem.at[slot_],
        )

    first = first_ref[s] == 1
    # before overwriting this slot for group lg, drain its previous use
    # (group lg - 2 issued a store from it at its last chunk)
    @pl.when(first & (lg >= 2))
    def _():
        out_dma(lg - 2, slot).wait()

    @pl.when(first)
    def _():
        acc[slot] = partial

    @pl.when(jnp.logical_not(first))
    def _():
        acc[slot] = acc[slot] + partial

    s_next = jnp.minimum(s + 1, S - 1)
    last = jnp.where(s + 1 < S, first_ref[s_next] == 1, True)

    @pl.when(last)
    def _():
        out_dma(lg, slot).start()

    # grid end: drain the (at most two) in-flight group stores
    @pl.when(lin == total - 1)
    def _():
        out_dma(lg, slot).wait()

    @pl.when((lin == total - 1) & (lg >= 1))
    def _():
        out_dma(lg - 1, 1 - slot).wait()


def _ragged_kernel(
    g_ref, first_ref, starts_ref, a_hbm, b_hbm, o_hbm,
    awin, bwin, acc, asem, bsem, osem,
    *, G, TM, Wc, TN, NJ, S, NSLOT, precision, compute_dtype, acc_dtype,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    s = pl.program_id(1)
    lin = j * S + s
    total = NJ * S

    slot, wait = _chunk_pipeline(
        pl, pltpu, starts_ref, (a_hbm,), b_hbm, (awin,), (asem,),
        bwin, bsem, TM=TM, Wc=Wc, TN=TN, S=S, NSLOT=NSLOT,
        lin=lin, total=total,
    )
    wait()

    dims = (((1,), (0,)), ((), ()))
    if precision == "x3":
        a32 = awin[slot].astype(jnp.float32)
        b32 = bwin[slot].astype(jnp.float32)
        ah = a32.astype(jnp.bfloat16)
        al = (a32 - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b32.astype(jnp.bfloat16)
        bl = (b32 - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        partial = dot(ah, bh) + (dot(ah, bl) + dot(al, bh))
    else:
        partial = jax.lax.dot_general(
            awin[slot].astype(compute_dtype),
            bwin[slot].astype(compute_dtype),
            dims,
            preferred_element_type=acc_dtype,
            precision=precision,
        )

    _acc_and_emit(
        pl, pltpu, jnp, first_ref, o_hbm, acc, osem,
        TM=TM, TN=TN, G=G, S=S, NJ=NJ, lin=lin, j=j, s=s, g=g_ref[s],
        partial=partial.astype(acc_dtype),
    )


def _ragged_kernel_presplit(
    g_ref, first_ref, starts_ref, ah_hbm, al_hbm, b_hbm, o_hbm,
    ah_win, al_win, bwin, acc, ah_sem, al_sem, bsem, osem,
    *, G, TM, Wc, TN, NJ, S, NSLOT,
):
    """x3 variant: A chunks pre-split to bf16 hi/lo at pack time, B split
    in-kernel (the in-kernel B split is fully hidden behind the DMA —
    measured on the uniform family, bench_results/r2_tpu_presplit_b)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    s = pl.program_id(1)
    lin = j * S + s
    total = NJ * S

    slot, wait = _chunk_pipeline(
        pl, pltpu, starts_ref, (ah_hbm, al_hbm), b_hbm,
        (ah_win, al_win), (ah_sem, al_sem), bwin, bsem,
        TM=TM, Wc=Wc, TN=TN, S=S, NSLOT=NSLOT, lin=lin, total=total,
    )
    wait()

    b32 = bwin[slot].astype(jnp.float32)
    bh = b32.astype(jnp.bfloat16)
    bl = (b32 - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    partial = dot(ah_win[slot], bh) + (
        dot(ah_win[slot], bl) + dot(al_win[slot], bh)
    )

    _acc_and_emit(
        pl, pltpu, jnp, first_ref, o_hbm, acc, osem,
        TM=TM, TN=TN, G=G, S=S, NJ=NJ, lin=lin, j=j, s=s, g=g_ref[s],
        partial=partial,
    )


def _ragged_kernel_bf16(
    g_ref, first_ref, starts_ref, ah_hbm, bh_hbm, o_hbm,
    ah_win, bwin, acc, ah_sem, bsem, osem,
    *, G, TM, Wc, TN, NJ, S, NSLOT,
):
    """1-pass bf16 operating point: half the panel bytes, one MXU pass."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    s = pl.program_id(1)
    lin = j * S + s
    total = NJ * S

    slot, wait = _chunk_pipeline(
        pl, pltpu, starts_ref, (ah_hbm,), bh_hbm, (ah_win,), (ah_sem,),
        bwin, bsem, TM=TM, Wc=Wc, TN=TN, S=S, NSLOT=NSLOT,
        lin=lin, total=total,
    )
    wait()

    partial = jax.lax.dot_general(
        ah_win[slot], bwin[slot], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    _acc_and_emit(
        pl, pltpu, jnp, first_ref, o_hbm, acc, osem,
        TM=TM, TN=TN, G=G, S=S, NJ=NJ, lin=lin, j=j, s=s, g=g_ref[s],
        partial=partial,
    )


def _ragged_call(kern, a_dtypes, G, TM, Wc, TN, NJ, S, n, win_dtype,
                 acc_dtype, interpret, NSLOT):
    """Shared pallas_call builder for the ragged kernel family.

    A-panel inputs arrive FLAT — (S*TM, Wc) — in ANY memory space and are
    streamed manually alongside the B windows by ``_chunk_pipeline``
    (NSLOT-deep rolling prefetch; see :func:`ragged_slots` for why the
    automatic 2-deep pipeline is not enough here)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_a = len(a_dtypes)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # step_g, step_first, starts
        grid=(NJ, S),
        in_specs=[any_spec] * (n_a + 1),
        out_specs=any_spec,  # written by _acc_and_emit's per-group DMAs
        scratch_shapes=(
            [pltpu.VMEM((NSLOT, TM, Wc), dt) for dt in a_dtypes]
            + [pltpu.VMEM((NSLOT, Wc, TN), win_dtype)]
            + [pltpu.VMEM((2, TM, TN), acc_dtype)]
            + [pltpu.SemaphoreType.DMA((NSLOT,))] * n_a
            + [pltpu.SemaphoreType.DMA((NSLOT,))]
            + [pltpu.SemaphoreType.DMA((2,))]
        ),
    )
    win_bytes = NSLOT * Wc * TN * np.dtype(win_dtype).itemsize
    a_bytes = sum(
        NSLOT * TM * Wc * np.dtype(dt).itemsize for dt in a_dtypes
    )
    need = win_bytes + a_bytes + 2 * TM * TN * np.dtype(acc_dtype).itemsize
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * TM, n), acc_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(max(need * 2, 16 << 20), 120 << 20))
        ),
        interpret=interpret,
    )


def _pad_n(b, TN):
    import jax.numpy as jnp

    n_orig = b.shape[1]
    if TN is None:
        TN = 256 if n_orig % 256 == 0 else 128
    if n_orig % TN:
        b = jnp.pad(b, ((0, 0), (0, TN - n_orig % TN)))
    return b, TN, n_orig


def spmm_ragged(
    step_g, step_first, starts, panels, b,
    G: int, TM: int, Wc: int,
    TN: int | None = None, compute_dtype=None, precision=None,
    interpret: bool = False,
):
    """C (G*TM, n) = ragged-packed A @ B; B rows >= max(starts) + Wc."""
    import jax
    import jax.numpy as jnp

    compute_dtype = compute_dtype or panels.dtype
    if precision is None:
        precision = (
            jax.lax.Precision.HIGHEST
            if np.dtype(compute_dtype) == np.float32
            else jax.lax.Precision.DEFAULT
        )
    b, TN, n_orig = _pad_n(b, TN)
    n = b.shape[1]
    S = panels.shape[0]
    acc_dtype = (
        jnp.float64 if np.dtype(compute_dtype) == np.float64 else jnp.float32
    )
    NSLOT = ragged_slots(S * (n // TN))
    kern = functools.partial(
        _ragged_kernel,
        G=G, TM=TM, Wc=Wc, TN=TN, NJ=n // TN, S=S, NSLOT=NSLOT,
        precision=precision,
        compute_dtype=compute_dtype, acc_dtype=acc_dtype,
    )
    panels = jnp.asarray(panels).reshape(S * TM, Wc)
    fn = _ragged_call(
        kern, (panels.dtype,), G, TM, Wc, TN, n // TN, S, n, b.dtype,
        acc_dtype, interpret, NSLOT,
    )
    out = fn(
        jnp.asarray(step_g), jnp.asarray(step_first), jnp.asarray(starts),
        panels, b,
    )
    return out[:, :n_orig] if n != n_orig else out


def spmm_ragged_presplit(
    step_g, step_first, starts, ah, al, b,
    G: int, TM: int, Wc: int, TN: int | None = None,
    interpret: bool = False,
):
    """x3 ragged SpMM with pack-time bf16 hi/lo A panels; returns fp32."""
    import jax.numpy as jnp

    b, TN, n_orig = _pad_n(b, TN)
    n = b.shape[1]
    S = ah.shape[0]
    NSLOT = ragged_slots(S * (n // TN))
    kern = functools.partial(
        _ragged_kernel_presplit,
        G=G, TM=TM, Wc=Wc, TN=TN, NJ=n // TN, S=S, NSLOT=NSLOT,
    )
    ah = jnp.asarray(ah).reshape(S * TM, Wc)
    al = jnp.asarray(al).reshape(S * TM, Wc)
    fn = _ragged_call(
        kern, (ah.dtype, al.dtype), G, TM, Wc, TN, n // TN, S, n, b.dtype,
        jnp.float32, interpret, NSLOT,
    )
    out = fn(
        jnp.asarray(step_g), jnp.asarray(step_first), jnp.asarray(starts),
        ah, al, b,
    )
    return out[:, :n_orig] if n != n_orig else out


def spmm_ragged_bf16(
    step_g, step_first, starts, ah, bh,
    G: int, TM: int, Wc: int, TN: int | None = None,
    interpret: bool = False,
):
    """1-pass bf16 ragged SpMM (bh must be bf16); returns fp32."""
    import jax.numpy as jnp

    bh, TN, n_orig = _pad_n(bh, TN)
    n = bh.shape[1]
    S = ah.shape[0]
    NSLOT = ragged_slots(S * (n // TN))
    kern = functools.partial(
        _ragged_kernel_bf16,
        G=G, TM=TM, Wc=Wc, TN=TN, NJ=n // TN, S=S, NSLOT=NSLOT,
    )
    ah = jnp.asarray(ah).reshape(S * TM, Wc)
    fn = _ragged_call(
        kern, (ah.dtype,), G, TM, Wc, TN, n // TN, S, n, bh.dtype,
        jnp.float32, interpret, NSLOT,
    )
    out = fn(
        jnp.asarray(step_g), jnp.asarray(step_first), jnp.asarray(starts),
        ah, bh,
    )
    return out[:, :n_orig] if n != n_orig else out


# ---------------------------------------------------------------------- spill


def spill_impl() -> str:
    """Spill-path formulation: ``segsum`` (take(fill) + sorted segment
    sum, the r3 default), ``clip`` (branch-free take), ``twopass``
    (host-deduped column gather: B rows are fetched once per UNIQUE
    spilled column — a monotone gather — then fanned out from the compact
    temp), or ``pallas`` (fused one-hot-MXU block reduce, no scatter;
    fp32 only).  The default ``auto`` picks ``pallas`` on the TPU backend
    when the spill is dense (>= 1 nnz per output row: the kernel's
    per-output-block dummy pass amortizes; measured winner on the cplaw
    point, 77.0 vs 79.5 ms, ``bench_results/r5_tpu_spill_fused.jsonl``)
    and ``segsum`` otherwise.  Set ``CRP_TPU_SPILL_IMPL`` to override."""
    import os

    impl = os.environ.get("CRP_TPU_SPILL_IMPL", "auto")
    valid = ("auto", "segsum", "clip", "twopass", "pallas")
    if impl not in valid:
        raise ValueError(
            f"CRP_TPU_SPILL_IMPL={impl!r} not in {valid}"
        )
    return impl


def pack_spill(
    spill: tuple[np.ndarray, np.ndarray, np.ndarray] | None,
    nnz_pad: int,
    nrow: int,
    dtype,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad spill COO to a static size; pad rows = ``nrow`` (dropped by the
    out-of-bounds scatter)."""
    rows = np.full(nnz_pad, nrow, dtype=np.int32)
    cols = np.zeros(nnz_pad, dtype=np.int32)
    vals = np.zeros(nnz_pad, dtype=dtype)
    if spill is not None:
        r, c, v = spill
        rows[: len(r)] = r
        cols[: len(r)] = c
        vals[: len(r)] = v.astype(dtype)
    return rows, cols, vals


def pack_spill_twopass(
    spill: tuple[np.ndarray, np.ndarray, np.ndarray] | None,
    nnz_pad: int,
    nrow: int,
    dtype,
    uniq_pad: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """``twopass`` spill pack: (rows, inv, vals, uniq) with columns
    deduplicated on the host — ``uniq[inv] == cols``.  Pad inv/uniq
    entries point at slot/row 0 with zero vals (harmless gather)."""
    rows = np.full(nnz_pad, nrow, dtype=np.int32)
    inv = np.zeros(nnz_pad, dtype=np.int32)
    vals = np.zeros(nnz_pad, dtype=dtype)
    uniq = np.zeros(uniq_pad, dtype=np.int32)
    if spill is not None:
        r, c, v = spill
        u, iv = np.unique(c, return_inverse=True)
        rows[: len(r)] = r
        inv[: len(r)] = iv.astype(np.int32)
        vals[: len(r)] = v.astype(dtype)
        uniq[: len(u)] = u.astype(np.int32)
    return rows, inv, vals, uniq


def pack_spill_blocks(
    spill: tuple[np.ndarray, np.ndarray, np.ndarray] | None,
    ns_pad: int,
    M: int,
    dtype,
    TMo: int = 128,
    Q: int = 128,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host pack for the fused Pallas spill kernel (``spmm_spill_pallas``).

    Spilled nonzeros (rows sorted ascending) are regrouped into steps of
    ``Q`` nnz, each step confined to ONE ``TMo``-row output block; every
    block of the (M, n) output gets at least one (possibly dummy) step so
    the kernel can pass the main kernel's C through.  Returns
    (rel (ns_pad, 1, Q), cols (ns_pad, Q), vals (ns_pad, Q),
    first (ns_pad,), blk (ns_pad,)); pad slots carry rel == TMo (one-hot
    selects nothing) and zero vals.
    """
    assert M % TMo == 0, (M, TMo)
    nblk = M // TMo
    if spill is not None:
        r, c, v = spill
        # only BLOCK order matters (rows are routed by the one-hot):
        # callers sort by (block, column) so the bulk gather walks B
        # near-monotonically within each block's steps
        assert bool(np.all(np.diff(r // TMo) >= 0)), \
            "spill must be sorted by output block"
        z = len(r)
    else:
        r = c = v = None
        z = 0
    counts = (
        np.bincount(r // TMo, minlength=nblk)
        if z
        else np.zeros(nblk, dtype=np.int64)
    )
    steps_per_blk = np.maximum(-(-counts // Q), 1)
    step_base = np.zeros(nblk + 1, dtype=np.int64)
    np.cumsum(steps_per_blk, out=step_base[1:])
    ns = int(step_base[-1])
    assert ns <= ns_pad, (ns, ns_pad)
    rel = np.full((ns_pad, Q), TMo, dtype=np.int32)
    cols = np.zeros((ns_pad, Q), dtype=np.int32)
    vals = np.zeros((ns_pad, Q), dtype=np.float32)
    blk = np.full(ns_pad, nblk - 1, dtype=np.int32)
    blk[:ns] = np.repeat(
        np.arange(nblk, dtype=np.int32), steps_per_blk.astype(np.int64)
    )
    first = np.zeros(ns_pad, dtype=np.int32)
    first[step_base[:-1]] = 1
    if z:
        blk_of = (r // TMo).astype(np.int64)
        starts = np.zeros(nblk + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        k = np.arange(z, dtype=np.int64) - starts[blk_of]
        step_of = step_base[blk_of] + k // Q
        slot = k % Q
        rel[step_of, slot] = (r - blk_of * TMo).astype(np.int32)
        cols[step_of, slot] = c
        vals[step_of, slot] = v.astype(np.float32)
    return rel[:, None, :], cols, vals, first, blk


def _spill_block_kernel(
    first_ref, blk_ref, rel_ref, *rest,
    TMo, Q, TN, mxu_precision, has_c=True,
):
    """One-hot MXU segmented reduce: no scatter anywhere — each step's Q
    contribs land in their rows of the resident (TMo, TN) output block via
    P @ contrib where P[t, q] = (rel[q] == t).  Same-block steps are
    consecutive (host pack), so the block accumulates in VMEM and is
    written once; the first step of each block folds in the main kernel's
    C, making the output the complete result.

    The val * B[col] multiply is FUSED here (vals ride as a (1, Q) block,
    the gathered B rows as a (1, Q, TN) block): materializing the
    premultiplied contrib stream in XLA cost an extra write + read of the
    whole (ns*Q, n) array — at the r5 cplaw point that stream is 3+ GB
    while the spill path was measured at 47 of the 58 ms exec
    (``scripts/cplaw_decomp.py``, take 24 ms + segment-sum 30 ms)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if has_c:
        vals_ref, c_ref, g_ref, o_ref = rest
    else:
        (vals_ref, g_ref, o_ref), c_ref = rest, None
    s = pl.program_id(1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TMo, Q), 0)
    P = (rel_ref[0] == iota).astype(jnp.float32)  # (1, Q) broadcast
    cb = vals_ref[0, 0][:, None] * g_ref[0]       # (Q, TN) fp32, on the VPU
    dims = (((1,), (0,)), ((), ()))
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    if mxu_precision == "x3":
        # bf16 one-hot is exact; contrib rides as an in-kernel hi/lo pair
        # (~1e-5 per element, matching the x3 operating point)
        ph = P.astype(jnp.bfloat16)
        ch = cb.astype(jnp.bfloat16)
        cl = (cb - ch.astype(jnp.float32)).astype(jnp.bfloat16)
        partial = dot(ph, ch) + dot(ph, cl)
    elif mxu_precision == "default":
        partial = dot(P.astype(jnp.bfloat16), cb.astype(jnp.bfloat16))
    else:
        partial = jax.lax.dot_general(
            P, cb, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    first = first_ref[s] == 1

    @pl.when(first)
    def _():
        o_ref[:] = (c_ref[:] + partial) if has_c else partial

    @pl.when(jnp.logical_not(first))
    def _():
        o_ref[:] = o_ref[:] + partial


def spmm_spill_pallas(
    c, rel, cols, vals, first, blk, b,
    TMo: int = 128, Q: int = 128, mxu_precision: str = "highest",
    interpret: bool = False, M: int | None = None,
):
    """C_full = C_main + spill, via the fused one-hot-MXU kernel.

    ``c`` is the main ragged kernel's (M, n) fp32 output (or None for a
    pure gather-reduce, e.g. the "gather" kernel kind — then ``M`` must be
    given); the gather (``take``) stays in XLA — TPU DMA wants block
    transfers, so per-nnz B-row fetches are hoisted into one bulk gather
    whose (ns*Q, n) row stream the kernel multiplies by ``vals`` in VMEM
    and reduces without any scatter (the r3-measured 21 ns/nnz XLA
    scatter is the dominant power-law cost)."""
    import jax
    import jax.numpy as jnp

    has_c = c is not None
    M = c.shape[0] if has_c else int(M)
    b, TN, n_orig = _pad_n(b, None)
    n = b.shape[1]
    if has_c:
        assert c.shape[1] == n_orig, (c.shape, n_orig)
        if n != c.shape[1]:
            c = jnp.pad(c, ((0, 0), (0, n - c.shape[1])))
    ns = rel.shape[0]
    g = jnp.take(b, cols.reshape(-1), axis=0, mode="clip").reshape(ns, Q, n)
    vals_j = jnp.asarray(vals, dtype=jnp.float32).reshape(ns, 1, Q)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .spmm_pallas import assert_tpu_blockable

    # the CPU interpreter does not enforce Mosaic's block-shape rule —
    # guard at trace time (the dd_mxu (1, TM) mu block was rejected only
    # on real silicon)
    assert_tpu_blockable((1, 1, Q), (ns, 1, Q))
    assert_tpu_blockable((TMo, TN), (M, n))
    assert_tpu_blockable((1, Q, TN), (ns, Q, n))

    kern = functools.partial(
        _spill_block_kernel, TMo=TMo, Q=Q, TN=TN,
        mxu_precision=mxu_precision, has_c=has_c,
    )
    c_spec = [
        pl.BlockSpec((TMo, TN), lambda j, s, f_ref, blk_ref: (blk_ref[s], j))
    ] if has_c else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # first, blk
        grid=(n // TN, ns),
        in_specs=[
            pl.BlockSpec((1, 1, Q), lambda j, s, *_: (s, 0, 0)),
            pl.BlockSpec((1, 1, Q), lambda j, s, *_: (s, 0, 0)),
        ]
        + c_spec
        + [pl.BlockSpec((1, Q, TN), lambda j, s, *_: (s, 0, j))],
        out_specs=pl.BlockSpec(
            (TMo, TN), lambda j, s, f_ref, blk_ref: (blk_ref[s], j)
        ),
    )
    operands = [
        jnp.asarray(first), jnp.asarray(blk), jnp.asarray(rel), vals_j,
    ]
    if has_c:
        operands.append(c.astype(jnp.float32))
    operands.append(g)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :n_orig] if n != n_orig else out


def gather_step_layout(
    blk_counts_list: list[np.ndarray], Q: int
) -> np.ndarray:
    """Shared step layout for the "gather" kernel across shards: per block,
    steps = max over shards of ceil(count / Q), min 1 — every shard packs
    into the same (block -> step range) table so one program serves all
    shards and chunk boundaries stay block-aligned everywhere."""
    steps = np.maximum.reduce(
        [-(-c // Q) for c in blk_counts_list]
    )
    steps = np.maximum(steps, 1)
    step_base = np.zeros(len(steps) + 1, dtype=np.int64)
    np.cumsum(steps, out=step_base[1:])
    return step_base


def pack_gather_blocks(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    val: np.ndarray,
    step_base: np.ndarray,
    M: int,
    TMo: int = 128,
    Q: int = 128,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pack a whole CSR shard into one-hot gather steps (the "gather"
    kernel: every nnz takes the bulk-gather + one-hot-MXU reduce path).
    Entries are ordered by (output block, column) — rows are routed by the
    one-hot, so column order makes the B gather near-monotone.  Layout
    (``step_base``) is shared across shards (:func:`gather_step_layout`).
    Returns (rel (ns, 1, Q), cols (ns, Q), vals (ns, Q), first (ns,),
    blk (ns,))."""
    nblk = M // TMo
    ns = int(step_base[-1])
    nrow = len(rowptr) - 1
    counts = np.diff(rowptr)
    base = int(rowptr[0]) if nrow >= 0 and len(rowptr) else 0
    nnz = int(rowptr[-1]) - base if len(rowptr) > 1 else 0
    r = np.repeat(np.arange(nrow, dtype=np.int64), counts)
    # colidx/val are indexed by absolute rowptr values (shard convention
    # shared with pack_ragged_window)
    c = np.asarray(colidx)[base : base + nnz]
    v = np.asarray(val, dtype=np.float32)[base : base + nnz]
    order = np.lexsort((c, r // TMo))
    r, c, v = r[order], c[order], v[order]
    rel = np.full((ns, Q), TMo, dtype=np.int32)
    cols = np.zeros((ns, Q), dtype=np.int32)
    vals = np.zeros((ns, Q), dtype=np.float32)
    blk = np.repeat(
        np.arange(nblk, dtype=np.int32), np.diff(step_base).astype(np.int64)
    )
    first = np.zeros(ns, dtype=np.int32)
    first[step_base[:-1]] = 1
    z = len(r)
    if z:
        blk_of = r // TMo
        bcnt = np.bincount(blk_of, minlength=nblk)
        starts = np.zeros(nblk + 1, dtype=np.int64)
        np.cumsum(bcnt, out=starts[1:])
        k = np.arange(z, dtype=np.int64) - starts[blk_of]
        step_of = step_base[blk_of] + k // Q
        slot = k % Q
        rel[step_of, slot] = (r - blk_of * TMo).astype(np.int32)
        cols[step_of, slot] = c
        vals[step_of, slot] = v
    return rel[:, None, :], cols, vals, first, blk


def spmm_gather_chunked(
    rel, cols, vals, first, blk, b,
    *, step_base: np.ndarray, TMo: int = 128, Q: int = 128,
    mxu_precision: str = "highest", interpret: bool = False,
):
    """(M, n) = gather-reduce of all packed nnz; chunks the contrib stream
    over block-aligned step ranges so HBM peak stays under
    ``CRP_TPU_GATHER_GB`` (default 4) regardless of nnz."""
    import os

    import jax.numpy as jnp

    nblk = len(step_base) - 1
    tn = 256 if b.shape[1] % 256 == 0 else 128
    n_pad = -(-b.shape[1] // tn) * tn
    budget = float(os.environ.get("CRP_TPU_GATHER_GB", 4)) * 2**30
    steps_budget = max(int(budget // (Q * n_pad * 4)), 1)
    outs = []
    b0 = 0
    while b0 < nblk:
        b1 = b0 + 1
        while (
            b1 < nblk
            and step_base[b1 + 1] - step_base[b0] <= steps_budget
        ):
            b1 += 1
        s0, s1 = int(step_base[b0]), int(step_base[b1])
        outs.append(spmm_spill_pallas(
            None, rel[s0:s1], cols[s0:s1], vals[s0:s1], first[s0:s1],
            blk[s0:s1] - b0, b, TMo=TMo, Q=Q,
            mxu_precision=mxu_precision, interpret=interpret,
            M=(b1 - b0) * TMo,
        ))
        b0 = b1
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def spmm_spill_twopass(rows, inv, vals, uniq, b, nrow: int):
    """Compact-gather spill: B rows fetched once per unique spilled column
    (monotone gather), fanned out from the compact temp, then the same
    sorted segment-sum.  Wins when unique columns << spill nnz (the r3
    cplaw spill touches 462k unique columns for 2.04M nnz)."""
    import jax
    import jax.numpy as jnp

    n = b.shape[1]
    if rows.shape[0] == 0:
        return jnp.zeros((nrow, n), dtype=b.dtype)
    compact = jnp.take(b, uniq, axis=0, mode="clip")
    contrib = vals[:, None].astype(b.dtype) * jnp.take(
        compact, inv, axis=0, mode="clip"
    )
    return jax.ops.segment_sum(
        contrib, rows, num_segments=nrow + 1, indices_are_sorted=True
    )[:nrow]


def spmm_spill_chunked(rows, cols, vals, b, nrow: int,
                       chunk: int | None = None, take_mode: str = "fill"):
    """Memory-bounded VPU path for spilled nonzeros (rows SORTED ascending,
    pad rows == nrow at the end).

    Fast path (fits the gather budget): one gather + sorted segment-sum —
    the same ~20 ns/nnz XLA scatter the segsum kernel achieves (the r3
    on-chip profile measured the scan+unsorted-scatter variant at ~55
    ns/nnz, slower per nnz than pure segsum).  Otherwise scans nnz in
    fixed chunks with a sorted scatter-add into the carried C, keeping
    peak memory O(chunk * n).
    """
    import jax
    import jax.numpy as jnp

    n = b.shape[1]
    nnz = rows.shape[0]
    init = jnp.zeros((nrow, n), dtype=b.dtype)
    if nnz == 0:
        return init
    if chunk is None:
        budget = int(
            float(__import__("os").environ.get("CRP_TPU_SPILL_GB", 4)) * 2**30
        )
        chunk = max(budget // (n * np.dtype(b.dtype).itemsize), 1 << 14)
    if nnz <= chunk:
        if take_mode == "clip":  # branch-free gather (pad vals are zero)
            g = jnp.take(b, cols, axis=0, mode="clip")
        else:
            g = jnp.take(b, cols, axis=0, fill_value=0)
        contrib = vals[:, None].astype(b.dtype) * g
        # pad rows == nrow land in segment nrow and are sliced away
        return jax.ops.segment_sum(
            contrib, rows, num_segments=nrow + 1, indices_are_sorted=True
        )[:nrow]

    Q = chunk
    nchunks = -(-nnz // Q)
    pad = nchunks * Q - nnz
    if pad:
        rows = jnp.concatenate([rows, jnp.full(pad, nrow, rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros(pad, cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros(pad, vals.dtype)])

    def body(c, sl):
        r, cl, v = sl
        if take_mode == "clip":
            g_ = jnp.take(b, cl, axis=0, mode="clip")
        else:
            g_ = jnp.take(b, cl, axis=0, fill_value=0)
        contrib = v[:, None].astype(b.dtype) * g_
        return c.at[r].add(
            contrib, mode="drop", indices_are_sorted=True
        ), None

    c, _ = jax.lax.scan(
        body, init,
        (rows.reshape(nchunks, Q), cols.reshape(nchunks, Q),
         vals.reshape(nchunks, Q)),
    )
    return c
