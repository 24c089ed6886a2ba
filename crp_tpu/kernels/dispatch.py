"""Local-kernel selection shared by the engines.

The engines are agnostic to the local SpMM implementation (the reference has
the same seam: MKL vs cuSPARSE, ``src/rowpara_spmm.c:386-413``).  A kernel
kind packs per-shard compact CSR into stacked device arrays at init and
returns a per-shard compute closure used inside shard_map.

Kinds:
  * "segsum" — gather + sorted segment-sum (default; exact everywhere)
  * "ell"    — ELL slot scan (bounded-nnz/row matrices; O(m*n) memory)
  * "pallas" — MXU windowed-ELL Pallas kernel (TPU)
  * "dd"     — double-float (two-fp32) ELL kernel: fp64-class accuracy on
               TPU hardware; B/C travel packed as (rows, 2n) fp32
"""

from __future__ import annotations

import logging
import os
from typing import Callable

import numpy as np

from .spmm_jnp import DeviceCSR, pack_device_csr, spmm_segment_sum
from .spmm_ell import pack_ell, spmm_ell

logger = logging.getLogger("crp_tpu")


def resolve_auto_kernel(
    dtype,
    nshards: int,
    *,
    overlap: bool = False,
    allow_halo: bool = True,
    allow_dd: bool = True,
) -> str:
    """Backend-, accuracy-, and topology-aware choice for ``kernel="auto"``.

    The reference's local-SpMM seam auto-selects MKL on the host and
    cuSPARSE under ``USE_CUDA`` (``src/rowpara_spmm.c:386-413``,
    ``deprecated/src/crpspmm.c:647-676``); the TPU analog picks the fastest
    kernel the backend supports, relying on the engines' existing
    ``UnsupportedSparsity`` fallback chain (halo -> pallas -> segsum):

      * non-TPU backends -> ``"segsum"`` (portable, exact in fp64)
      * TPU + float64 data -> ``"dd"`` (double-float: fp64-class accuracy
        on fp32 hardware); ``"segsum"`` where dd is unsupported (overlap
        schedule, engines that don't pack hi/lo B)
      * TPU, multi-shard 1D/2D engines -> ``"pallas_halo"`` (fused
        exchange + MXU compute)
      * TPU otherwise -> ``"pallas"`` (windowed MXU kernel)
    """
    import jax

    if jax.default_backend() != "tpu":
        return "segsum"
    if np.dtype(dtype) == np.float64:
        return "dd" if (allow_dd and not overlap) else "segsum"
    if allow_halo and not overlap and nshards > 1:
        return "pallas_halo"
    return "pallas"


def sparsity_fallback_chain(kind: str, dtype, is_dd: bool = False) -> list:
    """Kernel kinds to try, in order, after ``kind`` raised
    ``UnsupportedSparsity`` at pack time.

    The reference's local-SpMM seam never fails by sparsity structure (MKL
    and cuSPARSE take any CSR, ``src/rowpara_spmm.c:398-407``); the TPU
    kernels trade that generality for MXU shape, so the engines must land
    somewhere that always works.  Structure-aware order:

      * dd-class requests -> ``"dd"`` only (the VPU double-float kernels;
        accuracy contract over speed — never silently drop to fp32)
      * fp32 on a TPU backend -> ``"gather"`` first (one-hot-MXU
        block-reduce: serves the scrambled/pure power-law class the ragged
        cover refuses at ~MXU rates instead of segsum's ~21 ns/nnz XLA
        scatter), then ``"segsum"``
      * everything else -> ``"segsum"`` (exact, runs everywhere)

    ``CRP_TPU_FALLBACK`` (comma-separated kinds) overrides the chain — used
    by CPU-mesh tests to exercise the TPU ordering, and as an operator
    escape hatch.  dd-class requests IGNORE the override: a process-wide
    env set for an fp32 sweep must not reroute fp64-class pack failures
    onto fp32 kernels and silently break the accuracy contract (ADVICE r4).
    """
    import jax

    if is_dd:
        return ["dd"]
    override = os.environ.get("CRP_TPU_FALLBACK")
    if override:
        return [k.strip() for k in override.split(",") if k.strip()]
    chain = []
    if (
        kind != "gather"
        and np.dtype(dtype) == np.float32
        and jax.default_backend() == "tpu"
    ):
        chain.append("gather")
    chain.append("segsum")
    return chain


def pack_with_fallback(
    shards: list,
    max_m: int,
    dtype,
    kind: str,
    *,
    mxu_precision: str = "highest",
    is_dd: bool = False,
) -> tuple:
    """``pack_local_kernel`` plus the engines' shared sparsity-fallback walk.

    Returns ``(arrays, local_fn, resolved_kind)``.  On
    ``UnsupportedSparsity`` each kind from :func:`sparsity_fallback_chain`
    is tried in order; a ``dd_mxu`` failure sets ``dd_skip_mxu`` so the dd
    retry does not repeat the identical multi-second MXU cover just to fail
    again.  Raises the last ``UnsupportedSparsity`` only if every chain
    entry refuses — segsum accepts any CSR, so this is reachable only on
    the dd chain, where shards past ``CRP_TPU_DD_SEGSUM_MAX_NNZ`` refuse
    rather than OOM the compiler (the fp64-class contract admits no fp32
    fallback).
    """
    from .spmm_pallas import UnsupportedSparsity

    try:
        arrays, local_fn = pack_local_kernel(
            shards, max_m, dtype, kind, mxu_precision=mxu_precision
        )
        return arrays, local_fn, kind
    except UnsupportedSparsity as e:
        err = e
    skip_mxu = kind == "dd_mxu"
    for fb in sparsity_fallback_chain(kind, dtype, is_dd=is_dd):
        logger.warning(
            "kernel=%r rejected this sparsity (%s); falling back to %s",
            kind, err, fb,
        )
        try:
            arrays, local_fn = pack_local_kernel(
                shards, max_m, dtype, fb,
                mxu_precision=mxu_precision, dd_skip_mxu=skip_mxu,
            )
            return arrays, local_fn, fb
        except UnsupportedSparsity as e2:
            err = e2
    raise err


def pack_local_kernel(
    shards: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_m: int,
    dtype,
    kind: str = "segsum",
    mxu_precision: str = "highest",
    dd_skip_mxu: bool = False,
) -> tuple[tuple[np.ndarray, ...], Callable]:
    """Pack shards [(rowptr, compact_colidx, val), ...] for kernel ``kind``.

    Returns (stacked host arrays, local_fn) where ``local_fn(arrays, rB)``
    computes the shard's C block of shape (max_m, n); each element of
    ``arrays`` has leading shard axis already stripped.

    ``dd_skip_mxu`` makes ``kind="dd"`` go straight to the VPU double-float
    pack — set by engines retrying after an explicit ``dd_mxu`` pack raised
    ``UnsupportedSparsity``, so the multi-second cover + densify + slicing
    is not repeated just to fail identically.
    """
    if kind == "segsum":
        nnz_pad = max(max(int(r[-1] - r[0]) for r, _, _ in shards), 1)
        rows, cols, vals = [], [], []
        for rowptr, cc, v in shards:
            r, c, vv = pack_device_csr(
                rowptr, cc, v.astype(dtype), nnz_pad, nrow=max_m
            )
            rows.append(r); cols.append(c); vals.append(vv)
        arrays = (np.stack(rows), np.stack(cols), np.stack(vals))

        def local_fn(arrs, rB):
            return spmm_segment_sum(DeviceCSR(arrs[0], arrs[1], arrs[2], max_m), rB)

        return arrays, local_fn

    if kind == "ell":
        L = max(
            max(
                (int(np.diff(r).max()) if len(r) > 1 else 0)
                for r, _, _ in shards
            ),
            1,
        )
        cols, vals = [], []
        for rowptr, cc, v in shards:
            c, vv = pack_ell(rowptr, cc, v.astype(dtype), max_m, L=L)
            cols.append(c); vals.append(vv)
        arrays = (np.stack(cols), np.stack(vals))

        def local_fn(arrs, rB):
            return spmm_ell(arrs[0], arrs[1], rB)

        return arrays, local_fn

    if kind == "pallas":
        return _pack_pallas(shards, max_m, dtype, mxu_precision)

    if kind == "ragged":
        return _pack_ragged(shards, max_m, dtype, mxu_precision)

    if kind == "dd_mxu":
        return _pack_dd_mxu(shards, max_m)

    if kind == "gather":
        return _pack_gather(shards, max_m, dtype, mxu_precision)

    if kind == "dd":
        import jax

        from .spmm_pallas import UnsupportedSparsity

        import os

        if (
            jax.default_backend() == "tpu"
            and not dd_skip_mxu
            and os.environ.get("CRP_TPU_DD_NO_MXU") != "1"
        ):
            # fp64-class on the MXU (Ozaki exact slicing) when the ragged
            # cover takes every nnz under the panel cap; VPU dd otherwise
            try:
                return _pack_dd_mxu(shards, max_m)
            except UnsupportedSparsity:
                pass
        from .spmm_dd import (
            pack_coo_dd, pack_ell_dd, spmm_ell_dd, spmm_segsum_dd,
        )

        L = max(
            max(
                (int(np.diff(r).max()) if len(r) > 1 else 0)
                for r, _, _ in shards
            ),
            1,
        )
        if L <= 128:
            # bounded degree: per-row sequential accumulation (L unrolled
            # VPU passes) — the segmented scan's log2(nnz) full-width
            # levels blow compile memory at millions of nonzeros
            cols, vhs, vls = [], [], []
            for rowptr, cc, v in shards:
                c, vh, vl = pack_ell_dd(
                    rowptr, cc, np.asarray(v, np.float64), max_m, L=L
                )
                cols.append(c); vhs.append(vh); vls.append(vl)
            arrays = (np.stack(cols), np.stack(vhs), np.stack(vls))

            def local_fn(arrs, rB_packed):
                return spmm_ell_dd(arrs[0], arrs[1], arrs[2], rB_packed)

            return arrays, local_fn

        nnz_pad = max(max(int(r[-1] - r[0]) for r, _, _ in shards), 0) + 1
        # the segmented-scan kernel's log2(nnz) unrolled full-width levels
        # blow XLA compile-side memory at millions of nonzeros (the same
        # super-linear EFT-chain behavior the module docstring pins) — the
        # r5b cplaw attempt (10.8M nnz) died on chip.  Refuse cleanly with
        # the shard size in the message instead of OOMing the compiler;
        # CRP_TPU_DD_SEGSUM_MAX_NNZ raises the cap for bigger-HBM parts.
        cap = int(os.environ.get("CRP_TPU_DD_SEGSUM_MAX_NNZ", 4 << 20))
        if nnz_pad > cap:
            raise UnsupportedSparsity(
                f"dd segmented scan infeasible at {nnz_pad - 1} nnz per "
                f"shard (> CRP_TPU_DD_SEGSUM_MAX_NNZ={cap}): the unrolled "
                f"scan's full-width levels exceed compile/HBM budgets; "
                f"shard the matrix further or drop to the x3 operating "
                f"point (~1e-5 rel err)"
            )
        packs = [
            pack_coo_dd(rowptr, cc, np.asarray(v, np.float64), nnz_pad, max_m)
            for rowptr, cc, v in shards
        ]
        arrays = tuple(
            np.stack([p[i] for p in packs]) for i in range(5)
        )  # row_ids, cols, val_hi, val_lo, row_last

        def local_fn(arrs, rB_packed):
            return spmm_segsum_dd(*arrs, rB_packed)

        return arrays, local_fn

    raise ValueError(f"unknown local SpMM kernel kind {kind!r}")


def _uniform_cost_estimate(shards, max_m, TM=256):
    """Predicted shared-W uniform pack, without densifying: (W, G, ok).

    Mirrors the window derivation of ``pack_window_dense`` (per-row column
    extrema -> per-group tile ranges) in O(nrow) per shard.
    """
    from .spmm_pallas import choose_chunks, TK

    W_raw = 0
    G = -(-max_m // TM)
    for rowptr, cc, _ in shards:
        nrow = len(rowptr) - 1
        if nrow == 0 or int(rowptr[-1]) == int(rowptr[0]):
            continue
        rowptr = np.asarray(rowptr, dtype=np.int64)
        counts = np.diff(rowptr)
        nonempty = counts > 0
        row_min = np.full(nrow, np.iinfo(np.int64).max, dtype=np.int64)
        row_max = np.full(nrow, -1, dtype=np.int64)
        row_min[nonempty] = cc[rowptr[:-1][nonempty]]
        row_max[nonempty] = cc[rowptr[1:][nonempty] - 1]
        Gs = -(-nrow // TM)
        starts = np.arange(Gs) * TM
        min_t = np.minimum.reduceat(row_min, starts) // TK
        max_t = np.maximum.reduceat(row_max, starts) // TK
        empty = max_t < 0
        min_t = np.where(empty, 0, np.minimum(min_t, max_t))
        max_t = np.where(empty, 0, max_t)
        W_raw = max(W_raw, int((max_t - min_t + 1).max()) * TK)
        G = max(G, Gs)
    W, _, _ = choose_chunks(max(W_raw, TK))
    return W, G, W_raw <= 16384


def _pack_pallas(shards, max_m, dtype, mxu_precision="highest"):
    """Stack per-shard WindowDense packs to common (G, T) dims.

    Falls back to the ragged gathered-window family (``_pack_ragged``) when
    the uniform window is infeasible (power-law / unstructured sparsity) or
    wastes >3x the panel memory of a ragged cover (variable bandwidth).

    The returned local_fn carries ``min_b_rows``: engines must size the
    receive buffer rB to at least this many rows so every window DMA is
    in-bounds.
    """
    import jax

    from .spmm_pallas import pack_window_dense, spmm_window_pallas, WindowDense

    from .spmm_pallas import choose_chunks, UnsupportedSparsity

    W_est, G_est, uniform_ok = _uniform_cost_estimate(shards, max_m)
    if not uniform_ok:
        return _pack_ragged(shards, max_m, dtype, mxu_precision)
    itemsize = np.dtype(dtype).itemsize
    bytes_uniform = len(shards) * G_est * 256 * W_est * itemsize
    if W_est > 4096 or bytes_uniform > (1 << 30):
        # wide windows: compare against a ragged cover before densifying —
        # priced at the geometry _pack_ragged would actually use, so this
        # gate and the projection model's mirror stay consistent
        from .spmm_ragged import estimate_ragged, resolve_ragged_geometry

        interpret_ = jax.default_backend() != "tpu"
        big = max(
            (s for s in shards if len(s[0]) > 1),
            key=lambda s: int(s[0][-1]) - int(s[0][0]),
            default=None,
        )
        if big is None:
            # every shard empty (all rowptr len <= 1): nothing to price a
            # ragged cover on — the uniform pack handles the degenerate
            # shards itself (mirrors _pack_ragged's default=None guard)
            return _pack_pallas_uniform(shards, max_m, dtype, mxu_precision)
        # one resolve on the largest shard — the same choice
        # _pack_ragged itself will make
        TMr, Wcr = resolve_ragged_geometry(
            big[0], big[1], mxu_precision, interpret=interpret_
        )
        bytes_ragged = 0
        for rowptr, cc, _ in shards:
            if len(rowptr) < 2 or int(rowptr[-1]) == int(rowptr[0]):
                continue
            S, _, _ = estimate_ragged(rowptr, cc, TMr, Wcr)
            bytes_ragged += S * TMr * Wcr * itemsize
        if bytes_uniform > 3 * max(bytes_ragged, 1):
            try:
                return _pack_ragged(
                    shards, max_m, dtype, mxu_precision,
                    geometry=(TMr, Wcr),  # skip a second resolve sweep
                )
            except UnsupportedSparsity:
                pass  # ragged not worthwhile either; try uniform below

    try:
        return _pack_pallas_uniform(shards, max_m, dtype, mxu_precision)
    except UnsupportedSparsity:
        return _pack_ragged(shards, max_m, dtype, mxu_precision)


def _sg_geometry(ws_shard, W, TM, win_itemsize, interpret, G):
    """Shared super-group planning math for the generic fp32 path and the
    direct-bf16 fast path — one definition so the two can never desync
    (the fast path's contract is bit-identical kernel configs).

    Returns (SG, Wsg, bases, Wc_sg, sgc, G_sg) or None when no plan.
    """
    from .spmm_pallas import plan_supergroups, sg_vmem_limit

    # off-TPU the pallas interpreter's per-step cost scales with the
    # scratch size — keep windows small there (correctness-only path)
    sg_plan = plan_supergroups(
        ws_shard, W, 256, win_itemsize,
        vmem_budget=(4 << 20) if interpret else None,
    )
    if sg_plan is None:
        return None
    SG, Wsg, bases = sg_plan
    # under super-grouping B slices come from the resident super-window,
    # so the whole window as ONE k-chunk costs only A-pipeline VMEM and
    # removes the per-chunk accumulate steps: measured 0.0138 -> 0.0129 s
    # at the headline shape (bench_results/r2_tpu_sg_wc.jsonl)
    Wc_sg = (
        W if sg_vmem_limit(Wsg, W, TM, 256, win_itemsize) <= (112 << 20)
        else None
    )
    sgc = -(-G // SG)
    G_sg = sgc * SG
    if len(bases) < sgc:  # shared G exceeds the shard's own group count
        bases = np.concatenate(
            [bases, np.full(sgc - len(bases), bases[-1], np.int32)]
        )
    return SG, Wsg, bases, Wc_sg, sgc, G_sg


def _pack_uniform_single_bf16(shard, max_m, mxu_precision):
    """Single-shard bf16 operating points (``default`` / ``x3``): analyze
    window extents, plan super-groups, then densify STRAIGHT to bf16
    (hi/lo pair for x3) at the final padded group count — no fp32 tiles,
    no stack/grow copies.  Every fresh output page is written exactly
    once, which is what engine init time is made of on this VM (~100 MB/s
    first-touch fault path; the r2 records carried 85-400 s packs from
    the extra fp32 pass + single-threaded numpy copies).

    Returns (arrays, local_fn) or None when infeasible / native missing
    (the caller then runs the generic fp32 path with identical results).
    """
    import jax

    from .. import native
    from .spmm_pallas import (
        TK, choose_chunks, spmm_window_pallas_sg_bf16,
        spmm_window_pallas_sg_presplit, window_extents,
    )

    rowptr, cc, v = shard
    if len(rowptr) < 2 or int(rowptr[-1]) - int(rowptr[0]) == 0:
        return None
    if native._load() is None:
        return None
    TM, max_window = 256, 16384
    nrow = len(rowptr) - 1
    rowptr64 = np.ascontiguousarray(rowptr, dtype=np.int64)
    min_t, W0 = window_extents(rowptr64, cc, TM)
    if W0 > max_window:
        return None  # generic path raises UnsupportedSparsity
    W, _, _ = choose_chunks(W0)
    G0 = -(-nrow // TM)
    G = max(G0, -(-max_m // TM))
    if G * W * TM * 4 > (8 << 30):
        return None  # keep the generic fp32 cap check authoritative
    split = mxu_precision == "x3"
    win_itemsize = 4 if split else 2
    ws_shard = (min_t * TK).astype(np.int32)
    interpret = jax.default_backend() != "tpu"
    sg_geo = _sg_geometry(ws_shard, W, TM, win_itemsize, interpret, G)
    if sg_geo is None:
        return None  # the non-sg kernels take fp32 tiles
    SG, Wsg, bases, Wc_sg, sgc, G_sg = sg_geo
    from . import device_pack

    ah0 = al0 = None
    if device_pack.enabled():
        # on-device densify: upload O(nnz) indices+values instead of the
        # multi-GB panels; its monotone-flat check subsumes the native
        # path's sortedness cross-check below
        dev = device_pack.uniform_fill_bf16(
            rowptr64, cc, v, nrow, TM, W, G_sg, ws_shard, split,
        )
        if dev is not None:
            ws_full, ah0, al0 = dev
    if ah0 is None:
        got = native.pack_window_flat_bf16(
            nrow, rowptr64, cc, np.asarray(v, np.float32),
            TM, TK, max_window, G_sg, W, split,
        )
        if got is None:
            return None
        ws_full, ah0, al0, w0n = got
        if w0n != W0 or not np.array_equal(ws_full[:G0], ws_shard):
            # the numpy extents assume per-row-sorted columns; the native
            # scan reads every nnz.  A disagreement (user-built CSR with
            # unsorted rows) would leave `bases` (planned from the numpy
            # ws) mutually inconsistent with the shipped ws — fall back to
            # the generic path, which derives both from one scan.
            return None
    if G_sg > G0:  # pad-group window starts stay monotone and in-range
        ws_full[G0:] = ws_full[G0 - 1]
    ws, ah = ws_full[None], ah0[None]
    al = al0[None] if split else None
    min_b_rows = max(int(ws.max()) + W, int(bases.max()) + Wsg)

    if split:
        def local_fn(arrs, rB):
            ws_i, ah_i, al_i, bases_i = arrs
            c = spmm_window_pallas_sg_presplit(
                ws_i, bases_i, ah_i, al_i, rB, SG, Wsg, W, TM,
                Wc=Wc_sg, interpret=interpret,
            )
            return c.astype(rB.dtype)  # engines trim at unshard time

        local_fn.min_b_rows = min_b_rows
        local_fn.roofline = dict(
            G=G_sg, TM=TM, W=W, a_bytes=ah.nbytes + al.nbytes,
            b_rows_read=sgc * Wsg, c_rows=G_sg * TM, b_itemsize=4,
            passes=3,
        )
        return (ws, ah, al, bases[None]), local_fn

    import jax.numpy as jnp

    def local_fn(arrs, rB):
        ws_i, ah_i, bases_i = arrs
        c = spmm_window_pallas_sg_bf16(
            ws_i, bases_i, ah_i, rB.astype(jnp.bfloat16),
            SG, Wsg, W, TM, Wc=Wc_sg, interpret=interpret,
        )
        return c.astype(rB.dtype)

    local_fn.min_b_rows = min_b_rows
    local_fn.roofline = dict(
        G=G_sg, TM=TM, W=W, a_bytes=ah.nbytes,
        b_rows_read=sgc * Wsg, c_rows=G_sg * TM, b_itemsize=2,
        passes=1,
    )
    return (ws, ah, bases[None]), local_fn


def _pack_uniform_single_f32_device(shard, max_m):
    """Single-shard fp32 HIGHEST operating point, panels densified on
    device (same geometry math as :func:`_pack_uniform_single_bf16`;
    ``device_pack.uniform_fill`` mode "f32" skips the bf16 split).  The
    host fp32 pack + upload it replaces dominated the HIGHEST row's init
    (344 s at the pwtk headline shape, ``r3_tpu_matrix.jsonl``)."""
    import jax

    from . import device_pack
    from .spmm_pallas import (
        TK, WindowDense, choose_chunks, spmm_window_pallas_sg,
        window_extents,
    )

    if not device_pack.enabled():
        return None
    rowptr, cc, v = shard
    if len(rowptr) < 2 or int(rowptr[-1]) - int(rowptr[0]) == 0:
        return None
    TM, max_window = 256, 16384
    nrow = len(rowptr) - 1
    rowptr64 = np.ascontiguousarray(rowptr, dtype=np.int64)
    min_t, W0 = window_extents(rowptr64, cc, TM)
    if W0 > max_window:
        return None  # generic path raises UnsupportedSparsity
    W, _, _ = choose_chunks(W0)
    G0 = -(-nrow // TM)
    G = max(G0, -(-max_m // TM))
    if G * W * TM * 4 > (8 << 30):
        return None  # keep the generic fp32 cap check authoritative
    ws_shard = (min_t * TK).astype(np.int32)
    interpret = jax.default_backend() != "tpu"
    sg_geo = _sg_geometry(ws_shard, W, TM, 4, interpret, G)
    if sg_geo is None:
        return None
    SG, Wsg, bases, Wc_sg, sgc, G_sg = sg_geo
    dev = device_pack.uniform_fill(
        rowptr64, cc, v, nrow, TM, W, G_sg, ws_shard, "f32",
    )
    if dev is None:
        return None
    ws_full, tiles0, _ = dev
    if G_sg > G0:
        ws_full[G0:] = ws_full[G0 - 1]
    ws, tiles = ws_full[None], tiles0[None]
    min_b_rows = max(int(ws.max()) + W, int(bases.max()) + Wsg)

    def local_fn(arrs, rB):
        ws_i, tiles_i, bases_i = arrs
        packed = WindowDense(
            nrow=max_m, ncol=rB.shape[0], TM=TM, G=G_sg, W=W,
            ws=ws_i, tiles=tiles_i,
        )
        c = spmm_window_pallas_sg(
            packed, rB, SG, Wsg, bases_i, Wc=Wc_sg,
            precision=None, interpret=interpret,
        )
        return c.astype(rB.dtype)

    local_fn.min_b_rows = min_b_rows
    local_fn.roofline = dict(
        G=G_sg, TM=TM, W=W, a_bytes=tiles.nbytes,
        b_rows_read=sgc * Wsg, c_rows=G_sg * TM, b_itemsize=4,
        passes=6,
    )
    return (ws, tiles, bases[None]), local_fn


def _pack_pallas_uniform(shards, max_m, dtype, mxu_precision="highest"):
    import jax

    n_passes = {"x3": 3, "highest": 6, "default": 1}.get(mxu_precision, 1)

    if (
        len(shards) == 1
        and np.dtype(dtype) == np.float32
        and mxu_precision in ("default", "x3")
    ):
        fast = _pack_uniform_single_bf16(shards[0], max_m, mxu_precision)
        if fast is not None:
            return fast
    if (
        len(shards) == 1
        and np.dtype(dtype) == np.float32
        and mxu_precision not in ("default", "x3")
    ):
        fast = _pack_uniform_single_f32_device(shards[0], max_m)
        if fast is not None:
            return fast

    from .spmm_pallas import pack_window_dense, spmm_window_pallas, WindowDense

    from .spmm_pallas import choose_chunks, UnsupportedSparsity

    packs = []
    for rowptr, cc, v in shards:
        if int(rowptr[-1]) - int(rowptr[0]) == 0:
            packs.append(None)  # empty shard -> all-zero panel below
            continue
        ncol = int(cc.max()) + 1 if len(cc) else 1
        packs.append(
            pack_window_dense(rowptr, cc, v.astype(dtype), ncol, dtype=dtype)
        )
    real = [p for p in packs if p is not None]
    if not real:
        raise UnsupportedSparsity("all shards empty")

    TM = real[0].TM
    G = max(max(p.G for p in real), -(-max_m // TM))
    # shared panel width must itself be chunk-exact for the k-loop
    W, _, _ = choose_chunks(max(p.W for p in real))
    ws = np.zeros((len(packs), G), dtype=np.int32)
    for i, p in enumerate(packs):
        if p is not None:
            ws[i, : p.G] = p.ws
    if len(packs) == 1 and packs[0].G == G and packs[0].W == W:
        # single shard at final dims (every on-chip p=1 run): alias the
        # pack's panels instead of re-copying GBs through the ~70 MB/s
        # single-threaded host memcpy this VM measures
        tiles = packs[0].tiles[None]
    else:
        tiles = np.zeros((len(packs), G, TM, W), dtype=dtype)
        for i, p in enumerate(packs):
            if p is not None:
                tiles[i, : p.G, :, : p.W] = p.tiles
    min_b_rows = int(ws.max()) + W
    interpret = jax.default_backend() != "tpu"
    if mxu_precision == "x3" and np.dtype(dtype) == np.float32:
        precision = "x3"
    elif mxu_precision == "default":
        import jax as _jax

        precision = _jax.lax.Precision.DEFAULT
    else:
        precision = None  # kernel default: HIGHEST for fp32

    # single-shard packs with monotone windows use the super-grouped
    # variant: one B super-window DMA feeds SG groups (B traffic / ~SG)
    sg_geo = None
    # the bf16 1-pass kernel DMAs a single 2-byte window; the others hold
    # the window at the data itemsize (fp32) or as a bf16 hi/lo PAIR —
    # budget and Wc feasibility must use the actual per-slot bytes
    is_bf16_1pass = (
        mxu_precision == "default" and np.dtype(dtype) == np.float32
    )
    win_itemsize = 2 if is_bf16_1pass else np.dtype(dtype).itemsize
    if len(packs) == 1 and packs[0] is not None:
        sg_geo = _sg_geometry(
            ws[0, : packs[0].G], W, TM, win_itemsize, interpret, G
        )
    if sg_geo is not None:
        from .spmm_pallas import spmm_window_pallas_sg

        SG, Wsg, bases, Wc_sg, sgc, G_sg = sg_geo
        # pad-group window starts must stay monotone and in-range (the
        # stacked ws pads with zeros past the shard's real group count)
        ws[0, packs[0].G :] = ws[0, packs[0].G - 1]
        if G_sg > G:
            from .. import native

            grown = np.zeros((tiles.shape[0], G_sg, TM, W), tiles.dtype)
            # sg runs only for len(packs)==1, so grown[:, :G] is contiguous
            if not native.parallel_copy(grown[:, :G], tiles):
                grown[:, :G] = tiles
            tiles = grown
            ws = np.pad(ws, ((0, 0), (0, G_sg - G)), mode="edge")
        min_b_rows = max(min_b_rows, int(bases.max()) + Wsg)

        if (
            mxu_precision == "default"
            and np.dtype(dtype) == np.float32
        ):
            # 1-pass bf16 operating point: A stored as bf16 hi only (half
            # the panel traffic), B cast to bf16 per exec, one MXU pass —
            # measured 0.0069 s vs x3's 0.0128 at the headline shape
            # (bench_results/r2_tpu_presplit_b.jsonl), ~2e-3 relative
            import jax.numpy as jnp
            from .spmm_pallas import np_bf16, spmm_window_pallas_sg_bf16

            ah = np_bf16(tiles)

            def local_fn(arrs, rB):
                ws_i, ah_i, bases_i = arrs
                c = spmm_window_pallas_sg_bf16(
                    ws_i, bases_i, ah_i, rB.astype(jnp.bfloat16),
                    SG, Wsg, W, TM, Wc=Wc_sg, interpret=interpret,
                )
                return c.astype(rB.dtype)

            local_fn.min_b_rows = min_b_rows
            local_fn.roofline = dict(
                G=G_sg, TM=TM, W=W, a_bytes=ah.nbytes,
                b_rows_read=sgc * Wsg, c_rows=G_sg * TM, b_itemsize=2,
                passes=n_passes,
            )
            return (ws, ah, bases[None]), local_fn

        if precision == "x3":
            # pre-split A into bf16 hi/lo (same bytes as fp32): the per-step
            # VPU conversion of the A chunk disappears from the kernel
            import jax.numpy as jnp
            from .spmm_pallas import np_split_bf16

            ah, al = np_split_bf16(tiles)

            def local_fn(arrs, rB):
                ws_i, ah_i, al_i, bases_i = arrs
                from .spmm_pallas import spmm_window_pallas_sg_presplit

                c = spmm_window_pallas_sg_presplit(
                    ws_i, bases_i, ah_i, al_i, rB, SG, Wsg, W, TM,
                    Wc=Wc_sg, interpret=interpret,
                )
                # no [:max_m] slice (full-output copy); engines trim by row
                # displacements at unshard time
                return c.astype(rB.dtype)

            local_fn.min_b_rows = min_b_rows
            local_fn.roofline = dict(
                G=G_sg, TM=TM, W=W, a_bytes=ah.nbytes + al.nbytes,
                b_rows_read=sgc * Wsg, c_rows=G_sg * TM,
                b_itemsize=np.dtype(dtype).itemsize,
                passes=n_passes,
            )
            return (ws, ah, al, bases[None]), local_fn

        def local_fn(arrs, rB):
            ws_i, tiles_i, bases_i = arrs
            packed = WindowDense(
                nrow=max_m, ncol=rB.shape[0], TM=TM, G=G_sg, W=W,
                ws=ws_i, tiles=tiles_i,
            )
            c = spmm_window_pallas_sg(
                packed, rB, SG, Wsg, bases_i, Wc=Wc_sg,
                precision=precision, interpret=interpret,
            )
            # no [:max_m] slice: it copies the whole output once per exec;
            # rows past the shard's real rows come from zero panels and the
            # engines trim by row displacements at unshard time
            return c.astype(rB.dtype)

        local_fn.min_b_rows = min_b_rows
        local_fn.roofline = dict(
            G=G_sg, TM=TM, W=W, a_bytes=tiles.nbytes,
            b_rows_read=sgc * Wsg, c_rows=G_sg * TM,
            b_itemsize=np.dtype(dtype).itemsize,
            passes=n_passes,
        )
        return (ws, tiles, bases[None]), local_fn

    def local_fn(arrs, rB):
        ws_i, tiles_i = arrs
        packed = WindowDense(
            nrow=max_m, ncol=rB.shape[0], TM=TM, G=G, W=W,
            ws=ws_i, tiles=tiles_i,
        )
        c = spmm_window_pallas(
            packed, rB, precision=precision, interpret=interpret
        )
        return c.astype(rB.dtype)  # see sg variant: engines trim at unshard

    local_fn.min_b_rows = min_b_rows
    local_fn.roofline = dict(
        G=G, TM=TM, W=W, a_bytes=tiles.nbytes,
        b_rows_read=G * W, c_rows=G * TM,
        b_itemsize=np.dtype(dtype).itemsize,
        passes=n_passes,
    )
    arrays = (ws, tiles)
    return arrays, local_fn


def _extend_and_stack_steps(shard_steps, G):
    """Shared stacking discipline for the ragged kernel families.

    ``shard_steps``: per shard, None (empty shard) or (starts, step_g,
    step_first, G_s).  Groups past a shard's own count get dummy chunks
    (start 0, first=1: every output block must be initialized); shards are
    then padded to a common S with trailing no-op steps on the LAST group
    (first=0, zero payload) — both preserve the kernels' consecutive-
    output-block invariant.  Returns (a_g, a_first, a_starts, S).
    """
    per = []
    for st in shard_steps:
        if st is None:
            starts = np.zeros(G, np.int32)
            step_g = np.arange(G, dtype=np.int32)
            step_first = np.ones(G, np.int32)
        else:
            starts, step_g, step_first, G_s = st
            if G_s < G:
                extra = G - G_s
                starts = np.concatenate([starts, np.zeros(extra, np.int32)])
                step_g = np.concatenate(
                    [step_g, np.arange(G_s, G, dtype=np.int32)]
                )
                step_first = np.concatenate(
                    [step_first, np.ones(extra, np.int32)]
                )
        per.append((starts, step_g, step_first))
    S = max(len(x[0]) for x in per)
    p = len(shard_steps)
    a_starts = np.zeros((p, S), np.int32)
    a_g = np.full((p, S), G - 1, np.int32)
    a_first = np.zeros((p, S), np.int32)
    for i, (starts, step_g, step_first) in enumerate(per):
        k = len(starts)
        a_starts[i, :k] = starts
        a_g[i, :k] = step_g
        a_first[i, :k] = step_first
    return a_g, a_first, a_starts, S


def _pack_ragged(shards, max_m, dtype, mxu_precision="highest",
                 geometry=None):
    """Ragged gathered-window pack: per-group chunk lists + VPU spill.

    Serves the sparsity classes the uniform windowed kernel rejects —
    variable/large bandwidth and power-law matrices (the reference's local
    kernels take any CSR: MKL ``src/rowpara_spmm.c:398-407``, cuSPARSE
    ``deprecated/src/cuda_proxy.cu:122-182``).  Raises UnsupportedSparsity
    when the cover keeps less than ``CRP_TPU_RAGGED_MIN_PCT`` percent
    (default 30) of the nonzeros on the MXU — the engines then fall back to segsum.
    """
    import os

    import jax

    from .spmm_pallas import UnsupportedSparsity
    from .spmm_ragged import (
        pack_ragged_window, pack_ragged_window_bf16, pack_spill,
        resolve_ragged_geometry, spill_impl, spmm_ragged, spmm_ragged_bf16,
        spmm_ragged_presplit, spmm_spill_chunked,
    )

    interpret = jax.default_backend() != "tpu"
    # model-based per-matrix geometry on the largest shard (all shards
    # share one kernel program, hence one (TM, Wc)); env knobs pin it.
    # Off-TPU the interpreter's per-step cost scales with scratch size,
    # so Wc is capped (tests run tiny correctness-only shapes).
    if geometry is not None:
        TM, Wc = geometry  # caller (the uniform gate) already resolved
    else:
        big = max(
            (s for s in shards if len(s[0]) > 1),
            key=lambda s: int(s[0][-1]) - int(s[0][0]),
            default=None,
        )
        if big is None:
            big = (np.zeros(1, np.int64), np.zeros(0, np.int32))
        TM, Wc = resolve_ragged_geometry(
            big[0], big[1], mxu_precision, interpret=interpret
        )
    pack_dtype = np.float64 if np.dtype(dtype) == np.float64 else np.float32

    # single-shard bf16 operating points densify straight to bf16 (no
    # fp32 panel intermediate — every fresh output page written once)
    want_bf16 = (
        len(shards) == 1
        and np.dtype(dtype) == np.float32
        and mxu_precision in ("default", "x3")
    )
    direct_hi = direct_lo = None

    packs = []
    total_nnz = 0
    mxu_nnz = 0
    for rowptr, cc, v in shards:
        nnz = int(rowptr[-1]) - int(rowptr[0]) if len(rowptr) > 1 else 0
        total_nnz += nnz
        if nnz == 0:
            packs.append(None)
            continue
        ncol = int(cc.max()) + 1 if len(cc) else 1
        if want_bf16:
            got = pack_ragged_window_bf16(
                rowptr, cc, v, ncol, TM=TM, Wc=Wc,
                split=(mxu_precision == "x3"),
            )
            if got is not None:
                rw, direct_hi, direct_lo = got
                mxu_nnz += rw.mxu_nnz
                packs.append(rw)
                continue
        rw = pack_ragged_window(
            rowptr, cc, v, ncol, TM=TM, Wc=Wc, dtype=pack_dtype
        )
        mxu_nnz += rw.mxu_nnz
        packs.append(rw)
    if total_nnz == 0:
        raise UnsupportedSparsity("all shards empty")
    min_pct = int(os.environ.get("CRP_TPU_RAGGED_MIN_PCT", 30))
    if mxu_nnz * 100 < min_pct * total_nnz:
        raise UnsupportedSparsity(
            f"ragged cover keeps only {mxu_nnz * 100 // total_nnz}% of nnz "
            f"on the MXU (min {min_pct}%)"
        )

    G = max(
        -(-max_m // TM),
        max((p.G for p in packs if p is not None), default=1),
    )

    a_g, a_first, a_starts, S = _extend_and_stack_steps(
        [
            None if p_ is None
            else (p_.starts, p_.step_g, p_.step_first, p_.G)
            for p_ in packs
        ],
        G,
    )
    p = len(shards)
    if direct_hi is not None:
        from .. import native

        def _stack_bf(x):
            if x is None:
                return None
            if packs[0].S == S:
                return x[None]  # no step padding: alias, zero copies
            out = np.zeros((1, S, TM, Wc), x.dtype)
            if not native.parallel_copy(out[0, : packs[0].S], x):
                out[0, : packs[0].S] = x
            return out

        direct_hi, direct_lo = _stack_bf(direct_hi), _stack_bf(direct_lo)
        panels = None
    elif p == 1 and packs[0] is not None and packs[0].S == S:
        # single shard with no step padding (every on-chip p=1 run): alias
        # the pack's panels — see the uniform path's aliasing note
        panels = packs[0].panels[None]
    else:
        panels = np.zeros((p, S, TM, Wc), pack_dtype)
        for i, p_ in enumerate(packs):
            if p_ is not None:
                panels[i, : p_.S] = p_.panels

    Z = max((p_.spill_nnz for p_ in packs if p_ is not None), default=0)
    has_spill = Z > 0
    sp_impl = spill_impl() if has_spill else "segsum"
    if sp_impl == "auto":
        # fused kernel pays one dummy pass over every output block (the C
        # pass-through) — worth it only when the spill is dense enough to
        # amortize it (cplaw 2.6 nnz/row: wins; near-zero banded spill:
        # loses).  Interpreted pallas is orders slower — TPU only.
        import jax

        dense_spill = Z >= max_m
        sp_impl = (
            "pallas"
            if dense_spill and jax.default_backend() == "tpu"
            else "segsum"
        )
    if sp_impl == "pallas" and pack_dtype != np.float32:
        sp_impl = "segsum"  # fused spill kernel is fp32-only (dd keeps VPU)
    n_sp = 0
    if has_spill:
        if sp_impl == "pallas":
            from .spmm_ragged import pack_spill_blocks, spmm_spill_pallas

            # step geometry: Q nnz per one-hot step, TMo output rows per
            # resident block.  Bigger Q cuts the grid-step count (16k tiny
            # steps at Q=128 on the r5 cplaw point) at the price of more
            # pad-slot gather in blocks with few spills; bigger TMo cuts
            # the dummy-step minimum (one step per output block carries the
            # main kernel's C through).
            # (512, 512) measured best on the cplaw point: 62.6 ms vs
            # 77.0 at (512, 256) and 80.5 at (128, 128) — the grid-step
            # count, not pad-gather waste, dominates
            # (r5_tpu_spill_fused.jsonl)
            TMo = int(os.environ.get("CRP_TPU_SPILL_TMO", 512))
            Qs = int(os.environ.get("CRP_TPU_SPILL_Q", 512))
            assert TMo % 128 == 0 and Qs % 128 == 0, (TMo, Qs)
            while (G * TM) % TMo:  # M = G*TM is only 128-aligned
                TMo //= 2

            def _sorted_spill(p_):
                # (block, column) order: the one-hot routes rows, so
                # column-sorting within a block makes the XLA bulk gather
                # near-monotone over B
                if p_ is None or p_.spill is None:
                    return None
                r, cl, v = p_.spill
                order = np.lexsort((cl, r // TMo))
                return r[order], cl[order], v[order]

            spills = [_sorted_spill(p_) for p_ in packs]
            nblk = G * TM // TMo

            def _ns(s):
                if s is None:
                    return nblk
                counts = np.bincount(s[0] // TMo, minlength=nblk)
                return int(np.maximum(-(-counts // Qs), 1).sum())

            ns_pad = max(_ns(s) for s in spills)
            sp = [
                pack_spill_blocks(s, ns_pad, G * TM, pack_dtype,
                                  TMo=TMo, Q=Qs)
                for s in spills
            ]
            n_sp = 5
        elif sp_impl == "twopass":
            from .spmm_ragged import pack_spill_twopass, spmm_spill_twopass

            U = max(
                (len(np.unique(p_.spill[1]))
                 for p_ in packs if p_ is not None and p_.spill is not None),
                default=1,
            )
            sp = [
                pack_spill_twopass(
                    p_.spill if p_ is not None else None, Z, G * TM,
                    pack_dtype, max(U, 1),
                )
                for p_ in packs
            ]
            n_sp = 4
        else:
            sp = [
                pack_spill(
                    p_.spill if p_ is not None else None, Z, G * TM,
                    pack_dtype,
                )
                for p_ in packs
            ]
            n_sp = 3
        sp_arrays = tuple(
            np.stack([s[i] for s in sp]) for i in range(n_sp)
        )

    min_b_rows = int(a_starts.max()) + Wc
    kw = dict(G=G, TM=TM, Wc=Wc, interpret=interpret)
    is_f32 = np.dtype(dtype) == np.float32

    def add_spill(c, arrs, rB):
        if not has_spill:
            return c
        if sp_impl == "pallas":
            rel, cl, v, first, blkid = arrs[-5:]
            return spmm_spill_pallas(
                c, rel, cl, v, first, blkid, rB,
                TMo=TMo, Q=Qs, mxu_precision=mxu_precision,
                interpret=interpret,
            )
        if sp_impl == "twopass":
            r, iv, v, uq = arrs[-4], arrs[-3], arrs[-2], arrs[-1]
            return c + spmm_spill_twopass(r, iv, v, uq, rB, G * TM)
        r, cl, v = arrs[-3], arrs[-2], arrs[-1]
        return c + spmm_spill_chunked(
            r, cl, v, rB, G * TM,
            take_mode="clip" if sp_impl == "clip" else "fill",
        )

    if mxu_precision == "default" and is_f32:
        import jax.numpy as jnp
        from .spmm_pallas import np_bf16

        ah = direct_hi if direct_hi is not None else np_bf16(panels)

        def local_fn(arrs, rB):
            c = spmm_ragged_bf16(
                arrs[0], arrs[1], arrs[2], arrs[3],
                rB.astype(jnp.bfloat16), **kw,
            )
            return add_spill(c, arrs, rB).astype(rB.dtype)

        arrays = (a_g, a_first, a_starts, ah)
        a_bytes = ah.nbytes
        b_itemsize = 2
    elif mxu_precision == "x3" and is_f32:
        from .spmm_pallas import np_split_bf16

        if direct_hi is not None:
            ah, al = direct_hi, direct_lo
        else:
            ah, al = np_split_bf16(panels)

        def local_fn(arrs, rB):
            c = spmm_ragged_presplit(
                arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], rB, **kw
            )
            return add_spill(c, arrs, rB).astype(rB.dtype)

        arrays = (a_g, a_first, a_starts, ah, al)
        a_bytes = ah.nbytes + al.nbytes
        b_itemsize = np.dtype(dtype).itemsize
    else:
        def local_fn(arrs, rB):
            c = spmm_ragged(
                arrs[0], arrs[1], arrs[2], arrs[3], rB, **kw
            )
            return add_spill(c, arrs, rB).astype(rB.dtype)

        arrays = (a_g, a_first, a_starts, panels)
        a_bytes = panels.nbytes
        b_itemsize = np.dtype(dtype).itemsize

    if has_spill:
        arrays = arrays + sp_arrays

    local_fn.min_b_rows = min_b_rows
    local_fn.variant = "ragged"
    local_fn.roofline = dict(
        G=G, TM=TM, W=Wc, a_bytes=a_bytes,
        b_rows_read=S * Wc, c_rows=G * TM, b_itemsize=b_itemsize,
        S=S,
        # true total across shards (records); max is the per-chip padded
        # size and the roofline-relevant term
        spill_nnz=sum(p_.spill_nnz for p_ in packs if p_ is not None),
        spill_max=Z,
        spill_impl=sp_impl,  # records must show what auto resolved to
        mxu_frac=mxu_nnz / total_nnz,
        passes={"x3": 3, "highest": 6, "default": 1}.get(mxu_precision, 1),
    )
    return arrays, local_fn


def _pack_gather(shards, max_m, dtype, mxu_precision):
    """"gather" kernel: EVERY nnz takes the bulk-gather + one-hot-MXU
    block-reduce path (``spmm_gather_chunked``) — no interval cover, no
    scatter.  Serves scrambled/pure power-law matrices the ragged cover
    refuses, where segsum's ~21 ns/nnz XLA scatter is otherwise the only
    path (reference seam: any-CSR MKL/cuSPARSE,
    ``src/rowpara_spmm.c:398-407``).  fp32 only (dd keeps the VPU path).
    """
    import jax

    from .spmm_pallas import UnsupportedSparsity
    from .spmm_ragged import (
        gather_step_layout, pack_gather_blocks, spmm_gather_chunked,
    )

    if np.dtype(dtype) != np.float32:
        raise UnsupportedSparsity("gather kernel is fp32-only")
    interpret = jax.default_backend() != "tpu"
    # same geometry law the fused-spill A/B measured: the grid-step count
    # dominates (62.6 ms at (512,512) vs 80.5 at (128,128) on cplaw,
    # r5_tpu_spill_fused.jsonl) — default big, same env knobs
    TMo = int(os.environ.get("CRP_TPU_SPILL_TMO", 512))
    Qs = int(os.environ.get("CRP_TPU_SPILL_Q", 512))
    assert TMo % 128 == 0 and Qs % 128 == 0, (TMo, Qs)
    M = -(-max_m // TMo) * TMo
    nblk = M // TMo
    total_nnz = 0
    blk_counts = []
    for rowptr, cc, v in shards:
        nrow = len(rowptr) - 1
        idx = np.minimum(
            np.arange(nblk + 1, dtype=np.int64) * TMo, max(nrow, 0)
        )
        blk_counts.append(np.diff(rowptr[idx]).astype(np.int64))
        total_nnz += int(rowptr[-1]) - int(rowptr[0]) if nrow > 0 else 0
    if total_nnz == 0:
        raise UnsupportedSparsity("all shards empty")
    step_base = gather_step_layout(blk_counts, Qs)
    packs = [
        pack_gather_blocks(rowptr, cc, v, step_base, M, TMo=TMo, Q=Qs)
        for rowptr, cc, v in shards
    ]
    arrays = tuple(
        np.stack([p[i] for p in packs]) for i in range(5)
    )  # rel, cols, vals, first, blk
    ns = int(step_base[-1])

    def local_fn(arrs, rB):
        return spmm_gather_chunked(
            arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], rB,
            step_base=step_base, TMo=TMo, Q=Qs,
            mxu_precision=mxu_precision, interpret=interpret,
        ).astype(rB.dtype)

    local_fn.min_b_rows = 1
    local_fn.variant = "gather"
    local_fn.roofline = dict(
        G=nblk, TM=TMo, W=Qs, S=ns,
        a_bytes=sum(a.nbytes for a in arrays),
        b_rows_read=ns * Qs, c_rows=M, b_itemsize=4,
        spill_nnz=total_nnz, mxu_frac=0.0,
        passes={"x3": 2, "highest": 6, "default": 1}.get(mxu_precision, 1),
    )
    return arrays, local_fn


def _pack_dd_mxu(shards, max_m):
    """fp64-class MXU pack: ragged total cover + Ozaki slice planes.

    Same stacking discipline as ``_pack_ragged`` (dummy chunks initialize
    every output block, trailing no-op steps pad to a common S); dummy
    panels have zero slices and unit scales.
    """
    import jax

    from .spmm_dd_mxu import PASSES, QA, pack_ragged_dd, spmm_ragged_dd
    from .spmm_pallas import UnsupportedSparsity
    from .spmm_ragged import ragged_params

    TM, Wc = ragged_params()
    # the Ozaki exactness invariant needs every fp32 dot accumulation to
    # stay exact: Wc products of integer slices bounded by 2^14 each are
    # representable only while Wc * 2^14 <= 2^24, i.e. Wc <= 1024 — clamp
    # independently of the shared CRP_TPU_RAGGED_WC knob
    Wc = min(Wc, 1024)
    interpret = jax.default_backend() != "tpu"
    if interpret:
        Wc = min(Wc, 256)

    packs = []
    total_nnz = 0
    for rowptr, cc, v in shards:
        nnz = int(rowptr[-1]) - int(rowptr[0]) if len(rowptr) > 1 else 0
        total_nnz += nnz
        if nnz == 0:
            packs.append(None)
            continue
        ncol = int(cc.max()) + 1 if len(cc) else 1
        packs.append(
            pack_ragged_dd(rowptr, cc, np.asarray(v, np.float64), ncol,
                           TM=TM, Wc=Wc)
        )
    if total_nnz == 0:
        raise UnsupportedSparsity("all shards empty")

    G = max(
        -(-max_m // TM),
        max((item[0].G for item in packs if item is not None), default=1),
    )
    a_g, a_first, a_starts, S = _extend_and_stack_steps(
        [
            None if item is None
            else (item[0].starts, item[0].step_g, item[0].step_first,
                  item[0].G)
            for item in packs
        ],
        G,
    )
    p = len(shards)
    import ml_dtypes

    if p == 1 and packs[0] is not None and packs[0][0].S == S:
        # single shard with no step padding: alias the slice planes (GBs)
        # instead of re-copying through the slow single-threaded host path
        a_mu = packs[0][1][None]
        a_sl = packs[0][2][None]
    else:
        a_mu = np.ones((p, S, TM), np.float32)
        a_sl = np.zeros((p, QA, S, TM, Wc), ml_dtypes.bfloat16)
        for i, item in enumerate(packs):
            if item is not None:
                rw, mu, sl = item
                a_mu[i, : rw.S] = mu
                a_sl[i, :, : rw.S] = sl

    min_b_rows = int(a_starts.max()) + Wc
    kw = dict(G=G, TM=TM, Wc=Wc, interpret=interpret)

    def local_fn(arrs, rB_packed):
        return spmm_ragged_dd(
            arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], rB_packed, **kw
        )

    local_fn.min_b_rows = min_b_rows
    local_fn.variant = "dd_mxu"
    local_fn.roofline = dict(
        G=G, TM=TM, W=Wc, a_bytes=int(a_sl.nbytes + a_mu.nbytes),
        b_rows_read=S * Wc, c_rows=G * TM, b_itemsize=8,
        S=S, spill_nnz=0, mxu_frac=1.0, passes=len(PASSES),
    )
    return (a_g, a_first, a_starts, a_mu, a_sl), local_fn
