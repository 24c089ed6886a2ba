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

from typing import Callable

import numpy as np

from .spmm_jnp import DeviceCSR, pack_device_csr, spmm_segment_sum
from .spmm_ell import pack_ell, spmm_ell


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


def pack_local_kernel(
    shards: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_m: int,
    dtype,
    kind: str = "segsum",
    mxu_precision: str = "highest",
) -> tuple[tuple[np.ndarray, ...], Callable]:
    """Pack shards [(rowptr, compact_colidx, val), ...] for kernel ``kind``.

    Returns (stacked host arrays, local_fn) where ``local_fn(arrays, rB)``
    computes the shard's C block of shape (max_m, n); each element of
    ``arrays`` has leading shard axis already stripped.
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

    if kind == "dd":
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


def _pack_pallas(shards, max_m, dtype, mxu_precision="highest"):
    """Stack per-shard WindowDense packs to common (G, T) dims.

    The returned local_fn carries ``min_b_rows``: engines must size the
    receive buffer rB to at least this many rows so every window DMA is
    in-bounds.
    """
    import jax

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
    tiles = np.zeros((len(packs), G, TM, W), dtype=dtype)
    ws = np.zeros((len(packs), G), dtype=np.int32)
    for i, p in enumerate(packs):
        if p is None:
            continue
        tiles[i, : p.G, :, : p.W] = p.tiles
        ws[i, : p.G] = p.ws
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
    sg_plan = None
    # the bf16 1-pass kernel DMAs a single 2-byte window; the others hold
    # the window at the data itemsize (fp32) or as a bf16 hi/lo PAIR —
    # budget and Wc feasibility must use the actual per-slot bytes
    is_bf16_1pass = (
        mxu_precision == "default" and np.dtype(dtype) == np.float32
    )
    win_itemsize = 2 if is_bf16_1pass else np.dtype(dtype).itemsize
    if len(packs) == 1 and packs[0] is not None:
        from .spmm_pallas import plan_supergroups

        # off-TPU the pallas interpreter's per-step cost scales with the
        # scratch size — keep windows small there (correctness-only path)
        sg_plan = plan_supergroups(
            ws[0, : packs[0].G], W, 256, win_itemsize,
            vmem_budget=(4 << 20) if interpret else None,
        )
    if sg_plan is not None:
        from .spmm_pallas import sg_vmem_limit, spmm_window_pallas_sg

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
        # pad-group window starts must stay monotone and in-range (the
        # stacked ws pads with zeros past the shard's real group count)
        ws[0, packs[0].G :] = ws[0, packs[0].G - 1]
        if G_sg > G:
            tiles = np.pad(tiles, ((0, 0), (0, G_sg - G), (0, 0), (0, 0)))
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
            import ml_dtypes

            from .spmm_pallas import spmm_window_pallas_sg_bf16

            ah = tiles.astype(ml_dtypes.bfloat16)

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
            )
            return (ws, ah, bases[None]), local_fn

        if precision == "x3":
            # pre-split A into bf16 hi/lo (same bytes as fp32): the per-step
            # VPU conversion of the A chunk disappears from the kernel
            import jax.numpy as jnp
            import ml_dtypes

            ah = tiles.astype(ml_dtypes.bfloat16)
            al = (tiles - ah.astype(np.float32)).astype(ml_dtypes.bfloat16)

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
    )
    arrays = (ws, tiles)
    return arrays, local_fn
