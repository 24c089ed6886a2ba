"""Local CSR x dense SpMM — Pallas MXU kernel (windowed dense-tile).

This is the accelerator kernel replacing the reference's MKL
(``src/rowpara_spmm.c:398-407``) and cuSPARSE
(``deprecated/src/cuda_proxy.cu:122-182``) local SpMM, designed for the MXU
rather than translated:

  * rows are processed in groups of ``TM``; after the planner's rB
    compaction (``rB_reidx``) each group's referenced B rows fall in a
    contiguous *window* [min, max) of 128-row-aligned B rows;
  * at pack time (host) the group's nonzeros are densified into a flat
    ``(TM, W)`` panel covering the window — zeros stay, but only within the
    window, so storage ~ m x window_width, not m x k;
  * at exec time a 3D grid ``(G, NJ, C)`` runs the classic matmul k-loop:
    the A panel streams through VMEM in ``(TM, Wc)`` chunks via the
    automatic BlockSpec pipeline, the matching B window chunk is DMA'd
    HBM->VMEM double-buffered across grid steps (window starts are
    data-dependent — scalar-prefetched ``ws`` — which BlockSpec index maps
    cannot express), and ``C[g, j] += A_chunk @ B_chunk`` accumulates in
    the resident output block;
  * HBM traffic ~ dense-window A (read once when TN >= n) + one window
    sweep of B + one C write; FLOPs ~ m x window x n — both set by the
    matrix bandwidth, which is exactly what the planner/reordering layers
    minimize.  VMEM use is bounded by the chunk size, independent of W.

Precision: for fp32 data the MXU computes via bf16 passes;
``precision=HIGHEST`` reproduces fp32 (~6 passes), DEFAULT is one bf16
pass (~1e-3 relative).  ``compute_dtype=bfloat16`` additionally halves A/B
storage and traffic.

Matrices whose row groups span windows wider than ``max_window`` (power-law
hubs, no band structure) are rejected at pack time (``UnsupportedSparsity``)
and the engines fall back to the portable kernels.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

TK = 128    # B window row alignment (MXU contraction dim granularity)
WCHUNK = 1536  # max k-loop chunk rows: bounds VMEM (~7 MB at TN=256 fp32)


def choose_chunks(W0: int) -> tuple[int, int, int]:
    """(W_padded, Wc, C) for a raw window of W0 rows: C even chunks of at
    most ~WCHUNK rows, chunk size TK-aligned, padding minimized (idempotent
    on already-padded widths)."""
    C = -(-W0 // WCHUNK)
    per = -(-W0 // C)
    Wc = -(-per // TK) * TK
    return C * Wc, Wc, C


class UnsupportedSparsity(ValueError):
    """Shard shape does not fit the windowed kernel; use a fallback."""


def assert_tpu_blockable(block_shape, array_shape, itemsize: int = 4):
    """Trace-time check of the Mosaic BlockSpec rule the interpreter skips:
    the last two block dims must be divisible by the (sublane, lane)
    quantum — (32 // itemsize * 8 // 8 = 8 for fp32, 16 for 2-byte types,
    lane always 128) — or equal the corresponding array dims.  Catches
    on-chip-only lowering rejections in the CPU-mesh test suite."""
    sublane = {4: 8, 2: 16, 1: 32}.get(itemsize, 8)
    quanta = (sublane, 128)
    # right-align: a rank-1 block only constrains the lane dim
    pairs = list(zip(block_shape[-2:], array_shape[-2:]))
    for (bdim, adim), quantum in zip(pairs, quanta[-len(pairs):]):
        if bdim != adim and bdim % quantum != 0:
            raise ValueError(
                f"block {tuple(block_shape)} over array {tuple(array_shape)}"
                f" is not TPU-lowerable: trailing dim {bdim} is neither the"
                f" full dim {adim} nor a multiple of {quantum}"
            )


@dataclasses.dataclass
class WindowDense:
    """Host-side packed form of one shard for the windowed kernel."""

    nrow: int            # rows covered (G * TM >= nrow)
    ncol: int            # rB rows (gather space)
    TM: int
    G: int               # row groups
    W: int               # window rows (multiple of TK)
    ws: np.ndarray       # (G,) int32 window start row (multiple of TK)
    tiles: np.ndarray    # (G, TM, W) dense A panels

    @property
    def padded_bytes(self) -> int:
        return self.tiles.nbytes

    @property
    def T(self) -> int:  # 128-row window tiles (kept for stats/compat)
        return self.W // TK


def window_extents(rowptr: np.ndarray, colidx: np.ndarray, TM: int):
    """Per-group [min, max] column-tile analysis, no densify: returns
    (min_t (G,) int64 window start tiles, W0 raw window rows).  Derived
    from per-row ranges (cols sorted per row -> first/last nnz of the row
    are its extrema); O(nrow), no nnz pass."""
    nrow = len(rowptr) - 1
    G = -(-nrow // TM)
    counts = np.diff(rowptr)
    nonempty = counts > 0
    row_min = np.full(nrow, np.iinfo(np.int64).max, dtype=np.int64)
    row_max = np.full(nrow, -1, dtype=np.int64)
    row_min[nonempty] = colidx[rowptr[:-1][nonempty]]
    row_max[nonempty] = colidx[rowptr[1:][nonempty] - 1]
    starts = np.arange(G) * TM
    min_t = np.minimum.reduceat(row_min, starts) // TK
    max_t = np.maximum.reduceat(row_max, starts) // TK
    empty = max_t < 0
    min_t = np.where(empty, 0, np.minimum(min_t, max_t))
    max_t = np.where(empty, 0, max_t)
    W0 = int(((max_t - min_t + 1).max()) * TK)
    return min_t, W0


def pack_window_dense(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    val: np.ndarray,
    ncol: int,
    TM: int = 256,
    max_window: int = 16384,
    max_expand_bytes: int = 8 << 30,
    dtype=np.float32,
) -> WindowDense:
    """Densify a CSR shard into flat per-group window panels.

    Raises UnsupportedSparsity when any group's window exceeds ``max_window``
    rows or the dense panels exceed ``max_expand_bytes``.
    """
    nrow = len(rowptr) - 1
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    nnz = int(rowptr[-1])
    if nnz == 0:
        raise UnsupportedSparsity("empty shard")
    G = -(-nrow // TM)

    min_t, W0 = window_extents(rowptr, colidx, TM)
    if W0 > max_window:
        raise UnsupportedSparsity(f"window {W0} rows > cap {max_window}")
    # round W up to a whole number of k-loop chunks so exec-time chunking
    # never reads past the panel (pad columns stay zero)
    W, _, _ = choose_chunks(W0)
    T0 = W0 // TK

    tile_bytes = G * W * TM * np.dtype(dtype).itemsize
    if tile_bytes > max_expand_bytes:
        raise UnsupportedSparsity(
            f"dense window tiles {tile_bytes >> 20} MiB > cap"
        )

    if np.dtype(dtype) == np.float32:
        from .. import native

        res = native.pack_window_flat_f32(
            nrow, rowptr, colidx, np.asarray(val, np.float32),
            TM, TK, max_window, G, W,
        )
        if res is not None:
            ws_n, flat, w0_n = res
            assert w0_n == W0, (w0_n, W0)
            return WindowDense(
                nrow=nrow, ncol=ncol, TM=TM, G=G, W=W, ws=ws_n, tiles=flat,
            )

    r = np.repeat(np.arange(nrow, dtype=np.int64), np.diff(rowptr))
    c = np.asarray(colidx, dtype=np.int64)
    v = np.asarray(val, dtype=dtype)
    g = r // TM
    tiles = np.zeros((G, TM, W), dtype=dtype)
    # flat scatter: panel (g), position (r % TM, c - window_start)
    flat = (g * TM + (r % TM)) * W + (c - min_t[g] * TK)
    np.add.at(tiles.reshape(-1), flat, v)  # add: duplicates accumulate

    return WindowDense(
        nrow=nrow, ncol=ncol, TM=TM, G=G, W=W,
        ws=(min_t * TK).astype(np.int32), tiles=tiles,
    )


def _window_kernel(
    ws_ref, a_ref, b_hbm, o_ref, window, sem,
    *, Wc, TN, NJ, C, compute_dtype, precision, acc_dtype,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    jn = pl.program_id(1)
    t = pl.program_id(2)
    step = (g * NJ + jn) * C + t
    total = pl.num_programs(0) * NJ * C

    def window_dma(s, slot):
        """DMA of step s's B window chunk into buffer ``slot``."""
        gg = s // (NJ * C)
        jj = (s // C) - gg * NJ
        tt = s - (s // C) * C
        return pltpu.make_async_copy(
            b_hbm.at[
                pl.ds(pl.multiple_of(ws_ref[gg] + tt * Wc, TK), Wc),
                pl.ds(pl.multiple_of(jj * TN, TN), TN),
            ],
            window.at[slot],
            sem.at[slot],
        )

    # double-buffered across sequential grid steps: scratch persists, so
    # this step computes from slot step%2 while the next step's chunk
    # streams into the other slot (a serialized start/wait DMA otherwise
    # gates the MXU on every chunk)
    @pl.when(step == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(step + 1 < total)
    def _():
        window_dma(step + 1, (step + 1) % 2).start()

    slot = step % 2
    window_dma(step, slot).wait()

    dims = (((1,), (0,)), ((), ()))
    if precision == "x3":
        # hand-rolled bf16x3: a = ah + al, b = bh + bl (bf16 splits);
        # a@b ~ ah@bh + ah@bl + al@bh — 3 MXU passes vs HIGHEST's 6,
        # ~1e-6 relative instead of ~1e-7
        a32 = a_ref[0].astype(jnp.float32)
        b32 = window[slot].astype(jnp.float32)
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
            a_ref[0].astype(compute_dtype),
            window[slot].astype(compute_dtype),
            dims,
            preferred_element_type=acc_dtype,
            precision=precision,
        )

    @pl.when(t == 0)
    def _():
        o_ref[:] = partial.astype(o_ref.dtype)

    @pl.when(t > 0)
    def _():
        o_ref[:] = o_ref[:] + partial.astype(o_ref.dtype)


def spmm_window_pallas(
    packed: WindowDense, b, TN: int | None = None, Wc: int | None = None,
    compute_dtype=None, precision=None, interpret: bool = False,
):
    """C (G*TM, n) = A @ B with B (k_pad, n); k_pad >= max(ws) + W.

    n is padded up to a multiple of TN internally; ``interpret=True`` runs
    the Pallas interpreter (for CPU-mesh tests).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    compute_dtype = compute_dtype or packed.tiles.dtype
    if precision is None:
        precision = (
            jax.lax.Precision.HIGHEST
            if np.dtype(compute_dtype) == np.float32
            else jax.lax.Precision.DEFAULT
        )
    n_orig = b.shape[1]
    if TN is None:
        TN = 256 if n_orig % 256 == 0 else 128
    if n_orig % TN:
        b = jnp.pad(b, ((0, 0), (0, TN - n_orig % TN)))
    n = b.shape[1]
    W, TM, G = packed.W, packed.TM, packed.G
    if Wc is None:
        _, Wc, _ = choose_chunks(W)
    C = W // Wc
    # pack_window_dense rounds W up to whole chunks, so chunking is exact
    assert Wc * C == W and Wc % TK == 0, (W, Wc, C)

    acc_dtype = (
        jnp.float64 if np.dtype(compute_dtype) == np.float64 else jnp.float32
    )
    tiles = packed.tiles

    kern = functools.partial(
        _window_kernel,
        Wc=Wc, TN=TN, NJ=n // TN, C=C,
        compute_dtype=compute_dtype, precision=precision,
        acc_dtype=acc_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # ws
        grid=(G, n // TN, C),
        in_specs=[
            pl.BlockSpec(
                (1, TM, Wc),
                lambda g, j, t, *_: (g, 0, t),
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # B stays in HBM
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda g, j, t, *_: (g, j)),
        scratch_shapes=[
            pltpu.VMEM((2, Wc, TN), b.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * TM, n), acc_dtype),
        interpret=interpret,
    )
    out = fn(jnp.asarray(packed.ws), jnp.asarray(tiles), b)
    return out[:, :n_orig] if n != n_orig else out


def _window_kernel_sg(
    ws_ref, base_ref, a_ref, b_hbm, o_ref, window, sem,
    *, Wsg, Wc, TN, NJ, C, SG, compute_dtype, precision, acc_dtype,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sg = pl.program_id(0)
    jn = pl.program_id(1)
    u = pl.program_id(2)
    lin = sg * NJ + jn  # super-window instance (one DMA per lin)
    total_lin = pl.num_programs(0) * NJ

    def sw_dma(l, slot):
        ss = l // NJ
        jj = l - ss * NJ
        return pltpu.make_async_copy(
            b_hbm.at[
                pl.ds(pl.multiple_of(base_ref[ss], TK), Wsg),
                pl.ds(pl.multiple_of(jj * TN, TN), TN),
            ],
            window.at[slot],
            sem.at[slot],
        )

    @pl.when((sg == 0) & (jn == 0) & (u == 0))
    def _():
        sw_dma(0, 0).start()

    @pl.when(u == 0)
    def _():
        sw_dma(lin, lin % 2).wait()

        @pl.when(lin + 1 < total_lin)
        def _():
            # double-buffer at super-window granularity: the next window
            # streams while all SG * C steps of this one compute
            sw_dma(lin + 1, (lin + 1) % 2).start()

    slot = lin % 2
    g = sg * SG + u // C
    t = u - (u // C) * C
    og = ws_ref[g] - base_ref[sg]
    bt = window[slot, pl.ds(pl.multiple_of(og + t * Wc, TK), Wc), :]

    dims = (((1,), (0,)), ((), ()))
    if precision == "x3":
        a32 = a_ref[0].astype(jnp.float32)
        b32 = bt.astype(jnp.float32)
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
            a_ref[0].astype(compute_dtype), bt.astype(compute_dtype),
            dims,
            preferred_element_type=acc_dtype,
            precision=precision,
        )

    @pl.when(t == 0)
    def _():
        o_ref[:] = partial.astype(o_ref.dtype)

    @pl.when(t > 0)
    def _():
        o_ref[:] = o_ref[:] + partial.astype(o_ref.dtype)


def _window_kernel_sg_presplit(
    ws_ref, base_ref, ah_ref, al_ref, b_hbm, o_ref, window, sem,
    *, Wsg, Wc, TN, NJ, C, SG,
):
    """x3 variant with A pre-split into bf16 hi/lo at pack time — the A
    chunk conversions vanish from the per-step VPU work (B still splits
    in-kernel)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sg = pl.program_id(0)
    jn = pl.program_id(1)
    u = pl.program_id(2)
    lin = sg * NJ + jn
    total_lin = pl.num_programs(0) * NJ

    def sw_dma(l, slot):
        ss = l // NJ
        jj = l - ss * NJ
        return pltpu.make_async_copy(
            b_hbm.at[
                pl.ds(pl.multiple_of(base_ref[ss], TK), Wsg),
                pl.ds(pl.multiple_of(jj * TN, TN), TN),
            ],
            window.at[slot],
            sem.at[slot],
        )

    @pl.when((sg == 0) & (jn == 0) & (u == 0))
    def _():
        sw_dma(0, 0).start()

    @pl.when(u == 0)
    def _():
        sw_dma(lin, lin % 2).wait()

        @pl.when(lin + 1 < total_lin)
        def _():
            sw_dma(lin + 1, (lin + 1) % 2).start()

    slot = lin % 2
    g = sg * SG + u // C
    t = u - (u // C) * C
    og = ws_ref[g] - base_ref[sg]
    b32 = window[slot, pl.ds(pl.multiple_of(og + t * Wc, TK), Wc), :]
    bh = b32.astype(jnp.bfloat16)
    bl = (b32 - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    partial = dot(ah_ref[0], bh) + (dot(ah_ref[0], bl) + dot(al_ref[0], bh))

    @pl.when(t == 0)
    def _():
        o_ref[:] = partial.astype(o_ref.dtype)

    @pl.when(t > 0)
    def _():
        o_ref[:] = o_ref[:] + partial.astype(o_ref.dtype)


def _window_kernel_sg_presplit_ab(
    ws_ref, base_ref, ah_ref, al_ref, bh_hbm, bl_hbm, o_ref,
    win_h, win_l, sem_h, sem_l,
    *, Wsg, Wc, TN, NJ, C, SG,
):
    """x3 variant with BOTH operands pre-split to bf16 hi/lo in HBM.

    Under super-grouping the in-kernel B split re-runs per row group — SG
    redundant VPU passes over the same window rows; with B stored as bf16
    halves the windows DMA directly into bf16 scratch (same total scratch
    bytes as one fp32 window) and the kernel is pure MXU + accumulate.
    (The single-pass bf16 operating point has its own kernel,
    ``_window_kernel_sg_bf16``, which never streams the lo halves.)
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sg = pl.program_id(0)
    jn = pl.program_id(1)
    u = pl.program_id(2)
    lin = sg * NJ + jn
    total_lin = pl.num_programs(0) * NJ

    def sw_dma(l, slot, hbm, win, sem):
        ss = l // NJ
        jj = l - ss * NJ
        return pltpu.make_async_copy(
            hbm.at[
                pl.ds(pl.multiple_of(base_ref[ss], TK), Wsg),
                pl.ds(pl.multiple_of(jj * TN, TN), TN),
            ],
            win.at[slot],
            sem.at[slot],
        )

    def both(l, slot):
        return [sw_dma(l, slot, bh_hbm, win_h, sem_h),
                sw_dma(l, slot, bl_hbm, win_l, sem_l)]

    @pl.when((sg == 0) & (jn == 0) & (u == 0))
    def _():
        for d in both(0, 0):
            d.start()

    @pl.when(u == 0)
    def _():
        for d in both(lin, lin % 2):
            d.wait()

        @pl.when(lin + 1 < total_lin)
        def _():
            for d in both(lin + 1, (lin + 1) % 2):
                d.start()

    slot = lin % 2
    g = sg * SG + u // C
    t = u - (u // C) * C
    og = ws_ref[g] - base_ref[sg]
    sl = pl.ds(pl.multiple_of(og + t * Wc, TK), Wc)

    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bh = win_h[slot, sl, :]
    bl = win_l[slot, sl, :]
    partial = dot(ah_ref[0], bh) + (dot(ah_ref[0], bl) + dot(al_ref[0], bh))

    @pl.when(t == 0)
    def _():
        o_ref[:] = partial.astype(o_ref.dtype)

    @pl.when(t > 0)
    def _():
        o_ref[:] = o_ref[:] + partial.astype(o_ref.dtype)


def _window_kernel_sg_bf16(
    ws_ref, base_ref, ah_ref, bh_hbm, o_ref, win_h, sem_h,
    *, Wsg, Wc, TN, NJ, C, SG,
):
    """Single-pass bf16 operating point: C = ah @ bh, no lo halves anywhere
    (half the A traffic and a third of the MXU work of x3, ~1e-3 relative)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sg = pl.program_id(0)
    jn = pl.program_id(1)
    u = pl.program_id(2)
    lin = sg * NJ + jn
    total_lin = pl.num_programs(0) * NJ

    def sw_dma(l, slot):
        ss = l // NJ
        jj = l - ss * NJ
        return pltpu.make_async_copy(
            bh_hbm.at[
                pl.ds(pl.multiple_of(base_ref[ss], TK), Wsg),
                pl.ds(pl.multiple_of(jj * TN, TN), TN),
            ],
            win_h.at[slot],
            sem_h.at[slot],
        )

    @pl.when((sg == 0) & (jn == 0) & (u == 0))
    def _():
        sw_dma(0, 0).start()

    @pl.when(u == 0)
    def _():
        sw_dma(lin, lin % 2).wait()

        @pl.when(lin + 1 < total_lin)
        def _():
            sw_dma(lin + 1, (lin + 1) % 2).start()

    slot = lin % 2
    g = sg * SG + u // C
    t = u - (u // C) * C
    og = ws_ref[g] - base_ref[sg]
    bh = win_h[slot, pl.ds(pl.multiple_of(og + t * Wc, TK), Wc), :]
    partial = jax.lax.dot_general(
        ah_ref[0], bh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t == 0)
    def _():
        o_ref[:] = partial.astype(o_ref.dtype)

    @pl.when(t > 0)
    def _():
        o_ref[:] = o_ref[:] + partial.astype(o_ref.dtype)


def _sg_call(kern, nins, sgc, SG, C, NJ, TM, TN, Wc, Wsg, G, n, win_dtype,
             nwin, interpret):
    """Shared pallas_call builder for the super-grouped kernel family."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_spec = pl.BlockSpec(
        (1, TM, Wc), lambda s, j, u, *_: (s * SG + u // C, 0, u % C)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ws, bases
        grid=(sgc, NJ, SG * C),
        in_specs=[a_spec] * (nins - nwin)
        + [pl.BlockSpec(memory_space=pl.ANY)] * nwin,
        out_specs=pl.BlockSpec(
            (TM, TN), lambda s, j, u, *_: (s * SG + u // C, j)
        ),
        scratch_shapes=[pltpu.VMEM((2, Wsg, TN), win_dtype)] * nwin
        + [pltpu.SemaphoreType.DMA((2,))] * nwin,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * TM, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=sg_vmem_limit(
                Wsg, Wc, TM, TN, nwin * np.dtype(win_dtype).itemsize
            )
        ),
        interpret=interpret,
    )


def spmm_window_pallas_sg_presplit_ab(
    ws, bases, ah, al, bh, bl, SG: int, Wsg: int, W: int, TM: int,
    TN: int | None = None, Wc: int | None = None, interpret: bool = False,
):
    """Super-grouped x3 SpMM, A and B both pre-split to bf16 hi/lo.

    ``bh``/``bl`` are (k_pad, n) bf16 with ``bh + bl ~ B`` (fp32, see
    :func:`split_b_bf16`).  Returns fp32 (G*TM, n).
    """
    import jax.numpy as jnp

    n_orig = bh.shape[1]
    if TN is None:
        TN = 256 if n_orig % 256 == 0 else 128
    if n_orig % TN:
        pad = ((0, 0), (0, TN - n_orig % TN))
        bh = jnp.pad(bh, pad)
        bl = jnp.pad(bl, pad)
    n = bh.shape[1]
    G = ah.shape[0]
    if Wc is None:
        _, Wc, _ = choose_chunks(W)
    C = W // Wc
    assert Wc * C == W and Wc % TK == 0, (W, Wc, C)
    sgc = len(bases)
    assert G == sgc * SG, (G, sgc, SG)

    kern = functools.partial(
        _window_kernel_sg_presplit_ab,
        Wsg=Wsg, Wc=Wc, TN=TN, NJ=n // TN, C=C, SG=SG,
    )
    fn = _sg_call(kern, 4, sgc, SG, C, n // TN, TM, TN, Wc, Wsg, G, n,
                  bh.dtype, 2, interpret)
    out = fn(jnp.asarray(ws), jnp.asarray(bases), ah, al, bh, bl)
    return out[:, :n_orig] if n != n_orig else out


def spmm_window_pallas_sg_bf16(
    ws, bases, ah, bh, SG: int, Wsg: int, W: int, TM: int,
    TN: int | None = None, Wc: int | None = None, interpret: bool = False,
):
    """Single-pass bf16 super-grouped SpMM (the speed-over-accuracy
    operating point, ~1e-3 relative): only the hi halves exist, so A
    traffic halves and the MXU does one pass."""
    import jax.numpy as jnp

    n_orig = bh.shape[1]
    if TN is None:
        TN = 256 if n_orig % 256 == 0 else 128
    if n_orig % TN:
        bh = jnp.pad(bh, ((0, 0), (0, TN - n_orig % TN)))
    n = bh.shape[1]
    G = ah.shape[0]
    if Wc is None:
        _, Wc, _ = choose_chunks(W)
    C = W // Wc
    assert Wc * C == W and Wc % TK == 0, (W, Wc, C)
    sgc = len(bases)
    assert G == sgc * SG, (G, sgc, SG)

    kern = functools.partial(
        _window_kernel_sg_bf16,
        Wsg=Wsg, Wc=Wc, TN=TN, NJ=n // TN, C=C, SG=SG,
    )
    fn = _sg_call(kern, 2, sgc, SG, C, n // TN, TM, TN, Wc, Wsg, G, n,
                  bh.dtype, 1, interpret)
    out = fn(jnp.asarray(ws), jnp.asarray(bases), ah, bh)
    return out[:, :n_orig] if n != n_orig else out


_BF16_CHUNK = 1 << 26  # 256 MB fp32 per slice


def np_bf16(x: np.ndarray) -> np.ndarray:
    """Host-side fp32 -> bf16 cast in bounded slices.

    One whole-array ufunc call allocates multi-GB temporaries whose
    first-touch page faults are pathologically slow on this VM (the r3
    init profile caught a 3.2 GB panel split at 252 s, >100x the
    steady-state rate); slicing keeps the working set small and lets the
    allocator reuse pages."""
    import ml_dtypes

    from .. import native

    got = native.bf16_cast(x)
    if got is not None:
        return got
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype=ml_dtypes.bfloat16)
    xf, of = x.reshape(-1), out.reshape(-1)
    for i in range(0, xf.size, _BF16_CHUNK):
        of[i : i + _BF16_CHUNK] = xf[i : i + _BF16_CHUNK].astype(
            ml_dtypes.bfloat16
        )
    return out


def np_split_bf16(x: np.ndarray):
    """Host-side bf16 hi/lo split, (ah, al) with ah + al ~= x, computed in
    bounded slices (see :func:`np_bf16` for why)."""
    import ml_dtypes

    from .. import native

    got = native.bf16_split(x)
    if got is not None:
        return got
    x = np.ascontiguousarray(x, dtype=np.float32)
    ah = np.empty(x.shape, dtype=ml_dtypes.bfloat16)
    al = np.empty(x.shape, dtype=ml_dtypes.bfloat16)
    xf = x.reshape(-1)
    ahf, alf = ah.reshape(-1), al.reshape(-1)
    for i in range(0, xf.size, _BF16_CHUNK):
        sl = xf[i : i + _BF16_CHUNK]
        hi = sl.astype(ml_dtypes.bfloat16)
        ahf[i : i + _BF16_CHUNK] = hi
        alf[i : i + _BF16_CHUNK] = (sl - hi.astype(np.float32)).astype(
            ml_dtypes.bfloat16
        )
    return ah, al


def split_b_bf16(b):
    """fp32 (k, n) -> (bh, bl) bf16 with bh + bl ~ b; XLA fuses this into
    the exchange epilogue, replacing the kernel's per-step VPU split.

    The hi part goes through ``lax.reduce_precision``, NOT a bf16
    round-trip: on TPU, XLA folds ``b - f32(bf16(b))`` to zero (measured:
    bl identically 0 on chip, silently degrading x3 to 1-pass accuracy),
    while reduce_precision is contractually exempt from such folding.
    """
    import jax
    import jax.numpy as jnp

    hi32 = jax.lax.reduce_precision(b, exponent_bits=8, mantissa_bits=7)
    bh = hi32.astype(jnp.bfloat16)          # exact: hi32 is bf16-precise
    bl = (b - hi32).astype(jnp.bfloat16)
    return bh, bl


def spmm_window_pallas_sg_presplit(
    ws, bases, ah, al, b, SG: int, Wsg: int, W: int, TM: int,
    TN: int | None = None, Wc: int | None = None, interpret: bool = False,
):
    """Super-grouped x3 SpMM with pack-time bf16-split A panels.

    ``Wc`` overrides the k-loop chunk rows (must divide W, TK-aligned) —
    under super-grouping B slices come from the resident super-window, so
    larger chunks only grow the A pipeline, not the B scratch.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_orig = b.shape[1]
    if TN is None:
        TN = 256 if n_orig % 256 == 0 else 128
    if n_orig % TN:
        b = jnp.pad(b, ((0, 0), (0, TN - n_orig % TN)))
    n = b.shape[1]
    G = ah.shape[0]
    if Wc is None:
        _, Wc, _ = choose_chunks(W)
    C = W // Wc
    assert Wc * C == W and Wc % TK == 0, (W, Wc, C)
    sgc = len(bases)
    assert G == sgc * SG, (G, sgc, SG)

    kern = functools.partial(
        _window_kernel_sg_presplit,
        Wsg=Wsg, Wc=Wc, TN=TN, NJ=n // TN, C=C, SG=SG,
    )
    a_spec = pl.BlockSpec(
        (1, TM, Wc), lambda s, j, u, *_: (s * SG + u // C, 0, u % C)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ws, bases
        grid=(sgc, n // TN, SG * C),
        in_specs=[a_spec, a_spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (TM, TN), lambda s, j, u, *_: (s * SG + u // C, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Wsg, TN), b.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * TM, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=sg_vmem_limit(Wsg, Wc, TM, TN, b.dtype.itemsize)
        ),
        interpret=interpret,
    )
    out = fn(jnp.asarray(ws), jnp.asarray(bases), ah, al, b)
    return out[:, :n_orig] if n != n_orig else out


def default_sg_budget() -> int:
    """Byte budget for the double-buffered B super-window slots.

    The v5e core has 128 MB of VMEM; Mosaic's default scoped limit is only
    ~16 MB, so the super-grouped kernels raise it via
    ``CompilerParams(vmem_limit_bytes=...)`` sized to what they allocate.
    48 MB of window slots leaves ample room for the A chunk pipeline, the
    resident C block, and Mosaic's accounting overhead.  Override with
    ``CRP_TPU_SG_BUDGET`` (bytes) to tune or to fall back to small windows.
    """
    import os

    return int(os.environ.get("CRP_TPU_SG_BUDGET", 48 << 20))


def sg_vmem_limit(Wsg: int, Wc: int, TM: int, TN: int, b_itemsize: int) -> int:
    """``vmem_limit_bytes`` for the sg kernels: window slots + double-
    buffered A chunk pipeline (hi/lo pair at worst) + C block, with 50%
    headroom for Mosaic's scoped accounting, clamped to [16, 120] MB."""
    need = (
        2 * Wsg * TN * b_itemsize      # window scratch slots
        + 4 * TM * Wc * 4              # A pipeline (2 bufs x hi/lo or fp32)
        + TM * TN * 4                  # resident output block
    )
    return int(min(max(int(need * 1.5), 16 << 20), 120 << 20))


def plan_supergroups(
    ws: np.ndarray, W: int, TN: int, itemsize: int,
    vmem_budget: int | None = None,
) -> tuple[int, int, np.ndarray] | None:
    """Pick the super-group size for window reuse.

    Consecutive row groups of a banded matrix share most of their B
    windows; loading one super-window per SG groups divides B traffic by
    ~SG.  Returns (SG, Wsg, bases) — or None when windows are
    non-monotone or reuse would not pay (SG < 2).
    """
    ws = np.asarray(ws, dtype=np.int64)
    if ws.size < 2 or np.any(np.diff(ws) < 0):
        return None
    if vmem_budget is None:
        vmem_budget = default_sg_budget()
    cap = vmem_budget // (2 * TN * itemsize)  # rows per super-window slot
    # measured on-chip: past ~24k-row super-windows, reuse is saturated and
    # wider slots only coarsen the DMA pipeline and add pad groups
    # (0.0071 -> 0.0086 s at the headline when bf16's 2-byte slots let SG
    # run to 122) — cap rows at the swept optimum regardless of itemsize
    cap = min(cap, 24576)
    G = ws.size

    def plan_for(SG):
        sgc = -(-G // SG)
        bases = ws[::SG][:sgc]
        spans = np.empty(sgc, dtype=np.int64)
        for s in range(sgc):
            hi = min((s + 1) * SG, G) - 1
            spans[s] = ws[hi] + W - bases[s]
        Wsg = int(-(-int(spans.max()) // TK) * TK)
        return SG, Wsg, bases.astype(np.int32), sgc

    feasible = []
    for SG in range(2, 129):
        got = plan_for(SG)
        if got[1] > cap:
            break
        feasible.append(got)
    if not feasible:
        return None
    # Objective: B traffic (sgc * Wsg rows per N tile) — but once reuse
    # saturates, squeezing the last few percent of traffic with a huge SG
    # is a measured LOSS (pad groups are pure wasted MXU work and wide
    # slots coarsen the DMA pipeline: 0.0071 -> 0.0086 s at the headline
    # when SG ran to 128).  So: among plans within 10% of the minimal
    # traffic, minimize pad groups (an exact divisor of G when feasible),
    # then SG.
    b_min = min(p[3] * p[1] for p in feasible)
    near = [p for p in feasible if p[3] * p[1] <= b_min + b_min // 10]
    SG, Wsg, bases, sgc = min(
        near, key=lambda p: (p[3] * p[0] - G, p[0])
    )
    return SG, Wsg, bases


def spmm_window_pallas_sg(
    packed: WindowDense, b, SG: int, Wsg: int, bases: np.ndarray,
    TN: int | None = None, Wc: int | None = None, compute_dtype=None,
    precision=None, interpret: bool = False,
):
    """Super-grouped windowed SpMM: one B super-window DMA feeds SG groups.

    B rows must reach ``max(bases) + Wsg`` (see ``pad_b_for_window_sg``).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    compute_dtype = compute_dtype or packed.tiles.dtype
    if precision is None:
        precision = (
            jax.lax.Precision.HIGHEST
            if np.dtype(compute_dtype) == np.float32
            else jax.lax.Precision.DEFAULT
        )
    n_orig = b.shape[1]
    if TN is None:
        TN = 256 if n_orig % 256 == 0 else 128
    if n_orig % TN:
        b = jnp.pad(b, ((0, 0), (0, TN - n_orig % TN)))
    n = b.shape[1]
    W, TM, G = packed.W, packed.TM, packed.G
    if Wc is None:
        _, Wc, _ = choose_chunks(W)
    C = W // Wc
    assert Wc * C == W and Wc % TK == 0, (W, Wc, C)
    sgc = len(bases)
    # callers pad G to a whole number of super-groups at pack time (zero
    # panels, window starts clamped) — arrays may be traced here
    assert G == sgc * SG, (G, sgc, SG)
    ws = packed.ws
    tiles = packed.tiles

    acc_dtype = (
        jnp.float64 if np.dtype(compute_dtype) == np.float64 else jnp.float32
    )
    kern = functools.partial(
        _window_kernel_sg,
        Wsg=Wsg, Wc=Wc, TN=TN, NJ=n // TN, C=C, SG=SG,
        compute_dtype=compute_dtype, precision=precision,
        acc_dtype=acc_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ws, bases
        grid=(sgc, n // TN, SG * C),
        in_specs=[
            pl.BlockSpec(
                (1, TM, Wc),
                lambda s, j, u, *_: (s * SG + u // C, 0, u % C),
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # B stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (TM, TN), lambda s, j, u, *_: (s * SG + u // C, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Wsg, TN), b.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * TM, n), acc_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=sg_vmem_limit(Wsg, Wc, TM, TN, b.dtype.itemsize)
        ),
        interpret=interpret,
    )
    out = fn(jnp.asarray(ws), jnp.asarray(bases), jnp.asarray(tiles), b)
    out = out[: G * TM]
    return out[:, :n_orig] if n != n_orig else out


def pad_b_for_window_sg(b: np.ndarray, bases: np.ndarray, Wsg: int) -> np.ndarray:
    need = int(np.max(bases)) + Wsg
    if b.shape[0] >= need:
        return b
    pad = np.zeros((need - b.shape[0], b.shape[1]), dtype=b.dtype)
    return np.concatenate([b, pad], axis=0)


def pad_b_for_window(b: np.ndarray, packed: WindowDense) -> np.ndarray:
    """Pad B rows so every window-chunk DMA is in-bounds (W already rounded
    to whole chunks at pack time; extra rows only meet zero A columns)."""
    need = int(packed.ws.max()) + packed.W
    if b.shape[0] >= need:
        return b
    pad = np.zeros((need - b.shape[0], b.shape[1]), dtype=b.dtype)
    return np.concatenate([b, pad], axis=0)
