"""Local CSR x dense SpMM — Pallas MXU kernel (windowed dense-tile).

This is the accelerator kernel replacing the reference's MKL
(``src/rowpara_spmm.c:398-407``) and cuSPARSE
(``deprecated/src/cuda_proxy.cu:122-182``) local SpMM, designed for the MXU
rather than translated:

  * rows are processed in groups of ``TM``; after the planner's rB
    compaction (``rB_reidx``) each group's referenced B rows fall in a
    contiguous *window* [min tile, max tile] of 128-row tiles;
  * at pack time (host) the group's nonzeros are densified into
    ``(TM, 128)`` A tiles covering the window — zero tiles stay, but only
    within the window, so storage ~ m x window_width, not m x k;
  * at exec time the kernel DMAs the B window for the group from HBM into
    VMEM (start row is scalar-prefetched — windows are data-dependent,
    which BlockSpec index maps cannot express) and runs
    ``C_tile += A_tile @ B_tile`` on the MXU per window tile;
  * HBM traffic ~ dense-window A (read once) + one window sweep of B + one
    C write; FLOPs ~ m x window x n — both set by the matrix bandwidth,
    which is exactly what the planner/reordering layers minimize.

Precision: for fp32 data the MXU computes via bf16 passes;
``precision=HIGHEST`` reproduces fp32 (~6x MXU cost), DEFAULT is one bf16
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

TK = 128  # B tile rows (MXU contraction dim)


class UnsupportedSparsity(ValueError):
    """Shard shape does not fit the windowed kernel; use a fallback."""


@dataclasses.dataclass
class WindowDense:
    """Host-side packed form of one shard for the windowed kernel."""

    nrow: int            # rows covered (G * TM >= nrow)
    ncol: int            # rB rows (gather space)
    TM: int
    G: int               # row groups
    T: int               # window tiles per group (W // TK)
    W: int               # window rows (multiple of TK)
    ws: np.ndarray       # (G,) int32 window start row (multiple of TK)
    tiles: np.ndarray    # (G, T, TM, TK) dense A tiles

    @property
    def padded_bytes(self) -> int:
        return self.tiles.nbytes


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
    """Densify a CSR shard into per-group window tiles.

    Raises UnsupportedSparsity when any group's window exceeds ``max_window``
    rows or the dense tiles exceed ``max_expand_bytes``.
    """
    nrow = len(rowptr) - 1
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    nnz = int(rowptr[-1])
    if nnz == 0:
        raise UnsupportedSparsity("empty shard")
    G = -(-nrow // TM)

    # per-group [min, max] column tile from per-row ranges (cols sorted per
    # row -> first/last nnz of the row are its extrema); O(nrow), no nnz pass
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
    W = int(((max_t - min_t + 1).max()) * TK)
    if W > max_window:
        raise UnsupportedSparsity(f"window {W} rows > cap {max_window}")
    T = W // TK

    tile_bytes = G * T * TM * TK * np.dtype(dtype).itemsize
    if tile_bytes > max_expand_bytes:
        raise UnsupportedSparsity(
            f"dense window tiles {tile_bytes >> 20} MiB > cap"
        )

    if np.dtype(dtype) == np.float32:
        from .. import native

        res = native.pack_window_f32(
            nrow, ncol, rowptr, colidx, np.asarray(val, np.float32),
            TM, TK, max_window, G, T,
        )
        if res is not None:
            ws_n, tiles, w_n = res
            assert w_n == W, (w_n, W)
            return WindowDense(
                nrow=nrow, ncol=ncol, TM=TM, G=G, T=T, W=W,
                ws=ws_n, tiles=tiles,
            )

    r = np.repeat(np.arange(nrow, dtype=np.int64), counts)
    c = np.asarray(colidx, dtype=np.int64)
    v = np.asarray(val, dtype=dtype)
    g = r // TM
    t = c // TK
    tiles = np.zeros((G, T, TM, TK), dtype=dtype)
    # flat scatter: tile (g, t - min_t[g]), position (r % TM, c % TK)
    flat = (
        ((g * T + (t - min_t[g])) * TM + (r % TM)) * TK + (c % TK)
    )
    np.add.at(tiles.reshape(-1), flat, v)  # add: duplicates accumulate

    return WindowDense(
        nrow=nrow, ncol=ncol, TM=TM, G=G, T=T, W=W,
        ws=(min_t * TK).astype(np.int32), tiles=tiles,
    )


def _window_kernel(
    ws_ref, tiles_ref, b_hbm, o_ref, window, sem,
    *, W, TM, TN, T, NJ, nbuf, compute_dtype, precision, acc_dtype,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    jn = pl.program_id(1)
    step = g * NJ + jn

    def window_dma(s, slot):
        """DMA of step s's B window into buffer ``slot``."""
        gg = s // NJ
        jj = s - gg * NJ
        return pltpu.make_async_copy(
            b_hbm.at[
                pl.ds(pl.multiple_of(ws_ref[gg], TK), W),
                pl.ds(pl.multiple_of(jj * TN, TN), TN),
            ],
            window.at[slot],
            sem.at[slot],
        )

    if nbuf == 2:
        # double-buffered across sequential grid steps: scratch persists, so
        # step s computes from slot s%2 while step s+1's window streams into
        # the other slot (the manual DMA is otherwise serialized with the
        # MXU loop — measured 75 GB/s effective without this)
        @pl.when(step == 0)
        def _():
            window_dma(0, 0).start()

        @pl.when(step + 1 < pl.num_programs(0) * NJ)
        def _():
            window_dma(step + 1, (step + 1) % 2).start()

        slot = step % 2
        window_dma(step, slot).wait()
    else:
        slot = 0
        dma = window_dma(step, slot)
        dma.start()
        dma.wait()

    def tile_body(ti, acc):
        bt = window[slot, pl.ds(pl.multiple_of(ti * TK, TK), TK), :]
        at = tiles_ref[0, ti]
        return acc + jnp.dot(
            at.astype(compute_dtype), bt.astype(compute_dtype),
            preferred_element_type=acc_dtype,
            precision=precision,
        )

    acc = jax.lax.fori_loop(
        0, T, tile_body, jnp.zeros((TM, TN), dtype=acc_dtype)
    )
    o_ref[:] = acc.astype(o_ref.dtype)


def spmm_window_pallas(
    packed: WindowDense, b, TN: int = 128, compute_dtype=None, precision=None,
    interpret: bool = False,
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
    if n_orig % TN:
        b = jnp.pad(b, ((0, 0), (0, TN - n_orig % TN)))
    n = b.shape[1]
    acc_dtype = (
        jnp.float64 if np.dtype(compute_dtype) == np.float64 else jnp.float32
    )
    # double-buffer the B window when both slots + the pipelined A blocks
    # fit in VMEM (~16 MB/core); fall back to one slot for wide windows
    itemsize = np.dtype(b.dtype).itemsize
    vmem_need = (
        2 * packed.W * TN * itemsize                      # window slots
        + 2 * packed.T * packed.TM * TK * packed.tiles.dtype.itemsize  # A pipe
        + 2 * packed.TM * TN * np.dtype(acc_dtype).itemsize
    )
    nbuf = 2 if vmem_need <= 14 * 2**20 else 1
    kern = functools.partial(
        _window_kernel,
        W=packed.W, TM=packed.TM, TN=TN, T=packed.T, NJ=n // TN, nbuf=nbuf,
        compute_dtype=compute_dtype, precision=precision,
        acc_dtype=acc_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # ws
        grid=(packed.G, n // TN),
        in_specs=[
            pl.BlockSpec(
                (1, packed.T, packed.TM, TK),
                lambda g, j, *_: (g, 0, 0, 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # B stays in HBM
        ],
        out_specs=pl.BlockSpec((packed.TM, TN), lambda g, j, *_: (g, j)),
        scratch_shapes=[
            pltpu.VMEM((nbuf, packed.W, TN), b.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((packed.G * packed.TM, n), acc_dtype),
        interpret=interpret,
    )
    out = fn(jnp.asarray(packed.ws), jnp.asarray(packed.tiles), b)
    return out[:, :n_orig] if n != n_orig else out


def pad_b_for_window(b: np.ndarray, packed: WindowDense) -> np.ndarray:
    """Pad B rows so every window DMA is in-bounds."""
    need = int(packed.ws.max()) + packed.W
    if b.shape[0] >= need:
        return b
    pad = np.zeros((need - b.shape[0], b.shape[1]), dtype=b.dtype)
    return np.concatenate([b, pad], axis=0)
