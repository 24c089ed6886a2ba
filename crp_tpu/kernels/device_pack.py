"""Device-side panel densification (``CRP_TPU_DEVICE_PACK``).

Engine init on the relay-tunneled chip is dominated by uploading the
multi-GB dense A panels at ~25 MB/s while the CSR itself is ~20-50x
smaller.  These helpers upload only the O(nnz) flat scatter positions +
values and densify ON DEVICE: a sorted-unique XLA scatter at HBM rate,
followed by the ``lax.reduce_precision`` RNE hi/lo bf16 split —
bit-identical to the native host pack (``fastops.cpp:split_bf16_one``;
``tests/test_device_pack.py`` pins parity).  The reference has no
analog: MKL consumes CSR in place (``src/rowpara_spmm.c:398-407``); this
is the TPU version of "the accelerator owns the layout".

Two fills share one jitted program:

* uniform windows (``dispatch._pack_uniform_single_bf16``): the flat
  index ``r*W + (c - ws[g])`` is strictly increasing for a per-row-
  sorted duplicate-free CSR — no sort needed;
* ragged chunk panels (``spmm_ragged.pack_ragged_window_bf16``): chunk
  panels interleave across rows, so the positions are argsorted on the
  host first (O(nnz log nnz), still far cheaper than uploading panels).

Safety: duplicate / per-row-unsorted CSR, a device-memory budget
(``CRP_TPU_DEVICE_PACK_BUDGET_GB``), and any device/compile error all
fall back to the native host pack.
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger("crp_tpu")

_FILL_JIT = None


def enabled() -> bool:
    """CRP_TPU_DEVICE_PACK: 1 force, 0 disable, auto (default) = TPU only."""
    import jax

    v = os.environ.get("CRP_TPU_DEVICE_PACK", "auto")
    if v == "auto":
        return jax.default_backend() == "tpu"
    return v == "1"


def _budget_bytes() -> float:
    return float(
        os.environ.get("CRP_TPU_DEVICE_PACK_BUDGET_GB", 12)
    ) * (1 << 30)


def fill_panels(flat, vals, n_panels, tm, w, mode):
    """Sorted-unique scatter of ``vals`` at ``flat`` into zeroed
    ``(n_panels, tm, w)`` fp32 panels; ``mode``: "f32" returns them as
    is, "bf16" the RNE hi half, "pair" the hi/lo bf16 pair.

    ``flat`` MUST be strictly increasing (caller's contract).  Returns
    committed jax arrays ``(ah, al_or_None)``; raises on device errors
    (callers catch and fall back to the host pack).
    """
    global _FILL_JIT
    import jax

    if _FILL_JIT is None:
        import jax.numpy as jnp

        def fill(flat_d, vals_d, *, n_panels, tm, w, mode):
            t = jnp.zeros(n_panels * tm * w, jnp.float32)
            t = t.at[flat_d].set(
                vals_d, indices_are_sorted=True, unique_indices=True
            )
            t = t.reshape(n_panels, tm, w)
            if mode == "f32":
                return t, None
            hi32 = jax.lax.reduce_precision(
                t, exponent_bits=8, mantissa_bits=7
            )
            ah = hi32.astype(jnp.bfloat16)
            if mode == "bf16":
                return ah, None
            al = (t - hi32).astype(jnp.bfloat16)
            return ah, al

        _FILL_JIT = jax.jit(
            fill, static_argnames=("n_panels", "tm", "w", "mode")
        )
    ah, al = _FILL_JIT(
        flat, vals, n_panels=int(n_panels), tm=int(tm), w=int(w), mode=mode,
    )
    ah.block_until_ready()
    return ah, al


def _split_mode(split) -> str:
    return "pair" if split else "bf16"


def _fits_budget(n_panels, tm, w, mode) -> bool:
    f32_bytes = int(n_panels) * int(tm) * int(w) * 4
    out_bytes = {"f32": 0, "bf16": f32_bytes // 2, "pair": f32_bytes}[mode]
    return f32_bytes + out_bytes <= _budget_bytes()


def _index_dtype(total):
    return np.int32 if total < np.iinfo(np.int32).max else np.int64


def uniform_fill(rowptr64, cc, v, nrow, TM, W, G_sg, ws_shard, mode):
    """Uniform-window device densify; see ``dispatch`` for the callers.

    ``mode``: "pair" (x3 hi/lo), "bf16" (1-pass), "f32" (HIGHEST).
    Returns (ws_full, ah, al_or_None) or None when the shard is
    unsuitable (unsorted/duplicate entries, offset overflow, budget).
    """
    total = G_sg * TM * W
    if not _fits_budget(G_sg, TM, W, mode):
        return None
    if int(rowptr64[0]) != 0:
        return None
    counts = np.diff(rowptr64)
    r = np.repeat(np.arange(nrow, dtype=np.int64), counts)
    off = cc.astype(np.int64) - ws_shard.astype(np.int64)[r // TM]
    if len(off) and (int(off.min()) < 0 or int(off.max()) >= W):
        return None  # extents disagree with the data (unsorted rows)
    flat = r * W + off
    if np.any(np.diff(flat) <= 0):
        return None  # duplicates or per-row-unsorted columns
    flat = flat.astype(_index_dtype(total))
    vals = np.asarray(v, np.float32)
    try:
        ah, al = fill_panels(flat, vals, G_sg, TM, W, mode)
    except Exception as e:  # relay/compile hiccup: host pack still works
        logger.warning("device pack failed (%s); using the host pack", e)
        return None
    ws_full = np.zeros(G_sg, dtype=np.int32)
    G0 = -(-nrow // TM)
    ws_full[:G0] = ws_shard
    return ws_full, ah, al


def uniform_fill_bf16(rowptr64, cc, v, nrow, TM, W, G_sg, ws_shard, split):
    return uniform_fill(
        rowptr64, cc, v, nrow, TM, W, G_sg, ws_shard, _split_mode(split)
    )


def ragged_fill_bf16(rowptr, colidx, val, TM, Wc, G, starts, group_ptr,
                     split):
    """Ragged chunk-panel device densify + host spill extraction.

    Mirrors the native ``ragged_fill_bf16`` semantics: every nnz whose
    column lands inside one of its group's kept chunks goes to that
    chunk's panel (dropped-chunk nnz inside a kept chunk's range are
    absorbed); the rest spill to COO.  Returns
    (ah, al_or_None, sp_rows, sp_cols, sp_vals) or None.
    """
    S = len(starts)
    mode = _split_mode(split)
    if not _fits_budget(S, TM, Wc, mode):
        return None
    if int(rowptr[0]) != 0:
        return None
    nrow = len(rowptr) - 1
    total = S * TM * Wc
    counts = np.diff(rowptr)
    r_all = np.repeat(np.arange(nrow, dtype=np.int64), counts)
    g_all = r_all // TM
    cols = colidx.astype(np.int64)
    starts64 = starts.astype(np.int64)
    # per-group chunk search in ONE searchsorted: key = g*M + col with
    # M > any col + Wc keeps groups' key ranges disjoint and ordered
    M = int(cols.max(initial=0)) + Wc + 1
    chunk_group = (
        np.searchsorted(group_ptr, np.arange(S), side="right") - 1
    ).astype(np.int64)
    keys = chunk_group * M + starts64
    if np.any(np.diff(keys) <= 0):
        return None  # malformed cover (starts not ascending per group)
    ch = np.searchsorted(keys, g_all * M + cols, side="right") - 1
    inside = ch >= 0
    chc = np.clip(ch, 0, None)
    inside &= chunk_group[chc] == g_all
    off = cols - starts64[chc]
    inside &= (off >= 0) & (off < Wc)
    pi = np.flatnonzero(inside)
    flat = (chc[pi] * TM + (r_all[pi] - g_all[pi] * TM)) * Wc + off[pi]
    # chunk panels interleave across rows: restore sortedness on host
    order = np.argsort(flat, kind="stable")
    flat = flat[order]
    if np.any(np.diff(flat) <= 0):
        return None  # duplicate (row, col) entries
    vals = np.asarray(val, np.float32)[pi[order]]
    flat = flat.astype(_index_dtype(total))
    try:
        ah, al = fill_panels(flat, vals, S, TM, Wc, mode)
    except Exception as e:
        logger.warning("device ragged pack failed (%s); using host", e)
        return None
    si = np.flatnonzero(~inside)
    sp_rows = r_all[si].astype(np.int32)
    sp_cols = colidx[si].astype(np.int32)
    sp_vals = np.asarray(val, np.float32)[si]
    return ah, al, sp_rows, sp_cols, sp_vals
