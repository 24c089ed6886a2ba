"""Local-kernel selection shared by the engines.

The engines are agnostic to the local SpMM implementation (the reference has
the same seam: MKL vs cuSPARSE, ``src/rowpara_spmm.c:386-413``).  A kernel
kind packs per-shard compact CSR into stacked device arrays at init and
returns a per-shard compute closure used inside shard_map.

Kinds:
  * "segsum" — gather + sorted segment-sum (default; exact everywhere)
  * "ell"    — ELL slot scan (bounded-nnz/row matrices; O(m*n) memory)
  * "pallas" — MXU windowed-ELL Pallas kernel (TPU)
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .spmm_jnp import DeviceCSR, pack_device_csr, spmm_segment_sum
from .spmm_ell import pack_ell, spmm_ell


def pack_local_kernel(
    shards: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_m: int,
    dtype,
    kind: str = "segsum",
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
        L = max(max(int(np.diff(r).max()) for r, _, _ in shards), 1)
        cols, vals = [], []
        for rowptr, cc, v in shards:
            c, vv = pack_ell(rowptr, cc, v.astype(dtype), max_m, L=L)
            cols.append(c); vals.append(vv)
        arrays = (np.stack(cols), np.stack(vals))

        def local_fn(arrs, rB):
            return spmm_ell(arrs[0], arrs[1], rB)

        return arrays, local_fn

    if kind == "pallas":
        from .spmm_pallas import pack_pallas_kernel

        return pack_pallas_kernel(shards, max_m, dtype)

    raise ValueError(f"unknown local SpMM kernel kind {kind!r}")
