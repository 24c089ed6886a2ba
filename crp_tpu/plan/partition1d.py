"""1D nnz-balanced row partitioning and exact communication-volume counting.

Re-implements the semantics (not the code) of the reference planner layer
``src/spmat_part.c``:

* ``csr_row_partition``      — nnz-balanced contiguous row blocks found by a
  binary search on the rowptr for each block's nnz quota
  (``src/spmat_part.c:12-35``).
* ``csr_row_part_comm_size`` — the *exact* SpMV communication volume per row
  block: number of distinct columns touched by the block minus the distinct
  touched columns the block already owns (``src/spmat_part.c:38-64``).
* ``prime_factorization``    — ``src/spmat_part.c:66-81``.

Parity note: the reference's binary search breaks early when it lands on an
exact rowptr == quota match, which with duplicated rowptr values (empty rows)
can return a *different* boundary than a plain lower bound.  Planner-oracle
tests require byte-identical boundaries, so the same trajectory is
reproduced here.
"""

from __future__ import annotations

import numpy as np


def _nnz_quota_lower_bound(rowptr: np.ndarray, nrow: int, target: int) -> int:
    """The reference's binary search: first index st with rowptr[st] >= target,
    except it stops at whatever mid first hits equality."""
    st, end = 0, nrow
    while st < end:
        mid = (st + end) // 2
        v = rowptr[mid]
        if v == target:
            return mid
        if v < target:
            st = mid + 1
        else:
            end = mid
    return st


def csr_row_partition(rowptr: np.ndarray, nblk: int) -> np.ndarray:
    """nnz-balanced row blocks.  Returns ``rblk_ptr`` of shape (nblk+1,)."""
    rowptr = np.asarray(rowptr)
    nrow = rowptr.shape[0] - 1
    nnz = int(rowptr[nrow])
    out = np.empty(nblk + 1, dtype=np.int64)
    out[0] = 0
    for i in range(nblk):
        target = nnz if i == nblk - 1 else (nnz // nblk) * (i + 1)
        out[i + 1] = _nnz_quota_lower_bound(rowptr, nrow, target)
    return out


def csr_row_part_comm_size(
    ncol: int,
    rowptr: np.ndarray,
    colidx: np.ndarray,
    rblk_ptr: np.ndarray,
    x_displs: np.ndarray,
) -> tuple[np.ndarray, int]:
    """Exact SpMV comm volume per row block.

    For block i owning x rows ``[x_displs[i], x_displs[i+1])``:
    ``comm_sizes[i] = #distinct cols touched by rows [rblk_ptr[i], rblk_ptr[i+1])
    - #distinct touched cols within the owned range``.

    Vectorized equivalent of the reference's per-thread byte-flag counting
    (``src/spmat_part.c:38-64``): one sort over (block, col) pairs instead of
    nblk column-flag sweeps.
    """
    rowptr = np.asarray(rowptr)
    colidx = np.asarray(colidx)
    rblk_ptr = np.asarray(rblk_ptr, dtype=np.int64)
    x_displs = np.asarray(x_displs, dtype=np.int64)
    nblk = rblk_ptr.shape[0] - 1

    nnz_bounds = rowptr[rblk_ptr].astype(np.int64)  # (nblk+1,) nnz offset of each block

    from .. import native

    res = native.comm_size(ncol, nnz_bounds, colidx, x_displs)
    if res is not None:
        return res
    counts = np.diff(nnz_bounds)
    blk_ids = np.repeat(np.arange(nblk, dtype=np.int64), counts)
    keys = blk_ids * np.int64(ncol) + colidx[nnz_bounds[0]:nnz_bounds[-1]].astype(np.int64)
    uniq = np.unique(keys)
    ub = uniq // ncol
    uc = uniq - ub * ncol
    comm_sizes = np.bincount(ub, minlength=nblk).astype(np.int64)
    owned = (uc >= x_displs[ub]) & (uc < x_displs[ub + 1])
    comm_sizes -= np.bincount(ub[owned], minlength=nblk).astype(np.int64)
    return comm_sizes, int(comm_sizes.sum())


def prime_factorization(n: int) -> list[int]:
    """Prime factors of n, ascending."""
    fac = []
    c = 2
    while n > 1:
        if n % c == 0:
            fac.append(c)
            n //= c
        else:
            c += 1
    return fac
