"""Host-side CSR container.

The reference passes raw ``(rowptr, colidx, val)`` triples (int32 indices,
fp64 values) between all layers.  We wrap them in a small dataclass carrying
numpy arrays; device placement happens at engine-init time via plan-driven
packing, not here.

Invariant carried over from the reference: column indices within each row are
sorted ascending (``examples/mmio_utils.c:182-185``); the v1 bandwidth
planner relies on this (``deprecated/src/crpspmm.c:108``).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CSRMatrix:
    nrow: int
    ncol: int
    rowptr: np.ndarray  # (nrow+1,) int
    colidx: np.ndarray  # (nnz,) int
    val: np.ndarray     # (nnz,) float

    def __post_init__(self) -> None:
        self.rowptr = np.ascontiguousarray(self.rowptr)
        self.colidx = np.ascontiguousarray(self.colidx)
        self.val = np.ascontiguousarray(self.val)
        assert self.rowptr.shape == (self.nrow + 1,)
        assert self.colidx.shape[0] == self.rowptr[-1]
        assert self.val.shape == self.colidx.shape

    @property
    def nnz(self) -> int:
        return int(self.rowptr[-1])

    @classmethod
    def from_coo(
        cls,
        nrow: int,
        ncol: int,
        row: np.ndarray,
        col: np.ndarray,
        val: np.ndarray,
        dtype=np.float64,
    ) -> "CSRMatrix":
        """COO -> CSR with per-row column-sorted nonzeros.

        Same observable result as the reference's bucket sort + per-row
        quicksort (``examples/mmio_utils.c:148-190``); duplicates are kept
        (the reference never deduplicates).
        """
        row = np.asarray(row, dtype=np.int64)
        col = np.asarray(col, dtype=np.int64)
        val = np.asarray(val, dtype=dtype)
        if np.dtype(dtype) == np.float64 and len(row) > 100_000:
            from .. import native

            res = native.coo2csr(nrow, ncol, row, col, val)
            if res is not None:
                rowptr, colidx, csrval = res
                return cls(nrow, ncol, rowptr, colidx, csrval)
        order = np.lexsort((col, row))
        row, col, val = row[order], col[order], val[order]
        rowptr = np.zeros(nrow + 1, dtype=np.int64)
        np.add.at(rowptr, row + 1, 1)
        np.cumsum(rowptr, out=rowptr)
        return cls(nrow, ncol, rowptr, col.astype(np.int32), val)

    @classmethod
    def from_scipy(cls, mat, dtype=np.float64) -> "CSRMatrix":
        csr = mat.tocsr()
        csr.sort_indices()
        return cls(
            csr.shape[0],
            csr.shape[1],
            csr.indptr.astype(np.int64),
            csr.indices.astype(np.int32),
            csr.data.astype(dtype),
        )

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix(
            (self.val, self.colidx, self.rowptr), shape=(self.nrow, self.ncol)
        )

    def row_slice(self, srow: int, erow: int) -> "CSRMatrix":
        """Rows [srow, erow) as a standalone CSR block (rowptr rebased to 0)."""
        s, e = int(self.rowptr[srow]), int(self.rowptr[erow])
        return CSRMatrix(
            erow - srow,
            self.ncol,
            self.rowptr[srow : erow + 1] - self.rowptr[srow],
            self.colidx[s:e].copy(),
            self.val[s:e].copy(),
        )

    def localize(self) -> tuple["CSRMatrix", int, int]:
        """Shrink the column window to [min colidx, max colidx].

        Returns (shifted matrix, window start, window size).  Mirrors the A
        localization in ``rp_spmm_init`` (``src/rowpara_spmm.c:46-77``).
        """
        if self.nnz == 0:
            return CSRMatrix(self.nrow, 0, self.rowptr.copy(),
                             self.colidx.copy(), self.val.copy()), 0, 0
        srow = int(self.colidx.min())
        erow = int(self.colidx.max())
        w = erow - srow + 1
        return (
            CSRMatrix(self.nrow, w, self.rowptr.copy(),
                      (self.colidx - srow).astype(self.colidx.dtype), self.val.copy()),
            srow,
            w,
        )

    def to_bcoo(self, dtype=None):
        """``jax.experimental.sparse.BCOO`` view — JAX-ecosystem interop.

        The reference interops through raw CSR triples into MKL/cuSPARSE
        (``src/rowpara_spmm.c:398-407``); the JAX-native exchange format
        is BCOO.  Indices come out sorted (the CSR invariant), so
        downstream ``sparse.bcoo_dot_general`` can skip the sort.
        """
        import jax.numpy as jnp
        from jax.experimental import sparse as jsparse

        rows = np.repeat(
            np.arange(self.nrow, dtype=np.int32), np.diff(self.rowptr)
        )
        idx = np.stack([rows, self.colidx.astype(np.int32)], axis=1)
        v = self.val if dtype is None else np.asarray(self.val, dtype)
        return jsparse.BCOO(
            (jnp.asarray(v), jnp.asarray(idx)),
            shape=(self.nrow, self.ncol),
            # sortedness is the CSR invariant; uniqueness is NOT
            # guaranteed (from_coo keeps duplicates like the reference)
            indices_sorted=True, unique_indices=False,
        )

    @classmethod
    def from_bcoo(cls, mat, dtype=np.float64) -> "CSRMatrix":
        """Build from a ``jax.experimental.sparse.BCOO`` matrix (host copy;
        indices are sorted by ``from_coo``, duplicates kept)."""
        idx = np.asarray(mat.indices)
        return cls.from_coo(
            int(mat.shape[0]), int(mat.shape[1]),
            idx[:, 0].astype(np.int64), idx[:, 1].astype(np.int64),
            np.asarray(mat.data, dtype=dtype),
        )

    def transpose(self) -> "CSRMatrix":
        """A^T as CSR — counting sort by column, O(nnz).

        The stable sort keeps column indices within each transposed row
        ascending, preserving the sortedness invariant the v1 planner
        relies on (``deprecated/src/crpspmm.c:108``).  Used by the
        differentiable SpMM wrapper (dB = A^T @ dC); the reference has no
        transpose (MKL/cuSPARSE take an op(A) flag instead —
        ``src/rowpara_spmm.c:398-407`` always passes non-transposed).
        """
        rows = np.repeat(
            np.arange(self.nrow, dtype=np.int64), np.diff(self.rowptr)
        )
        order = np.argsort(self.colidx, kind="stable")
        t_rowptr = np.zeros(self.ncol + 1, dtype=np.int64)
        np.cumsum(
            np.bincount(self.colidx, minlength=self.ncol),
            out=t_rowptr[1:],
        )
        return CSRMatrix(
            self.ncol, self.nrow, t_rowptr,
            rows[order].astype(self.colidx.dtype), self.val[order],
        )

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.nrow, self.ncol), dtype=self.val.dtype)
        row = np.repeat(np.arange(self.nrow), np.diff(self.rowptr))
        np.add.at(out, (row, self.colidx), self.val)
        return out

    def spmm_ref(self, b: np.ndarray) -> np.ndarray:
        """Host fp64 reference C := A @ B (the ``mkl_csr_spmm`` analog,
        ``examples/test_utils.c:156-179``)."""
        return self.to_scipy().astype(np.float64) @ np.asarray(b, dtype=np.float64)

    def bandwidth(self) -> int:
        """Max |col - row| over nonzeros (printed by ``read_mtx_csr``,
        ``examples/test_utils.c:37-47``)."""
        if self.nnz == 0:
            return 0
        row = np.repeat(np.arange(self.nrow), np.diff(self.rowptr))
        return int(np.abs(self.colidx - row).max())

    def row_col_ranges_v1(self) -> np.ndarray:
        """(nrow, 2) per-row [min, max] colidx exactly as the v1 engine
        assembles ``A_cidx_se_glb`` (``deprecated/src/crpspmm.c:111-117``):
        row i's entries read ``colidx[rowptr[i]]`` and
        ``colidx[rowptr[i+1]-1]`` even for EMPTY rows — pulling the
        neighbouring rows' columns.  The bandwidth planner's window costs
        and the v1 engine's coarse exchange windows (``crpspmm.c:216-225``)
        depend on this quirk, so decision parity requires it.  Reads that
        the reference leaves out-of-bounds (leading/trailing empty rows)
        are clipped in-range here.
        """
        out = np.empty((self.nrow, 2), dtype=np.int64)
        nnz = self.nnz
        if nnz == 0:
            out[:, 0] = self.ncol
            out[:, 1] = -1
            return out
        out[:, 0] = self.colidx[np.minimum(self.rowptr[:-1], nnz - 1)]
        out[:, 1] = self.colidx[np.maximum(self.rowptr[1:] - 1, 0)]
        return out

    def row_col_ranges(self) -> np.ndarray:
        """(nrow, 2) per-row [min colidx, max colidx] (undefined for empty rows).

        The v1 planner's bandwidth cost uses these ranges
        (``deprecated/src/crpspmm.c:107-131``).  Empty rows get an empty
        range [ncol, -1] so min/max reductions over panels ignore them.
        """
        ranges = np.empty((self.nrow, 2), dtype=np.int64)
        ranges[:, 0] = self.ncol
        ranges[:, 1] = -1
        counts = np.diff(self.rowptr)
        nonempty = counts > 0
        starts = self.rowptr[:-1][nonempty]
        ends = self.rowptr[1:][nonempty] - 1
        # colidx sorted per row -> first nnz is min, last is max
        ranges[nonempty, 0] = self.colidx[starts]
        ranges[nonempty, 1] = self.colidx[ends]
        return ranges
