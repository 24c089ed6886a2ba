"""Matrix Market I/O.

The reference bundles NIST's mmio plus helpers that read real/pattern/integer
sparse matrices, 0-base the indices, mirror off-diagonal entries of symmetric
matrices, and convert to column-sorted CSR
(``examples/mmio_utils.c:11-125,148-190``).  Here scipy's C reader does the
parsing (it applies the same symmetric expansion); a native C++ reader can be
swapped in via ``crp_tpu.native`` for large files.
"""

from __future__ import annotations

import logging

import numpy as np

from .csr import CSRMatrix

logger = logging.getLogger("crp_tpu")


def mm_read_sparse(fname: str, need_symm: bool = False, dtype=np.float64) -> CSRMatrix:
    """Read a sparse .mtx file into column-sorted CSR.

    ``need_symm`` mirrors the METIS drivers' requirement that the matrix be
    stored symmetric (``examples/mmio_utils.c:35-41``).
    """
    with open(fname, "rb") as f:
        header = f.readline().decode("latin1").lower()
    is_symm = "symmetric" in header
    if need_symm and not is_symm:
        raise ValueError(f"{fname}: matrix is not symmetric")

    from .. import native

    res = native.mtx_read(fname)
    if res is not None:
        nrow, ncol, rows, cols, vals = res
        return CSRMatrix.from_coo(nrow, ncol, rows, cols, vals, dtype=dtype)

    import scipy.io

    mat = scipy.io.mmread(fname)  # COO, symmetric storage already expanded
    coo = mat.tocoo()
    return CSRMatrix.from_coo(
        coo.shape[0], coo.shape[1], coo.row, coo.col, coo.data, dtype=dtype
    )


def read_mtx_csr(
    fname: str, need_symm: bool = False, glb_n: int = 0, dtype=np.float64, quiet: bool = False
) -> CSRMatrix:
    """Read + report, like the reference's ``read_mtx_csr``
    (``examples/test_utils.c:21-55``) which prints size, nnz, and bandwidth."""
    a = mm_read_sparse(fname, need_symm=need_symm, dtype=dtype)
    if not quiet:
        logger.info(
            "Read %s: %d x %d, nnz = %d (%.1f per row), bandwidth = %d",
            fname, a.nrow, a.ncol, a.nnz, a.nnz / max(a.nrow, 1), a.bandwidth(),
        )
    return a


def write_mtx(fname: str, a: CSRMatrix) -> None:
    import scipy.io

    scipy.io.mmwrite(fname, a.to_scipy())
