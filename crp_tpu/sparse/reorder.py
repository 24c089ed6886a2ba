"""Matrix reordering for bandwidth reduction.

The reference offers METIS k-way partitioning with a symmetric permutation
applied in place (``examples/metis_mat_part.c:31-112``) and documents
MATLAB ``symrcm`` reordering as the alternative that shrinks planner windows
(``deprecated/SC23_AD/readme.md:95-102``; SC23 Fig. 7 shows reordered cage15
with pn halved at every n).

On TPU reordering matters twice: it reduces communicated elements (as in the
reference) *and* it shrinks the Pallas kernel's B windows (see
``kernels.spmm_pallas``), so RCM is the default pre-pass for unstructured
symmetric matrices.
"""

from __future__ import annotations

import logging

import numpy as np

from .csr import CSRMatrix

logger = logging.getLogger("crp_tpu")


def permute_symmetric(a: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    """Apply the symmetric permutation ``A' = A[perm][:, perm]``.

    ``perm[new] = old`` (scipy convention).  Equivalent to the reference's
    COO rebuild (``examples/metis_mat_part.c:66-112``).
    """
    perm = np.asarray(perm, dtype=np.int64)
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(len(perm))
    rows = np.repeat(np.arange(a.nrow), np.diff(a.rowptr))
    return CSRMatrix.from_coo(
        a.nrow, a.ncol, iperm[rows], iperm[a.colidx], a.val, dtype=a.val.dtype
    )


def rcm_reorder(a: CSRMatrix) -> tuple[CSRMatrix, np.ndarray]:
    """Reverse Cuthill-McKee reordering (the symrcm analog).

    Returns (permuted matrix, perm) with ``perm[new] = old``.
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    if a.nrow != a.ncol:
        raise ValueError("RCM reordering requires a square matrix")
    perm = np.asarray(
        reverse_cuthill_mckee(a.to_scipy(), symmetric_mode=True), dtype=np.int64
    )
    out = permute_symmetric(a, perm)
    logger.info(
        "RCM reorder: bandwidth %d -> %d", a.bandwidth(), out.bandwidth()
    )
    return out, perm


def metis_row_partition(
    a: CSRMatrix, nparts: int, imbalance: float = 1.05
) -> tuple[CSRMatrix, np.ndarray, np.ndarray]:
    """METIS k-way partition + symmetric permutation grouping parts.

    Mirrors ``METIS_row_partition`` (``examples/metis_mat_part.c:31-112``):
    partition the adjacency graph, sort vertices by part id, permute
    symmetrically, and return the per-part row displacements to seed the
    planner.  The reference sets ``METIS_OBJTYPE_VOL`` and a 5% imbalance
    (``metis_mat_part.c:47-57``); pymetis' ``part_graph`` exposes neither,
    so partitions here optimize edge-cut with METIS' default balance — the
    ``imbalance`` argument is honored only if the installed pymetis
    supports Options (newer releases), and ignored otherwise.

    Requires the optional ``pymetis`` package; environments without it
    should reorder with :func:`rcm_reorder` instead (the documented
    alternative, ``SC23_AD/readme.md:95-102``).
    """
    try:
        import pymetis
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "pymetis is not installed; use rcm_reorder() instead"
        ) from e
    if a.nrow != a.ncol:
        raise ValueError("METIS partitioning requires a symmetric matrix")
    adj = [
        a.colidx[a.rowptr[i]:a.rowptr[i + 1]].tolist() for i in range(a.nrow)
    ]
    kw = {}
    if hasattr(pymetis, "Options"):  # pragma: no cover - optional dependency
        try:
            opts = pymetis.Options()
            opts.ufactor = max(int(round((imbalance - 1.0) * 1000)), 1)
            kw["options"] = opts
        except (AttributeError, TypeError):
            pass
    _, parts = pymetis.part_graph(nparts, adjacency=adj, **kw)
    parts = np.asarray(parts)
    perm = np.argsort(parts, kind="stable").astype(np.int64)
    out = permute_symmetric(a, perm)
    counts = np.bincount(parts, minlength=nparts)
    displs = np.zeros(nparts + 1, dtype=np.int64)
    np.cumsum(counts, out=displs[1:])
    return out, perm, displs


def spectral_partition_rows(a: CSRMatrix, nparts: int) -> np.ndarray:
    """Degree-balanced fallback 1D partition for graph matrices without
    METIS: BFS-cluster rows after RCM.  Returns (nparts+1,) displacements."""
    from ..plan.partition1d import csr_row_partition

    return csr_row_partition(a.rowptr, nparts)
