"""Deterministic synthetic sparse matrices for tests and benchmarks.

The reference benches on SuiteSparse downloads (pwtk, cage15, com-Orkut,
amazon, nm7 — ``deprecated/SC23_AD/readme.md:15-28``).  This environment has
no network egress, so the bench harness generates matrices with matching
structural statistics instead: banded FEM-like matrices (pwtk-class) and
power-law graph matrices (com-Orkut-class).  Fixed seeds keep every run
byte-identical.
"""

from __future__ import annotations

import numpy as np

from .csr import CSRMatrix


def banded_random_csr(
    n: int,
    nnz_per_row: int = 53,
    bandwidth: int = 2500,
    seed: int = 1234,
    dtype=np.float64,
) -> CSRMatrix:
    """Banded random matrix ~ pwtk-class (217918^2, 53.4 nnz/row, banded).

    Each row gets ``nnz_per_row`` distinct columns uniform in a window of
    ``bandwidth`` around the diagonal (clipped to [0, n)), plus the diagonal.
    """
    rng = np.random.default_rng(seed)
    k = max(1, nnz_per_row - 1)
    offsets = rng.integers(-bandwidth, bandwidth + 1, size=(n, k))
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = np.clip(rows + offsets.ravel(), 0, n - 1)
    # add the diagonal
    rows = np.concatenate([rows, np.arange(n, dtype=np.int64)])
    cols = np.concatenate([cols, np.arange(n, dtype=np.int64)])
    # dedupe (reference matrices have no duplicates)
    key = rows * n + cols
    _, uniq_idx = np.unique(key, return_index=True)
    rows, cols = rows[uniq_idx], cols[uniq_idx]
    vals = rng.standard_normal(rows.shape[0]).astype(dtype)
    return CSRMatrix.from_coo(n, n, rows, cols, vals, dtype=dtype)


def powerlaw_random_csr(
    n: int,
    avg_degree: int = 30,
    alpha: float = 2.1,
    seed: int = 1234,
    dtype=np.float64,
) -> CSRMatrix:
    """Power-law degree graph adjacency ~ com-Orkut-class."""
    rng = np.random.default_rng(seed)
    # degrees ~ zipf clipped, scaled to hit avg_degree
    deg = rng.zipf(alpha, size=n).astype(np.int64)
    deg = np.minimum(deg, n // 2)
    deg = np.maximum((deg * avg_degree) // max(int(deg.mean()), 1), 1)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rng.integers(0, n, size=rows.shape[0])
    key = rows * n + cols
    _, uniq_idx = np.unique(key, return_index=True)
    rows, cols = rows[uniq_idx], cols[uniq_idx]
    vals = rng.standard_normal(rows.shape[0]).astype(dtype)
    return CSRMatrix.from_coo(n, n, rows, cols, vals, dtype=dtype)


def powerlaw_community_csr(
    n: int,
    avg_degree: int = 16,
    comm_size: int = 1024,
    p_local: float = 0.85,
    alpha: float = 2.1,
    seed: int = 1234,
    permute: bool = False,
    dtype=np.float64,
) -> CSRMatrix:
    """Community-structured power-law graph ~ social/co-purchase class.

    Degrees are power-law (zipf ``alpha``, scaled to ``avg_degree``);
    ``p_local`` of each vertex's edges land inside its own contiguous
    ``comm_size`` community block, the rest go to globally degree-weighted
    targets (hubs).  With ``permute=False`` vertex ids are already
    community-contiguous — the view a locality reordering (METIS /
    ``sparse.reorder``) produces on a real graph, which is how the
    reference benches its social-network inputs too
    (``deprecated/SC23_AD/readme.md:15-28`` + ``metis_mat_part.c``).
    ``permute=True`` scrambles ids for end-to-end reorder pipeline tests.
    """
    rng = np.random.default_rng(seed)
    deg = rng.zipf(alpha, size=n).astype(np.int64)
    deg = np.minimum(deg, n // 2)
    deg = np.maximum((deg * avg_degree) // max(int(deg.mean()), 1), 1)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    m = len(rows)
    local = rng.random(m) < p_local
    cols = np.empty(m, dtype=np.int64)
    # local: uniform within the source's community block
    comm_lo = (rows // comm_size) * comm_size
    width = np.minimum(comm_lo + comm_size, n) - comm_lo
    cols[local] = comm_lo[local] + rng.integers(0, width[local])
    # global: degree-weighted (preferential) — this is what makes hub
    # columns, the other structure the ragged cover exploits
    cum = np.cumsum(deg)
    u = rng.integers(0, cum[-1], size=(~local).sum())
    cols[~local] = np.searchsorted(cum, u, side="right")
    if permute:
        perm = rng.permutation(n)
        rows, cols = perm[rows], perm[cols]
    key = rows * n + cols
    _, uniq_idx = np.unique(key, return_index=True)
    rows, cols = rows[uniq_idx], cols[uniq_idx]
    vals = rng.standard_normal(rows.shape[0]).astype(dtype)
    return CSRMatrix.from_coo(n, n, rows, cols, vals, dtype=dtype)


def fill_b(
    srow: int, nrow: int, scol: int, ncol: int,
    factor_i: float = 0.19, factor_j: float = 0.24, dtype=np.float64,
) -> np.ndarray:
    """Deterministic analytic B block: ``B[i, j] = factor_i*i + factor_j*j``.

    Identical to the reference's ``fill_B`` (``examples/test_utils.c:121-154``,
    factors at ``examples/test_rp_spmm.c:111``) so results are comparable
    across implementations without communication.  Global indices.
    """
    i = np.arange(srow, srow + nrow, dtype=dtype)[:, None]
    j = np.arange(scol, scol + ncol, dtype=dtype)[None, :]
    return factor_i * i + factor_j * j
