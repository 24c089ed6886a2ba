"""The bandwidth-bound (v1) planner.

Re-implements the decision procedure of the deprecated v1 engine's embedded
planner (``deprecated/src/crpspmm.c:133-195``; standalone driver
``deprecated/examples/crpspmm_calc_partition.c``): the same greedy
prime-factor loop as the v2 planner, but deciding "split M vs split N" per
factor, and costing a row panel's B requirement by the *contiguous column
range* upper bound ``[min_col, max_col]`` from per-row colidx ranges — not by
exact distinct-column counts.  Cheaper than the exact planner (O(m) per
factor, no nnz pass), useful when exact counting is too slow.

Requires colidx sorted within each row (``deprecated/src/crpspmm.c:108``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.blocks import uniform_displs
from .partition1d import prime_factorization

SIZE_MAX = (1 << 64) - 1
NNZ_COST_FACTOR = 1.5


@dataclasses.dataclass
class BandwidthPlan:
    nproc: int
    m: int
    n: int
    k: int
    np_row: int               # m_split
    np_col: int               # n_split
    m_split_idx: np.ndarray   # (np_row+1,) row panel boundaries of A/C
    B_rd_row_displs: np.ndarray  # (np_row+1,) uniform internal B row slabs
    BC_colptr: np.ndarray     # (np_col+1,) uniform B/C column slabs
    B_windows: np.ndarray     # (np_row, 2) per row panel [loc_B_srow, loc_B_erow)
    copy_B_size: int          # final B-copy cost term (elements)


def _panel_boundaries(rowptr: np.ndarray, m: int, nsplit: int) -> np.ndarray:
    """Row panel boundaries for the v1 nnz-balance scan.

    Panel j ends at the first row index > its start whose rowptr reaches the
    quota ``A_nnz // nsplit * (j+1)`` (``deprecated/src/crpspmm.c:163-183``).
    """
    a_nnz = int(rowptr[m])
    idx = np.empty(nsplit + 1, dtype=np.int64)
    idx[0] = 0
    cur = 0
    for j in range(nsplit):
        quota = a_nnz if j == nsplit - 1 else (a_nnz // nsplit) * (j + 1)
        erow = int(np.searchsorted(rowptr, quota, side="left"))
        erow = max(erow, cur + 1)
        if j == nsplit - 1:
            erow = m
        idx[j + 1] = erow
        cur = erow
    return idx


def _panel_b_windows(ranges: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Per-panel [min_col, max_col+1) windows from per-row colidx ranges."""
    nsplit = idx.shape[0] - 1
    starts = idx[:-1]
    mins = np.minimum.reduceat(ranges[:, 0], starts)
    maxs = np.maximum.reduceat(ranges[:, 1], starts)
    out = np.empty((nsplit, 2), dtype=np.int64)
    out[:, 0] = mins
    # panels of only-empty rows carry ranges [ncol, -1]; clamp to an empty
    # window instead of a negative extent (which would subtract from the
    # planner's B-copy cost and emit invalid coarse row lists)
    out[:, 1] = np.maximum(maxs + 1, mins)
    return out


def calc_bandwidth_part2d(
    nproc: int,
    m: int,
    n: int,
    k: int,
    rowptr: np.ndarray,
    row_ranges: np.ndarray,
) -> BandwidthPlan:
    """Greedy split-M / split-N search with bandwidth-bound B cost.

    ``row_ranges`` is the (m, 2) per-row [min colidx, max colidx] array
    (``CSRMatrix.row_col_ranges``); the reference allgathers these at v1
    engine init (``deprecated/src/crpspmm.c:107-131``).
    """
    rowptr = np.asarray(rowptr)
    row_ranges = np.asarray(row_ranges)
    a_nnz = int(rowptr[m])

    m_split, n_split = 1, 1
    m_split_idx = np.array([0, m], dtype=np.int64)
    curr_copy_b = int(k) * int(n)  # one copy of B to start
    fac = prime_factorization(nproc)
    nfac = len(fac)
    for i in range(nfac):
        p_i = fac[nfac - 1 - i]
        # Split N: B copies unchanged, A copies multiplied by p_i
        a_copy_cost1 = int(float(a_nnz) * float(n_split) * NNZ_COST_FACTOR)
        split_n_cost = a_copy_cost1 * p_i + curr_copy_b
        if n_split * p_i > n:
            split_n_cost = SIZE_MAX
        # Split M: A copies unchanged, recompute panel B ranges
        trial_m = m_split * p_i
        if trial_m > m:
            # more row panels than rows (guard symmetric with split-N's)
            split_m_cost = SIZE_MAX
            idx2, copy_b2 = m_split_idx, curr_copy_b
        else:
            idx2 = _panel_boundaries(rowptr, m, trial_m)
            windows = _panel_b_windows(row_ranges, idx2)
            copy_b2 = int(
                ((windows[:, 1] - windows[:, 0]).astype(np.int64) * n).sum()
            )
            split_m_cost = a_copy_cost1 + copy_b2
        if split_m_cost == SIZE_MAX and split_n_cost == SIZE_MAX:
            # neither axis can absorb this factor (m_split*p_i > m AND
            # n_split*p_i > n): growing n_split past n would emit empty
            # B/C column slabs — surface the nproc-too-large condition
            raise ValueError(
                f"bandwidth planner: cannot split factor {p_i} — "
                f"m_split={m_split}*{p_i} > m={m} and "
                f"n_split={n_split}*{p_i} > n={n}; reduce nproc"
            )
        if split_m_cost < split_n_cost:
            m_split = trial_m
            curr_copy_b = copy_b2
            m_split_idx = idx2
        else:
            n_split *= p_i

    windows = _panel_b_windows(row_ranges, m_split_idx)
    return BandwidthPlan(
        nproc=nproc, m=m, n=n, k=k, np_row=m_split, np_col=n_split,
        m_split_idx=m_split_idx,
        B_rd_row_displs=uniform_displs(k, m_split),
        BC_colptr=uniform_displs(n, n_split),
        B_windows=windows,
        copy_B_size=curr_copy_b,
    )
