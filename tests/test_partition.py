"""Unit tests for the 1D partitioner and comm-size counter (plan layer).

Semantics under test mirror ``src/spmat_part.c`` (see SURVEY.md section 2 #5).
"""

import numpy as np
import pytest

from crp_tpu.plan.partition1d import (
    csr_row_partition,
    csr_row_part_comm_size,
    prime_factorization,
)
from crp_tpu.utils.blocks import calc_block_spos_size, uniform_displs
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_random_csr


def reference_row_partition(rowptr, nblk):
    """Direct per-block transliteration of the reference binary search
    (src/spmat_part.c:12-35) used as a local oracle."""
    nrow = len(rowptr) - 1
    nnz = int(rowptr[nrow])
    out = [0]
    for i in range(nblk):
        target = nnz if i == nblk - 1 else (nnz // nblk) * (i + 1)
        st, end = 0, nrow
        while st < end:
            mid = (st + end) // 2
            if rowptr[mid] == target:
                st = mid
                break
            if rowptr[mid] < target:
                st = mid + 1
            else:
                end = mid
        out.append(st)
    return np.array(out)


def reference_comm_size(ncol, rowptr, colidx, rblk_ptr, x_displs):
    """Flag-array transliteration of src/spmat_part.c:38-64."""
    nblk = len(rblk_ptr) - 1
    sizes = []
    for i in range(nblk):
        srow, erow = rblk_ptr[i], rblk_ptr[i + 1]
        flags = np.zeros(ncol, dtype=bool)
        flags[colidx[rowptr[srow]:rowptr[erow]]] = True
        cnt = int(flags.sum()) - int(flags[x_displs[i]:x_displs[i + 1]].sum())
        sizes.append(cnt)
    return np.array(sizes), int(sum(sizes))


@pytest.mark.parametrize("nblk", [1, 2, 3, 4, 7, 8])
def test_row_partition_balances_nnz(nblk, rng):
    a = powerlaw_random_csr(500, avg_degree=10, seed=7)
    ptr = csr_row_partition(a.rowptr, nblk)
    assert ptr[0] == 0 and ptr[-1] == a.nrow
    assert np.all(np.diff(ptr) >= 0)
    np.testing.assert_array_equal(ptr, reference_row_partition(a.rowptr, nblk))


def test_row_partition_with_empty_rows():
    # duplicated rowptr values (empty rows) exercise the break-at-equality path
    rowptr = np.array([0, 0, 0, 4, 4, 4, 8, 8, 12])
    for nblk in (1, 2, 3, 4):
        ptr = csr_row_partition(rowptr, nblk)
        np.testing.assert_array_equal(ptr, reference_row_partition(rowptr, nblk))


@pytest.mark.parametrize("nblk", [1, 2, 4, 8])
def test_comm_size_matches_flag_counting(nblk):
    a = banded_random_csr(600, nnz_per_row=9, bandwidth=60, seed=3)
    rblk = csr_row_partition(a.rowptr, nblk)
    x_displs = uniform_displs(a.ncol, nblk)
    sizes, total = csr_row_part_comm_size(a.ncol, a.rowptr, a.colidx, rblk, x_displs)
    ref_sizes, ref_total = reference_comm_size(a.ncol, a.rowptr, a.colidx, rblk, x_displs)
    np.testing.assert_array_equal(sizes, ref_sizes)
    assert total == ref_total


def test_comm_size_zero_when_block_self_sufficient():
    # block-diagonal matrix, blocks aligned with ownership -> zero comm
    rowptr = np.array([0, 2, 4, 6, 8])
    colidx = np.array([0, 1, 0, 1, 2, 3, 2, 3])
    rblk = np.array([0, 2, 4])
    x_displs = np.array([0, 2, 4])
    sizes, total = csr_row_part_comm_size(4, rowptr, colidx, rblk, x_displs)
    assert total == 0


def test_prime_factorization():
    assert prime_factorization(1) == []
    assert prime_factorization(2) == [2]
    assert prime_factorization(12) == [2, 2, 3]
    assert prime_factorization(97) == [97]
    assert prime_factorization(360) == [2, 2, 2, 3, 3, 5]


def test_calc_block_spos_size():
    # 10 items over 3 blocks -> sizes 4,3,3
    assert calc_block_spos_size(10, 3, 0) == (0, 4)
    assert calc_block_spos_size(10, 3, 1) == (4, 3)
    assert calc_block_spos_size(10, 3, 2) == (7, 3)
    # iblk == nblk is only meaningful for spos (the reference returns the
    # degenerate size bs0 there too, src/utils.c:31-47)
    assert calc_block_spos_size(10, 3, 3)[0] == 10
    assert calc_block_spos_size(10, 3, -1) == (-1, 0)
    np.testing.assert_array_equal(uniform_displs(10, 3), [0, 4, 7, 10])
    for L, p in [(7, 7), (0, 3), (5, 8), (100, 7)]:
        d = uniform_displs(L, p)
        for i in range(p):
            spos, size = calc_block_spos_size(L, p, i)
            assert d[i] == spos and d[i + 1] - d[i] == size
