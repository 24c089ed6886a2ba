"""The 2D partition planner: greedy grid search minimizing communicated elements.

Re-implements the decision procedure of ``calc_spmm_part2d_from_1d``
(``src/spmat_part.c:85-210``) exactly — same greedy order (largest prime
factor first), same nnz cost factor 1.5 (12 bytes CSR nnz / 8 bytes double),
same ``m == k`` B-row rule, same failed-factor memo — so that, given the same
matrix, process count, and n, it chooses the same ``pm x pn`` grid and the
same block boundaries (oracle: ``examples/test_spmm_2dpg.c``).

Plan semantics (``src/spmat_part.h:63-71``): with
``idx_m0(i) = [A0_rowptr[i], A0_rowptr[i+1])`` etc.,

* before replicating A, device ``P(i, j)`` owns ``A(idx_m0(i*pn + j), :)``,
* before exchanging B, ``P(i, j)`` owns ``B(idx_k(i), idx_n(j))``,
* ``P(i, j)`` computes ``C(idx_m(i), idx_n(j)) = A(idx_m(i), :) @ B(:, idx_n(j))``.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import numpy as np

from ..utils.blocks import uniform_displs
from .partition1d import csr_row_partition, csr_row_part_comm_size, prime_factorization

logger = logging.getLogger("crp_tpu")

NNZ_COST_FACTOR = 1.5  # CSR int32+double cost per nnz / sizeof(double)


@dataclasses.dataclass
class Plan2D:
    """Output of the 2D planner, consumed by the engines and mesh builders."""

    nproc: int
    m: int
    n: int
    k: int
    pm: int
    pn: int
    comm_cost: int
    A0_rowptr: np.ndarray   # (nproc+1,) 1D row layout of A before replication
    B_rowptr: np.ndarray    # (pm+1,)    B row slabs
    AC_rowptr: np.ndarray   # (pm+1,)    replicated-A / C row slabs
    BC_colptr: np.ndarray   # (pn+1,)    B/C column slabs
    # Diagnostics for dbg_print parity with the reference planner
    basic_1d_cost: int = 0
    candidates: list = dataclasses.field(default_factory=list)
    # Predicted comm volumes (elements) for the audit
    rA_cost: int = 0          # planner's A-replication cost term
    rB_comm_rows: Optional[np.ndarray] = None  # (pm,) distinct non-owned B rows per row-group
    rB_cost: int = 0          # sum(rB_comm_rows) * n

    def device_coords(self, rank: int) -> tuple[int, int]:
        """rank r -> (pi, pj) on the row-major pm x pn grid
        (``src/para2d_spmm.c:38-40``)."""
        return rank // self.pn, rank % self.pn

    def save(self, path: str) -> None:
        """Serialize the plan to .npz (plans are init-once/exec-many state —
        the checkpointable artifact the reference never persisted,
        SURVEY.md section 5)."""
        np.savez(
            path,
            scalars=np.array(
                [self.nproc, self.m, self.n, self.k, self.pm, self.pn,
                 self.comm_cost, self.basic_1d_cost, self.rA_cost,
                 self.rB_cost],
                dtype=np.int64,
            ),
            A0_rowptr=self.A0_rowptr, B_rowptr=self.B_rowptr,
            AC_rowptr=self.AC_rowptr, BC_colptr=self.BC_colptr,
            rB_comm_rows=(
                self.rB_comm_rows if self.rB_comm_rows is not None
                else np.zeros(0, np.int64)
            ),
        )

    @classmethod
    def load(cls, path: str) -> "Plan2D":
        z = np.load(path)
        s = z["scalars"]
        rB = z["rB_comm_rows"]
        return cls(
            nproc=int(s[0]), m=int(s[1]), n=int(s[2]), k=int(s[3]),
            pm=int(s[4]), pn=int(s[5]), comm_cost=int(s[6]),
            A0_rowptr=z["A0_rowptr"], B_rowptr=z["B_rowptr"],
            AC_rowptr=z["AC_rowptr"], BC_colptr=z["BC_colptr"],
            basic_1d_cost=int(s[7]), rA_cost=int(s[8]),
            rB_comm_rows=rB if rB.size else None, rB_cost=int(s[9]),
        )

    def describe(self) -> str:
        """Text dump in the spirit of ``examples/test_spmm_2dpg.c:53-79``."""
        lines = [
            f"Calculated 2D grid: pm, pn = {self.pm}, {self.pn}, comm cost = {self.comm_cost}",
            "",
            "1D row partitioning of A:",
        ]
        for i in range(self.pm):
            for j in range(self.pn):
                r = i * self.pn + j
                lines.append(f"Rank {r:3d}: [{self.A0_rowptr[r]}, {self.A0_rowptr[r+1]-1}]")
            rs, re = i * self.pn, (i + 1) * self.pn - 1
            lines.append(
                f"Ranks [{rs}, {re}] all own A rows "
                f"[{self.A0_rowptr[rs]}, {self.A0_rowptr[re+1]-1}] after replicating A"
            )
        lines.append("")
        lines.append("1D row partitioning of B:")
        lines += [f"Block {i}: [{self.B_rowptr[i]}, {self.B_rowptr[i+1]-1}]" for i in range(self.pm)]
        lines.append("")
        lines.append("1D row partitioning of C:")
        lines += [f"Block {i}: [{self.AC_rowptr[i]}, {self.AC_rowptr[i+1]-1}]" for i in range(self.pm)]
        lines.append("")
        lines.append("1D column partitioning of B and C:")
        lines += [f"Block {i}: [{self.BC_colptr[i]}, {self.BC_colptr[i+1]-1}]" for i in range(self.pn)]
        return "\n".join(lines)


def calc_spmm_part2d_from_1d(
    nproc: int,
    m: int,
    n: int,
    k: int,
    rb_displs0: np.ndarray,
    rowptr: np.ndarray,
    colidx: np.ndarray,
    rA: int = 1,
    dbg_print: bool = False,
) -> Plan2D:
    """Choose a ``pm x pn`` grid + block boundaries from a 1D row partition.

    Greedy search over prime factors of ``nproc`` (largest first): each step
    tries moving one more factor from ``pm`` to ``pn``; cost =
    A-replication ``nnz * (pn-1) * 1.5`` + B-exchange
    ``rA * exact_comm_rows * n`` (``src/spmat_part.c:117-161``).
    """
    rb_displs0 = np.asarray(rb_displs0, dtype=np.int64)
    rowptr = np.asarray(rowptr)
    colidx = np.asarray(colidx)
    candidates = []

    def b_row_displs(nblk: int, m_displs: np.ndarray) -> np.ndarray:
        # If A is square, B rows are partitioned like A rows; else uniformly
        # (src/spmat_part.c:101-107).
        if m == k:
            return m_displs[: nblk + 1]
        return uniform_displs(k, nblk)

    # 1. Cost of the plain 1D row partitioning (pm = nproc, pn = 1)
    _, total = csr_row_part_comm_size(
        k, rowptr, colidx, rb_displs0, b_row_displs(nproc, rb_displs0)
    )
    best_cost = int(total) * int(n)
    basic_1d_cost = best_cost
    m_displs = rb_displs0.copy()
    if dbg_print:
        logger.info("Basic 1D row partitioning comm cost: %d", best_cost)

    # 2. Greedy factor moves
    pm_, pn_ = nproc, 1
    failed_p = -1
    a_nnz = int(rowptr[m])
    fac = prime_factorization(nproc)
    nfac = len(fac)
    for ifac in range(nfac):
        p_i = fac[nfac - 1 - ifac]
        if p_i == failed_p:
            continue
        pn2 = pn_ * p_i
        pm2 = nproc // pn2
        m_displs2 = rb_displs0[:: pn2][: pm2 + 1].copy()
        _, total = csr_row_part_comm_size(
            k, rowptr, colidx, m_displs2, b_row_displs(pm2, m_displs2)
        )
        # float multiply then truncate, as the reference does
        a_copy_cost = int(float(a_nnz) * float(pn2 - 1) * NNZ_COST_FACTOR)
        b_copy_cost = int(rA) * int(total) * int(n)
        curr_cost = a_copy_cost + b_copy_cost
        candidates.append(
            dict(step=ifac, factor=p_i, pm=pm2, pn=pn2, cost=curr_cost,
                 a_cost=a_copy_cost, b_cost=b_copy_cost)
        )
        if dbg_print:
            logger.info("Evaluated: pm = %d, pn = %d, cost = %d", pm2, pn2, curr_cost)
        if curr_cost < best_cost:
            if dbg_print:
                logger.info("Found better partitioning")
            best_cost = curr_cost
            pn_, pm_ = pn2, pm2
            m_displs = m_displs2
            failed_p = -1
        else:
            failed_p = p_i
    if dbg_print:
        logger.info("Final 2D partitioning: pm = %d, pn = %d, cost = %d", pm_, pn_, best_cost)

    # 3. Block boundary arrays
    AC_rowptr = m_displs[: pm_ + 1].copy()
    B_rowptr = AC_rowptr.copy() if m == k else uniform_displs(k, pm_)
    BC_colptr = uniform_displs(n, pn_)

    # 4. nnz-balanced sub-split of each replicated row panel over its pn ranks
    A0_rowptr = np.empty(nproc + 1, dtype=np.int64)
    for im in range(pm_):
        srow, erow = int(m_displs[im]), int(m_displs[im + 1])
        local_rowptr = rowptr[srow : erow + 1] - rowptr[srow]
        sub = csr_row_partition(local_rowptr, pn_) + srow
        A0_rowptr[im * pn_ : (im + 1) * pn_ + 1] = sub

    # Predicted comm volumes for the audit: same counting as the engines do
    rb_rows, rb_total = csr_row_part_comm_size(
        k, rowptr, colidx, AC_rowptr, B_rowptr
    )
    plan = Plan2D(
        nproc=nproc, m=m, n=n, k=k, pm=pm_, pn=pn_, comm_cost=int(best_cost),
        A0_rowptr=A0_rowptr, B_rowptr=B_rowptr, AC_rowptr=AC_rowptr,
        BC_colptr=BC_colptr, basic_1d_cost=basic_1d_cost, candidates=candidates,
        rA_cost=int(float(a_nnz) * float(pn_ - 1) * NNZ_COST_FACTOR),
        rB_comm_rows=rb_rows, rB_cost=int(rb_total) * int(n),
    )
    return plan


def plan_from_csr(
    a, n: int, nproc: int, method: str = "nnz", rA: int = 1, dbg_print: bool = False
) -> Plan2D:
    """End-to-end planning from a CSRMatrix: 1D partition then 2D grid search.

    ``method``: "nnz" (native nnz-balanced 1D partition) or "metis"
    (graph-partitioned, square matrices only).  "metis" mirrors the
    reference driver flow (``examples/test_spmm_2dpg.c:30-37``):
    ``METIS_row_partition`` symmetrically permutes the matrix **in place**
    (the C version rewrites rowptr/colidx/val and frees the perm) and its
    per-part displacements seed the 2D grid search; ``a`` is updated to the
    permuted matrix, so the returned plan matches the caller's ``a``.
    Backend chain: libmetis (OBJTYPE_VOL) -> pymetis -> native greedy graph
    growing — see ``sparse.reorder.metis_partition_rows``.
    """
    if method == "metis":
        from ..sparse.reorder import metis_row_partition

        out, _perm, rb_displs0 = metis_row_partition(a, nproc)
        a.rowptr, a.colidx, a.val = out.rowptr, out.colidx, out.val
    elif method == "nnz":
        rb_displs0 = csr_row_partition(a.rowptr, nproc)
    else:
        raise ValueError(f"unknown 1D partition method {method!r}")
    return calc_spmm_part2d_from_1d(
        nproc, a.nrow, n, a.ncol, rb_displs0, a.rowptr, a.colidx, rA=rA,
        dbg_print=dbg_print,
    )
