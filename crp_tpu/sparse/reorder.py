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


def _ggp_partition_py(
    rowptr: np.ndarray, colidx: np.ndarray, nparts: int, imbalance: float
) -> np.ndarray:
    """Pure-python twin of ``native.ggp_partition`` (greedy graph growing):
    grow parts from min-degree seeds, absorbing the frontier vertex with the
    most neighbors already inside the part, under the imbalance cap."""
    import heapq

    nrow = len(rowptr) - 1
    if nparts <= 1 or nrow == 0:
        return np.zeros(nrow, dtype=np.int64)
    part = np.full(nrow, -1, dtype=np.int64)
    by_deg = np.argsort(np.diff(rowptr), kind="stable")
    cursor = 0
    in_cur = np.zeros(nrow, dtype=np.int64)
    stamp = np.full(nrow, -1, dtype=np.int64)
    remaining = nrow
    cap = int(imbalance * nrow / nparts) + 1
    for p in range(nparts):
        target = -(-remaining // (nparts - p))
        target = remaining if p == nparts - 1 else min(target, cap)
        heap: list = []  # (-gain, v), stale entries skipped on pop
        size = 0
        while size < target and remaining > 0:
            v = -1
            while heap:
                g, u = heapq.heappop(heap)
                if part[u] != -1:
                    continue
                cur = in_cur[u] if stamp[u] == p else 0
                if -g != cur:
                    heapq.heappush(heap, (-cur, u))
                    continue
                v = u
                break
            if v == -1:
                while cursor < nrow and part[by_deg[cursor]] != -1:
                    cursor += 1
                if cursor >= nrow:
                    break
                v = int(by_deg[cursor])
            part[v] = p
            size += 1
            remaining -= 1
            for w in colidx[rowptr[v]:rowptr[v + 1]]:
                w = int(w)
                if w == v or w >= nrow or part[w] != -1:
                    continue
                if stamp[w] != p:
                    stamp[w] = p
                    in_cur[w] = 0
                in_cur[w] += 1
                heapq.heappush(heap, (-int(in_cur[w]), w))
    part[part == -1] = nparts - 1
    return part


def metis_partition_rows(
    a: CSRMatrix, nparts: int, imbalance: float = 1.05
) -> np.ndarray:
    """K-way row partition behind the reference's METIS seam.

    Backend chain (first available wins), logged at info level:

      1. **libmetis** via ctypes (``sparse.metis``): the reference's exact
         call — ``METIS_OBJTYPE_VOL`` + ubvec 1.05
         (``examples/metis_mat_part.c:44-62``);
      2. **pymetis** (edge-cut objective; ufactor honored when the build
         exposes Options);
      3. **native greedy graph growing** (``native/fastops.cpp``
         ``crp_ggp_partition``, numpy twin here) — no external dependency.

    Returns the (nrow,) part-id vector.
    """
    from . import metis as libmetis

    if libmetis.available():
        logger.info("METIS row partition: libmetis (OBJTYPE_VOL)")
        return libmetis.part_graph_kway(a.rowptr, a.colidx, nparts, imbalance)
    try:
        import pymetis
    except ImportError:
        pymetis = None
    if pymetis is not None:  # pragma: no cover - optional dependency
        logger.info("METIS row partition: pymetis (edge-cut)")
        adj = [
            a.colidx[a.rowptr[i]:a.rowptr[i + 1]].tolist()
            for i in range(a.nrow)
        ]
        kw = {}
        if hasattr(pymetis, "Options"):
            try:
                opts = pymetis.Options()
                opts.ufactor = max(int(round((imbalance - 1.0) * 1000)), 1)
                kw["options"] = opts
            except (AttributeError, TypeError):
                pass
        _, parts = pymetis.part_graph(nparts, adjacency=adj, **kw)
        return np.asarray(parts, dtype=np.int64)
    from .. import native

    logger.info("METIS row partition: native greedy graph growing")
    parts = native.ggp_partition(a.rowptr, a.colidx, nparts, imbalance)
    if parts is None:
        parts = _ggp_partition_py(a.rowptr, a.colidx, nparts, imbalance)
    return np.asarray(parts, dtype=np.int64)


def metis_row_partition(
    a: CSRMatrix, nparts: int, imbalance: float = 1.05
) -> tuple[CSRMatrix, np.ndarray, np.ndarray]:
    """METIS k-way partition + symmetric permutation grouping parts.

    Mirrors ``METIS_row_partition`` (``examples/metis_mat_part.c:31-112``):
    partition the adjacency graph (:func:`metis_partition_rows` backend
    chain), sort vertices by part id, permute symmetrically, and return the
    per-part row displacements to seed the planner.  Returns
    ``(permuted matrix, perm, displs)`` with ``perm[new] = old``.
    """
    if a.nrow != a.ncol:
        raise ValueError("METIS partitioning requires a symmetric matrix")
    parts = metis_partition_rows(a, nparts, imbalance)
    perm = np.argsort(parts, kind="stable").astype(np.int64)
    out = permute_symmetric(a, perm)
    counts = np.bincount(parts, minlength=nparts)
    displs = np.zeros(nparts + 1, dtype=np.int64)
    np.cumsum(counts, out=displs[1:])
    return out, perm, displs


def _bisect(rowptr: np.ndarray, colidx: np.ndarray, imbalance: float):
    """One 2-way GGGP split of a (sub)graph: part-id vector in {0, 1}."""
    from .. import native

    parts = native.ggp_partition(rowptr, colidx, 2, imbalance)
    if parts is None:
        parts = _ggp_partition_py(rowptr, colidx, 2, imbalance)
    return np.asarray(parts, dtype=np.int64)


def _refine_bisection(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    parts: np.ndarray,
    rounds: int,
    imbalance: float,
) -> np.ndarray:
    """Synchronous boundary refinement of a 2-way split (vectorized
    Kernighan-Lin-flavored sweeps): each round moves every positive-gain
    vertex (more neighbors across the cut than inside), trimming the
    lowest-gain movers when the net flow would breach the balance cap.
    O(nnz) per round in numpy; measured on the scrambled-cplaw synthetic
    it cuts the post-reorder ragged spill from 36% to 24% of nnz (the
    sorted original is 19%)."""
    n = len(rowptr) - 1
    if n == 0 or rounds <= 0:
        return parts
    deg = np.diff(rowptr)
    row_of = np.repeat(np.arange(n), deg)
    cap = int(imbalance * n / 2) + 1
    for _ in range(rounds):
        in1 = np.bincount(row_of, weights=parts[colidx], minlength=n)
        gain = np.where(parts == 0, 2 * in1 - deg, deg - 2 * in1)
        move = gain > 0
        m0 = np.nonzero(move & (parts == 0))[0]
        m1 = np.nonzero(move & (parts == 1))[0]
        if len(m0) == 0 and len(m1) == 0:
            break
        c0 = int((parts == 0).sum())
        # net flow into part 0 is len(m1) - len(m0); trim the lowest-gain
        # movers on whichever side overfills
        c0_new = c0 - len(m0) + len(m1)
        if c0_new > cap and len(m1):
            k = c0_new - cap
            order = np.argsort(gain[m1], kind="stable")
            m1 = m1[order[k:]] if k < len(m1) else m1[:0]
            c0_new = c0 - len(m0) + len(m1)
        if c0_new < n - cap and len(m0):
            k = (n - cap) - c0_new
            order = np.argsort(gain[m0], kind="stable")
            m0 = m0[order[k:]] if k < len(m0) else m0[:0]
        if len(m0) == 0 and len(m1) == 0:
            break
        parts = parts.copy()
        parts[m0] = 1
        parts[m1] = 0
    return parts


def cluster_reorder(
    a: CSRMatrix,
    leaf_size: int = 256,
    imbalance: float = 1.10,
    refine_rounds: int = 8,
) -> tuple[CSRMatrix, np.ndarray]:
    """Recursive-bisection locality ordering (nested GGGP).

    The reference's METIS reorder (``examples/metis_mat_part.c:31-112``)
    sorts vertices by a FLAT k-way part id: with few parts, vertices
    *within* a part keep their original (possibly scrambled) order, so on
    a label-permuted community graph the permuted matrix stays hostile to
    windowed kernels (measured: GGGP-8 reorder left the scrambled-cplaw
    bandwidth unchanged and the ragged cover still refused,
    ``bench_results/r4_tpu_reorder.jsonl``).  Recursive bisection fixes
    exactly that: each level splits by connectivity and the leaves are
    emitted depth-first, so strongly connected vertex sets get contiguous
    new ids at EVERY scale down to ``leaf_size`` — the nested-dissection-
    style ordering METIS itself would produce via ``METIS_NodeND``.  Each
    split is polished by ``refine_rounds`` synchronous boundary-refinement
    sweeps (:func:`_refine_bisection`), which on the scrambled-cplaw
    synthetic takes the recovered ragged spill from 36% to 24% of nnz
    (the unscrambled original: 19%).

    Cost: O(depth x nnz) with depth = log2(nrow / leaf_size); ~tens of
    seconds host-side on a 10M-nnz graph, same order as the reference's
    one-time METIS call.  Returns (permuted matrix, perm),
    ``perm[new] = old``.
    """
    if a.nrow != a.ncol:
        raise ValueError("cluster reordering requires a symmetric matrix")
    rowptr = np.asarray(a.rowptr, dtype=np.int64)
    colidx = np.asarray(a.colidx, dtype=np.int64)
    nrow = a.nrow
    perm = np.empty(nrow, dtype=np.int64)
    n_out = 0
    pos = np.full(nrow, -1, dtype=np.int64)  # orig id -> local id scratch
    stack = [np.arange(nrow, dtype=np.int64)]
    while stack:
        ids = stack.pop()
        if len(ids) <= leaf_size:
            perm[n_out: n_out + len(ids)] = ids
            n_out += len(ids)
            continue
        # extract the induced subgraph A[ids][:, ids] (vectorized: the
        # gather index list is the concatenation of each row's CSR range)
        pos[ids] = np.arange(len(ids))
        deg = rowptr[ids + 1] - rowptr[ids]
        total = int(deg.sum())
        cum = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(deg[:-1], out=cum[1:])
        gather = (
            np.repeat(rowptr[ids] - cum, deg) + np.arange(total)
        ) if len(ids) < nrow else np.arange(len(colidx))
        sub_cols_orig = colidx[gather]
        keep = pos[sub_cols_orig] >= 0
        # re-count per-row degrees after dropping cross-subset edges
        row_of = np.repeat(np.arange(len(ids)), deg)
        kept_rows = row_of[keep]
        sub_colidx = pos[sub_cols_orig[keep]]
        sub_rowptr = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(np.bincount(kept_rows, minlength=len(ids)),
                  out=sub_rowptr[1:])
        pos[ids] = -1
        parts = _bisect(sub_rowptr, sub_colidx, imbalance)
        parts = _refine_bisection(
            sub_rowptr, sub_colidx, parts, refine_rounds, imbalance
        )
        left, right = ids[parts == 0], ids[parts == 1]
        if len(left) == 0 or len(right) == 0:  # degenerate: emit as leaf
            perm[n_out: n_out + len(ids)] = ids
            n_out += len(ids)
            continue
        stack.append(right)  # LIFO: left emitted first (depth-first)
        stack.append(left)
    assert n_out == nrow, (n_out, nrow)
    out = permute_symmetric(a, perm)
    logger.info(
        "cluster reorder: bandwidth %d -> %d (leaf %d)",
        a.bandwidth(), out.bandwidth(), leaf_size,
    )
    return out, perm


def spectral_partition_rows(a: CSRMatrix, nparts: int) -> np.ndarray:
    """Degree-balanced fallback 1D partition for graph matrices without
    METIS: BFS-cluster rows after RCM.  Returns (nparts+1,) displacements."""
    from ..plan.partition1d import csr_row_partition

    return csr_row_partition(a.rowptr, nparts)
