"""Projected multi-chip exec model — makes the scaling story falsifiable.

One real chip is available here, so multi-chip exec time cannot be
measured; what CAN be grounded is (a) the local kernel's roofline terms,
validated against on-chip single-chip records, and (b) the exchange
volumes, which the plans compute exactly (oracle-locked against the
reference planner).  This module combines them into a per-plan projected
exec time:

    kernel_s = max_i max(hbm_bytes_i / HBM_eff, mxu_flops_i / MXU_eff)
               + spill_nnz_i * spill_ns
    comm_s   = max_i ring_bytes_i / ICI_eff
    projected_no_overlap = kernel_s + comm_s
    projected_overlap    = max(kernel_s, comm_s)

Effective rates default to MEASURED single-chip numbers (r2/r3 records:
165 TF/s x3-counted MXU, 623 GB/s HBM stream, ~21 ns per spilled nnz)
and a v5e ICI estimate; all overridable via env so the projection can be
re-grounded when pod access exists:

    CRP_PROJ_MXU_TFLOPS (165)   CRP_PROJ_HBM_GBPS (623)
    CRP_PROJ_ICI_GBPS   (90)    CRP_PROJ_SPILL_NS (21)

Comparison rows: BASELINE.md SC23 Fig. 3 (`plot_all_scaling.m`).
"""

from __future__ import annotations

import os

import numpy as np


# where each default rate comes from — emitted with every projection
# record so readers can audit (and re-pin) the weakest terms
RATE_PROVENANCE = dict(
    mxu_tflops="measured: r2 headline 0.01142 s at pwtk-class x3 = "
               "165 TF/s effective (0.838 of the 197 TF/s v5e spec), "
               "BENCH_r02.json",
    hbm_gbps="measured: 623 GB/s sustained A-panel stream, r2 presplit "
             "sweep (bench_results/r2_tpu_presplit_b.jsonl)",
    ici_gbps="UNMEASURED (single chip here): public v5e spec, one 2D-torus "
             "axis ~45 GB/s per direction, ring send+recv concurrent "
             "(jax-ml.github.io/scaling-book)",
    spill_ns="measured: ~21 ns/nnz sorted segment-sum, r3 cplaw on-chip "
             "(bench_results/r3_tpu_plaw.jsonl); re-pinned per chip window "
             "by scripts/spill_microbench.py",
)


def _rates():
    return dict(
        mxu=float(os.environ.get("CRP_PROJ_MXU_TFLOPS", 165)) * 1e12,
        hbm=float(os.environ.get("CRP_PROJ_HBM_GBPS", 623)) * 1e9,
        ici=float(os.environ.get("CRP_PROJ_ICI_GBPS", 90)) * 1e9,
        spill_ns=float(os.environ.get("CRP_PROJ_SPILL_NS", 21)),
    )


def _shard_kernel_terms(shard, n_pad, mxu_prec, itemsize, geometry=None):
    """Roofline inputs for one shard's local SpMM: (hbm_bytes, mxu_flops,
    spill_nnz).  Mirrors the pack selection: uniform windowed geometry
    when feasible, else the ragged cover estimate.  ``geometry`` is the
    partition-shared ragged (TM, Wc) — ``_pack_ragged`` resolves ONCE on
    the largest shard and applies it everywhere, so at p > 1 the model
    must price the same geometry the pack actually uses (ADVICE r4)."""
    from ..kernels.dispatch import _uniform_cost_estimate
    from ..kernels.spmm_ragged import estimate_ragged, resolve_ragged_geometry

    passes = {"x3": 3, "highest": 6, "default": 1}.get(mxu_prec, 1)
    a_item = 2 if mxu_prec in ("x3", "default") else itemsize
    a_item = a_item * 2 if mxu_prec == "x3" else a_item  # hi/lo pair
    b_item = 2 if mxu_prec == "default" else itemsize

    cc = shard.colidx
    trip = (shard.rowptr, cc, shard.val)
    W, G, ok = _uniform_cost_estimate([trip], shard.nrow)
    if geometry is not None:
        TMr, Wcr = geometry
    else:
        TMr, Wcr = resolve_ragged_geometry(shard.rowptr, cc, mxu_prec)
    S, spill, Gr = estimate_ragged(shard.rowptr, cc, TMr, Wcr)
    if ok:
        # mirror dispatch._pack_pallas's selection gate exactly: the
        # uniform-vs-ragged byte comparison (at the pack dtype's fp32
        # itemsize) only runs for wide/large windows; small feasible
        # windows always take the uniform path
        TM = 256
        bytes_uniform_gate = G * TM * W * itemsize
        take_uniform = True
        if W > 4096 or bytes_uniform_gate > (1 << 30):
            bytes_ragged_gate = S * TMr * Wcr * itemsize
            take_uniform = bytes_uniform_gate <= 3 * max(bytes_ragged_gate, 1)
        if take_uniform:
            # uniform windowed path (with super-group B reuse the B term
            # approaches one window sweep; without it, G * W rows)
            a_bytes = G * TM * W * a_item
            b_rows = G * W
            flops = 2.0 * G * TM * W * n_pad * passes
            hbm = a_bytes + b_rows * n_pad * b_item + G * TM * n_pad * 4
            return hbm, flops, 0
    G = Gr
    a_bytes = S * TMr * Wcr * a_item
    flops = 2.0 * S * TMr * Wcr * n_pad * passes
    hbm = a_bytes + S * Wcr * n_pad * b_item + G * TMr * n_pad * 4
    return hbm, flops, spill


def project_exec_1d(
    a, n, p, *, mxu_prec="x3", dtype=np.float32, reidx=True,
    calibration: float = 1.0, include_provenance: bool = False,
):
    """Projected 1D row-parallel exec time for p chips.

    Returns a dict with the roofline terms, the exact plan comm volumes,
    and the projected times with/without comm-compute overlap.
    ``calibration`` scales the kernel term by (measured p=1 exec /
    projected p=1 exec) when an on-chip record exists.
    """
    from ..comm.exchange import build_b_exchange
    from ..plan.partition1d import csr_row_partition

    rates = _rates()
    itemsize = np.dtype(dtype).itemsize
    tn = 256 if n % 256 == 0 else 128
    n_pad = -(-n // tn) * tn

    # A slicing uses the row partition as-is; B ownership extends the last
    # slab to ncol like RowParaSpmm (rowpara.py:97-99) — one shared array
    # would crash row_slice on rectangular matrices (ncol != nrow)
    displs = csr_row_partition(a.rowptr, p)
    b_displs = displs
    if int(b_displs[-1]) < a.ncol:
        b_displs = b_displs.copy()
        b_displs[-1] = a.ncol
    shards = [
        a.row_slice(int(displs[i]), int(displs[i + 1])) for i in range(p)
    ]
    # one ragged geometry for the whole partition, resolved on the
    # largest-nnz shard — exactly what _pack_ragged does (all shards share
    # one kernel program), so the projected roofline prices the geometry
    # the pack will actually use at p > 1 (ADVICE r4)
    geometry = None
    live = [sh for sh in shards if sh.nnz > 0]
    if live:
        from ..kernels.spmm_ragged import resolve_ragged_geometry

        big = max(live, key=lambda sh: sh.nnz)
        big_loc, _, _ = big.localize() if reidx else (big, 0, 0)
        geometry = resolve_ragged_geometry(
            big_loc.rowptr, big_loc.colidx, mxu_prec
        )
    kernel_s = 0.0
    for sh in shards:
        if sh.nnz == 0:
            continue
        loc, _, _ = sh.localize() if reidx else (sh, 0, 0)
        hbm, flops, spill = _shard_kernel_terms(
            loc, n_pad, mxu_prec, itemsize, geometry=geometry
        )
        t = max(hbm / rates["hbm"], flops / rates["mxu"])
        t += spill * rates["spill_ns"] * 1e-9
        kernel_s = max(kernel_s, t)
    kernel_s *= calibration

    xplan = build_b_exchange(
        [s.colidx for s in shards], b_displs, reidx=reidx
    )
    # ring schedule: each chip sends and receives (p-1) shifts of S padded
    # rows concurrently — per-chip wire bytes per direction.  Width is the
    # logical n: the exchange runs before the kernel's n-tile padding.
    ring_bytes = (p - 1) * xplan.S * n * itemsize
    comm_s = ring_bytes / rates["ici"] if p > 1 else 0.0
    logical_rows = int(xplan.rB_recv_rows.max()) if p > 1 else 0

    return dict(
        p=p,
        kernel_s=round(kernel_s, 6),
        comm_s=round(comm_s, 6),
        projected_s=round(kernel_s + comm_s, 6),
        projected_overlap_s=round(max(kernel_s, comm_s), 6),
        comm_bytes_per_chip=int(ring_bytes),
        comm_rows_logical_max=logical_rows,
        rates=dict(
            mxu_tflops=rates["mxu"] / 1e12, hbm_gbps=rates["hbm"] / 1e9,
            ici_gbps=rates["ici"] / 1e9, spill_ns=rates["spill_ns"],
        ),
        # ~1.2 KB of constant text: emitted once per run, not per row
        **({"rate_provenance": RATE_PROVENANCE}
           if include_provenance else {}),
        calibration=round(calibration, 4),
    )


def project_scaling(a, n, procs, **kw):
    """Projection rows for a strong-scaling sweep (one dict per p)."""
    return [project_exec_1d(a, n, p, **kw) for p in procs]
