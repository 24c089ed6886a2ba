"""On-chip microbenchmark of spill-path formulations (ragged kernel VPU tail).

The ragged hybrid's spill path costs ~21 ns/nnz through XLA's
take + sorted segment_sum (r3 measurement), while the pure-bandwidth
roofline for "gather one B row + scatter one C row" at n=256 fp32 is
~3 ns/nnz — this script times candidate formulations on the REAL chip to
find a faster tail:

  segsum     take(fill) + segment_sum(sorted)          (current fast path)
  segsum_nf  take(mode=clip) + segment_sum             (no fill branch)
  ell        pad per-row spill to (nrow', R) ELL, gather + sum over R
  bf16       gather from a bf16 copy of B (half HBM traffic; default-prec
             accuracy only)
  twopass    dedup columns, gather unique, second take from compact temp

Writes one JSON line per variant; run with the chip idle.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, ntest=5, inner=20):
    import jax
    import jax.numpy as jnp

    reduce = jax.jit(jnp.sum)
    c = fn(*args)
    float(reduce(c))
    times = []
    for _ in range(ntest):
        t0 = time.perf_counter()
        for _ in range(inner):
            c = fn(*args)
        float(reduce(c))
        times.append((time.perf_counter() - t0) / inner)
    return float(np.min(times))


def main():
    import jax
    import jax.numpy as jnp

    from crp_tpu.cli.plan_cli import load_matrix
    from crp_tpu.kernels.spmm_ragged import (
        pack_ragged_window, ragged_params, default_min_chunk_nnz,
    )

    spec = os.environ.get("SPILL_SPEC", "synth:cplaw:786432:16:1024")
    n = int(os.environ.get("SPILL_N", 256))
    a = load_matrix(spec, need_symm=False)
    TM, Wc = ragged_params()
    rw = pack_ragged_window(
        a.rowptr, a.colidx, a.val, a.ncol, TM=TM, Wc=Wc,
        min_chunk_nnz=default_min_chunk_nnz(TM, Wc), dtype=np.float32,
    )
    assert rw.spill is not None, "no spill at this spec"
    r, c_, v = rw.spill
    order = np.argsort(r, kind="stable")
    r, c_, v = r[order], c_[order], v[order]
    z = len(r)
    nrow = a.nrow
    print(f"# spec={spec} spill_nnz={z} nrow={nrow} n={n}", file=sys.stderr)

    b = np.random.default_rng(7).standard_normal((a.ncol, n)).astype(np.float32)
    bj = jnp.asarray(b)
    rj, cj, vj = jnp.asarray(r), jnp.asarray(c_), jnp.asarray(v)

    ref = None
    results = {}

    # current: take(fill) + sorted segment_sum
    @jax.jit
    def f_segsum(rows, cols, vals, bb):
        contrib = vals[:, None] * jnp.take(bb, cols, axis=0, fill_value=0)
        return jax.ops.segment_sum(
            contrib, rows, num_segments=nrow + 1, indices_are_sorted=True
        )[:nrow]

    t = timeit(f_segsum, rj, cj, vj, bj)
    ref = np.asarray(f_segsum(rj, cj, vj, bj))
    results["segsum"] = t

    # no-fill take (clip mode)
    @jax.jit
    def f_clip(rows, cols, vals, bb):
        contrib = vals[:, None] * jnp.take(bb, cols, axis=0, mode="clip")
        return jax.ops.segment_sum(
            contrib, rows, num_segments=nrow + 1, indices_are_sorted=True
        )[:nrow]

    results["segsum_clip"] = timeit(f_clip, rj, cj, vj, bj)

    # bf16 gather source (halves gather bytes; accuracy ~1e-3 class)
    bh = bj.astype(jnp.bfloat16)

    @jax.jit
    def f_bf16(rows, cols, vals, bb16):
        contrib = vals[:, None] * jnp.take(
            bb16, cols, axis=0, mode="clip"
        ).astype(jnp.float32)
        return jax.ops.segment_sum(
            contrib, rows, num_segments=nrow + 1, indices_are_sorted=True
        )[:nrow]

    results["segsum_bf16"] = timeit(f_bf16, rj, cj, vj, bh)

    # ELL: pad per-row spill counts to R slots (cap R; excess rows repeat)
    counts = np.bincount(r, minlength=nrow)
    R = int(os.environ.get("SPILL_ELL_R", 0)) or int(
        np.percentile(counts[counts > 0], 99)
    )
    # split rows with >R spill into multiple virtual segments (vectorized):
    # within-row rank k -> (segment = global cumsum of ceil-chunks, slot =
    # k mod R)
    starts = np.zeros(nrow + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    k = np.arange(z, dtype=np.int64) - starts[r]
    segs_per_row = -(-counts // R)
    seg_base = np.zeros(nrow + 1, dtype=np.int64)
    np.cumsum(segs_per_row, out=seg_base[1:])
    seg_of = seg_base[r] + k // R
    slot_of = k % R
    ns = int(seg_base[-1])
    e_cols_np = np.zeros((ns, R), dtype=np.int32)
    e_vals_np = np.zeros((ns, R), dtype=np.float32)
    e_cols_np[seg_of, slot_of] = c_
    e_vals_np[seg_of, slot_of] = v
    e_rows_np = np.repeat(
        np.arange(nrow, dtype=np.int32), segs_per_row.astype(np.int64)
    )
    e_rows = jnp.asarray(e_rows_np)
    e_cols = jnp.asarray(e_cols_np)
    e_vals = jnp.asarray(e_vals_np)
    print(f"# ELL R={R} segments={ns} pad_factor={ns*R/z:.2f}",
          file=sys.stderr)

    @jax.jit
    def f_ell(rows, cols, vals, bb):
        g = jnp.take(bb, cols.reshape(-1), axis=0, mode="clip").reshape(
            ns, R, n
        )
        contrib = jnp.einsum("sr,srn->sn", vals, g)
        return jax.ops.segment_sum(
            contrib, rows, num_segments=nrow + 1, indices_are_sorted=True
        )[:nrow]

    t = timeit(f_ell, e_rows, e_cols, e_vals, bj)
    out = np.asarray(f_ell(e_rows, e_cols, e_vals, bj))
    err = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-30)
    results["ell"] = t
    print(f"# ell rel err vs segsum: {err:.2e}", file=sys.stderr)

    # segblock: replace the 2M-index scatter with per-step one-hot MXU
    # matmuls + a block-level scatter (Q nnz per step, each step's rows
    # confined to one TMo-row output block -> segment ids shrink by ~Q).
    # The one-hot is exact in bf16; HIGHEST keeps contrib fp32-exact.
    Q, TMo = 128, 128
    blk = r // TMo
    # split steps at block boundaries: step id = (within-block rank // Q)
    # cumulated per block
    b_starts = np.zeros(z + 1, dtype=np.int64)
    change = np.flatnonzero(np.diff(blk)) + 1
    starts_of_run = np.concatenate([[0], change])
    run_of = np.repeat(np.arange(len(starts_of_run)), np.diff(
        np.concatenate([starts_of_run, [z]])))
    rank_in_blk = np.arange(z) - starts_of_run[run_of]
    steps_per_run = -(-np.diff(np.concatenate([starts_of_run, [z]])) // Q)
    step_base = np.zeros(len(starts_of_run) + 1, dtype=np.int64)
    np.cumsum(steps_per_run, out=step_base[1:])
    step_of = step_base[run_of] + rank_in_blk // Q
    slot = rank_in_blk % Q
    ns2 = int(step_base[-1])
    sb_rel = np.zeros((ns2, Q), dtype=np.int32)
    sb_cols = np.zeros((ns2, Q), dtype=np.int32)
    sb_vals = np.zeros((ns2, Q), dtype=np.float32)
    sb_rel[step_of, slot] = (r - blk * TMo).astype(np.int32)
    # pad slots point at row 0 with val 0 (harmless)
    sb_cols[step_of, slot] = c_
    sb_vals[step_of, slot] = v
    sb_blk = np.zeros(ns2, dtype=np.int32)
    sb_blk[step_of] = blk.astype(np.int32)
    nblk = -(-nrow // TMo)
    print(f"# segblock steps={ns2} pad={ns2*Q/z:.2f} blocks={nblk}",
          file=sys.stderr)
    sb_rel_j = jnp.asarray(sb_rel)
    sb_cols_j = jnp.asarray(sb_cols)
    sb_vals_j = jnp.asarray(sb_vals)
    sb_blk_j = jnp.asarray(sb_blk)

    def make_segblock(prec):
        @jax.jit
        def f_segblock(rel, cols, vals, blkid, bb):
            g = jnp.take(bb, cols.reshape(-1), axis=0, mode="clip").reshape(
                ns2, Q, n
            )
            contrib = vals[:, :, None] * g
            oneh = (
                rel[:, None, :]
                == jax.lax.broadcasted_iota(jnp.int32, (1, TMo, 1), 1)
            ).astype(jnp.float32)
            partial = jax.lax.dot_general(
                oneh, contrib,
                ((([2], [1])), (([0], [0]))),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
            out = jax.ops.segment_sum(
                partial, blkid, num_segments=nblk,
                indices_are_sorted=True,
            )
            return out.reshape(nblk * TMo, n)[:nrow]
        return f_segblock

    for prec, tag in ((jax.lax.Precision.HIGHEST, "segblock"),
                      (jax.lax.Precision.DEFAULT, "segblock_def")):
        f = make_segblock(prec)
        t = timeit(f, sb_rel_j, sb_cols_j, sb_vals_j, sb_blk_j, bj)
        out = np.asarray(f(sb_rel_j, sb_cols_j, sb_vals_j, sb_blk_j, bj))
        err = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-30)
        results[tag] = t
        print(f"# {tag} rel err vs segsum: {err:.2e}", file=sys.stderr)

    # fused pallas one-hot-MXU segmented reduce (CRP_TPU_SPILL_IMPL=pallas):
    # the production spill path — bulk take + block reduce, no scatter
    from crp_tpu.kernels.spmm_ragged import (
        pack_spill_blocks, spmm_spill_pallas,
    )

    M = -(-nrow // 128) * 128
    order_bc = np.lexsort((c_, r // 128))
    rp, cp, vp = r[order_bc], c_[order_bc], v[order_bc]
    counts_b = np.bincount(rp // 128, minlength=M // 128)
    ns_p = int(np.maximum(-(-counts_b // 128), 1).sum())
    prel, pcols, pvals, pfirst, pblk = pack_spill_blocks(
        (rp, cp, vp), ns_p, M, np.float32
    )
    c0 = jnp.zeros((M, n), jnp.float32)

    # pass the pack as jit ARGUMENTS (closures bake MB-scale constants
    # into the HLO -> relay HTTP 413)
    pargs = tuple(jnp.asarray(x) for x in (prel, pcols, pvals, pfirst, pblk))
    for prec, tag in (("x3", "pallas_x3"), ("highest", "pallas_hi")):
        interp = jax.default_backend() != "tpu"
        fn = jax.jit(
            lambda cc, rel2, cols2, vals2, first2, blk2, bb, _p=prec:
            spmm_spill_pallas(cc, rel2, cols2, vals2, first2, blk2, bb,
                              mxu_precision=_p, interpret=interp)
        )
        t = timeit(fn, c0, *pargs, bj)
        out = np.asarray(fn(c0, *pargs, bj))[:nrow]
        err = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-30)
        results[tag] = t
        print(f"# {tag} rel err vs segsum: {err:.2e} (steps={ns_p}, "
              f"pad={ns_p * 128 / z:.2f})", file=sys.stderr)

    # two-pass: dedup cols -> compact gather -> indexed second gather
    uniq, inv = np.unique(c_, return_inverse=True)
    uj, ij = jnp.asarray(uniq.astype(np.int32)), jnp.asarray(
        inv.astype(np.int32)
    )
    print(f"# unique spill cols: {len(uniq)} ({len(uniq)/z:.2f} of nnz)",
          file=sys.stderr)

    @jax.jit
    def f_twopass(rows, u, iv, vals, bb):
        compact = jnp.take(bb, u, axis=0, mode="clip")
        contrib = vals[:, None] * jnp.take(compact, iv, axis=0, mode="clip")
        return jax.ops.segment_sum(
            contrib, rows, num_segments=nrow + 1, indices_are_sorted=True
        )[:nrow]

    results["twopass"] = timeit(f_twopass, rj, uj, ij, vj, bj)

    for k, t in results.items():
        print(json.dumps(dict(
            variant=k, spill_nnz=z, n=n, s=round(t, 6),
            ns_per_nnz=round(t / z * 1e9, 2), spec=spec,
        )))


if __name__ == "__main__":
    main()
