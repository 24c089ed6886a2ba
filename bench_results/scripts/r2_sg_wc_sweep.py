"""On-chip sweep of the super-grouped kernel's SG / Wc knobs (round 2).

Packs the headline pwtk-class matrix ONCE, uploads the bf16-presplit A
panels once (~5 GB through the relay — the dominant cost), then times each
(SG, Wc) variant with pipelined execs.  Emits one JSON line per variant to
stdout and appends to bench_results/r2_tpu_sg_wc.jsonl.

Run on the real chip: python bench_results/scripts/r2_sg_wc_sweep.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from crp_tpu.sparse.synth import banded_random_csr, fill_b
    from crp_tpu.kernels.spmm_pallas import (
        TK, choose_chunks, pack_window_dense, plan_supergroups,
        spmm_window_pallas_sg_presplit,
    )

    nrow = int(os.environ.get("CRP_BENCH_NROW", 217918))
    n = 256
    a = banded_random_csr(nrow, nnz_per_row=53, bandwidth=2500, seed=1234,
                          dtype=np.float32)
    t0 = time.time()
    packed = pack_window_dense(a.rowptr, a.colidx, a.val, a.ncol)
    W, TM, G = packed.W, packed.TM, packed.G
    print(f"# packed G={G} W={W} TM={TM} in {time.time()-t0:.1f}s", flush=True)

    ah = packed.tiles.astype(ml_dtypes.bfloat16)
    al = (packed.tiles - ah.astype(np.float32)).astype(ml_dtypes.bfloat16)

    # variant set: the two largest feasible SG that DIVIDE G exactly (the
    # uploaded panels cannot be padded per variant), and the k-chunk ladder
    # (W divisors, TK-aligned).  The planner's no-pad tie-break lands on
    # the largest of these.
    ws_arr = np.asarray(packed.ws, dtype=np.int64)
    cap = (48 << 20) // (2 * 256 * 4)

    def plan_for(SG):
        sgc = G // SG
        bases = ws_arr[::SG][:sgc]
        spans = [
            int(ws_arr[min((s + 1) * SG, G) - 1] + W - bases[s])
            for s in range(sgc)
        ]
        Wsg = -(-max(spans) // TK) * TK
        return SG, int(Wsg), bases.astype(np.int32)

    feas = [plan_for(d) for d in range(2, 129) if G % d == 0]
    feas = [p for p in feas if p[1] <= cap]
    plans = {p[0]: p for p in sorted(feas)[-2:]}
    print(f"# planner default: {plan_supergroups(packed.ws, W, 256, 4)[:2]}",
          flush=True)
    wcs = sorted({choose_chunks(W)[1]} | {
        W // c for c in (1, 2, 4) if (W // c) % TK == 0
    })

    b = np.asarray(fill_b(0, a.ncol, 0, n, dtype=np.float32))
    need = max(int(p[2].max()) + p[1] for p in plans.values())
    bp = np.zeros((need, n), dtype=np.float32)
    bp[: a.ncol] = b

    t0 = time.time()
    d_ah, d_al, d_b = jax.device_put(ah), jax.device_put(al), jax.device_put(bp)
    jax.block_until_ready((d_ah, d_al, d_b))
    print(f"# upload {(ah.nbytes+al.nbytes+bp.nbytes)/1e9:.1f} GB "
          f"in {time.time()-t0:.1f}s", flush=True)

    reduce = jax.jit(jnp.sum)
    ref = None
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "r2_tpu_sg_wc.jsonl")
    recs = []
    for SG, Wsg, bases in plans.values():
        sgc = len(bases)
        for Wc in wcs:
            fn = jax.jit(lambda ws_, bs_, x, y, z, SG=SG, Wsg=Wsg, Wc=Wc:
                         spmm_window_pallas_sg_presplit(
                             ws_, bs_, x, y, z, SG, Wsg, W, TM, Wc=Wc))
            try:
                t0 = time.time()
                c = fn(packed.ws, bases, d_ah, d_al, d_b)
                s0 = float(reduce(c))
                compile_s = time.time() - t0
            except Exception as e:
                rec = dict(SG=SG, Wsg=Wsg, Wc=Wc,
                           error=f"{type(e).__name__}: {str(e)[:200]}")
                print(json.dumps(rec), flush=True)
                recs.append(rec)
                continue
            if ref is None:
                ref = s0
            K, times = 10, []
            for _ in range(3):
                t0 = time.time()
                for _ in range(K):
                    c = fn(packed.ws, bases, d_ah, d_al, d_b)
                float(reduce(c))
                times.append((time.time() - t0) / K)
            rec = dict(
                SG=SG, Wsg=Wsg, sgc=sgc, Wc=Wc, C=W // Wc,
                exec_s=round(min(times), 5), compile_s=round(compile_s, 1),
                pad_groups=sgc * SG - G, checksum_drift=abs(s0 - ref),
            )
            print(json.dumps(rec), flush=True)
            recs.append(rec)
    with open(out_path, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
