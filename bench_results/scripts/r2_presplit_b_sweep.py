"""On-chip A/B-presplit kernel comparison (round 2).

Variants at the headline shape (pwtk-class, n=256, SG=71, Wc=W):
  1. presplit-A, fp32 B window, in-kernel B split  (previous best)
  2. presplit-A+B (bf16 halves in HBM, pure-MXU kernel), 3 passes
  3. presplit-A+B, 1 pass (bf16 operating point)
Records exec seconds AND the true relative Frobenius error per variant.
Appends to bench_results/r2_tpu_presplit_b.jsonl.
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
        TK, pack_window_dense, spmm_window_pallas_sg_bf16,
        spmm_window_pallas_sg_presplit, spmm_window_pallas_sg_presplit_ab,
        split_b_bf16,
    )
    from crp_tpu.utils.norms import rel_fro_err

    nrow = int(os.environ.get("CRP_BENCH_NROW", 217918))
    n = 256
    a = banded_random_csr(nrow, nnz_per_row=53, bandwidth=2500, seed=1234,
                          dtype=np.float32)
    packed = pack_window_dense(a.rowptr, a.colidx, a.val, a.ncol)
    W, TM, G = packed.W, packed.TM, packed.G
    ah = packed.tiles.astype(ml_dtypes.bfloat16)
    al = (packed.tiles - ah.astype(np.float32)).astype(ml_dtypes.bfloat16)

    ws_arr = np.asarray(packed.ws, dtype=np.int64)
    SG = 71
    sgc = G // SG
    bases = ws_arr[::SG][:sgc]
    spans = [int(ws_arr[min((s + 1) * SG, G) - 1] + W - bases[s])
             for s in range(sgc)]
    Wsg = -(-max(spans) // TK) * TK
    bases = bases.astype(np.int32)
    print(f"# G={G} W={W} SG={SG} Wsg={Wsg}", flush=True)

    b = np.asarray(fill_b(0, a.ncol, 0, n, dtype=np.float32))
    need = int(bases.max()) + Wsg
    bp = np.zeros((need, n), dtype=np.float32)
    bp[: a.ncol] = b
    ref = a.spmm_ref(b.astype(np.float64))

    d_ah, d_al, d_b = jax.device_put(ah), jax.device_put(al), jax.device_put(bp)
    d_bh, d_bl = jax.jit(split_b_bf16)(d_b)
    jax.block_until_ready((d_ah, d_al, d_b, d_bh, d_bl))

    reduce = jax.jit(jnp.sum)

    # NB: big operands MUST be jit ARGUMENTS — closure-captured arrays are
    # baked into the lowered HLO as constants, which the compile relay
    # serializes (minutes of host CPU) or rejects (HTTP 413)
    f_a = jax.jit(lambda ws_, bs_, x, y, z: spmm_window_pallas_sg_presplit(
        ws_, bs_, x, y, z, SG, Wsg, W, TM, Wc=W))
    f_ab3 = jax.jit(
        lambda ws_, bs_, x, y, h, l: spmm_window_pallas_sg_presplit_ab(
            ws_, bs_, x, y, h, l, SG, Wsg, W, TM, Wc=W))
    f_b1 = jax.jit(lambda ws_, bs_, x, h: spmm_window_pallas_sg_bf16(
        ws_, bs_, x, h, SG, Wsg, W, TM, Wc=W))
    variants = {
        "presplit_a_x3":
            lambda: f_a(packed.ws, bases, d_ah, d_al, d_b),
        "presplit_ab_x3":
            lambda: f_ab3(packed.ws, bases, d_ah, d_al, d_bh, d_bl),
        "bf16_1pass":
            lambda: f_b1(packed.ws, bases, d_ah, d_bh),
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "r2_tpu_presplit_b.jsonl")
    recs = []
    for name, fn in variants.items():
        try:
            t0 = time.time()
            c = fn()
            float(reduce(c))
            compile_s = time.time() - t0
            err = float(rel_fro_err(ref, np.asarray(c[: a.nrow]).astype(np.float64)))
        except Exception as e:
            rec = dict(variant=name,
                       error=f"{type(e).__name__}: {str(e)[:300]}")
            print(json.dumps(rec), flush=True)
            recs.append(rec)
            continue
        K, times = 10, []
        for _ in range(3):
            t0 = time.time()
            for _ in range(K):
                c = fn()
            float(reduce(c))
            times.append((time.time() - t0) / K)
        rec = dict(variant=name, exec_s=round(min(times), 5),
                   compile_s=round(compile_s, 1), rel_fro_err=err)
        print(json.dumps(rec), flush=True)
        recs.append(rec)
    with open(out_path, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
