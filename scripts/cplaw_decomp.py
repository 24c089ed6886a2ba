"""Decompose the cplaw 0.080 s exec: ragged kernel vs spill add, on chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crp_tpu.sparse.synth import powerlaw_community_csr, fill_b
from crp_tpu.kernels.dispatch import pack_local_kernel
from crp_tpu.kernels.spmm_ragged import (
    spmm_ragged_presplit, spmm_spill_chunked,
)

import jax
import jax.numpy as jnp

N = 786432
NB = 256
A = powerlaw_community_csr(N, avg_degree=16, comm_size=1024)
print("nnz", A.rowptr[-1], flush=True)

t0 = time.time()
arrays, local_fn = pack_local_kernel(
    [(A.rowptr, A.colidx, A.val)], N, np.float32,
    kind="ragged", mxu_precision="x3",
)
print("pack_s", round(time.time() - t0, 1), flush=True)

arrs_np = [a[0] for a in arrays]
ah = arrs_np[3]
S, TM, Wc = ah.shape
G = N // TM
print("S", S, "TM", TM, "Wc", Wc, "spill_nnz", len(arrs_np[-1]), flush=True)

rows = max(local_fn.min_b_rows, N)
b = np.zeros((rows, NB), np.float32)
b[:N] = fill_b(0, N, 0, NB, dtype=np.float32)

arrs = [jnp.asarray(a) for a in arrs_np]
rB = jnp.asarray(b)
kw = dict(G=G, TM=TM, Wc=Wc)


_reduce = None


def timeit(name, fn, *args):
    """Min-of-3 x 5-inner timing with a device->host scalar fence — the
    tunneled relay's block_until_ready does not block (suite_cli pattern,
    ``float(reduce(c))`` at suite_cli.py:224)."""
    global _reduce
    if _reduce is None:
        _reduce = jax.jit(jnp.sum)
    f = jax.jit(fn)
    out = f(*args)
    float(_reduce(out))  # compile fence
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            out = f(*args)
        float(_reduce(out))
        best = min(best, (time.time() - t0) / 5)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)
    return out


full = timeit("full local_fn", local_fn, arrs, rB)

kern = timeit(
    "ragged kernel only",
    lambda a0, a1, a2, a3, a4, rb: spmm_ragged_presplit(
        a0, a1, a2, a3, a4, rb, **kw
    ),
    *arrs[:5], rB,
)

spill = timeit(
    "spill add only",
    lambda r, cl, v, rb: spmm_spill_chunked(r, cl, v, rb, G * TM),
    arrs[-3], arrs[-2], arrs[-1], rB,
)

# spill sub-terms
g = timeit(
    "spill take only",
    lambda cl, rb: jnp.take(rb, cl, axis=0, fill_value=0),
    arrs[-2], rB,
)
contrib = timeit(
    "spill take+mul",
    lambda cl, v, rb: v[:, None] * jnp.take(rb, cl, axis=0, fill_value=0),
    arrs[-2], arrs[-1], rB,
)
timeit(
    "spill segsum only (pre-gathered contrib)",
    lambda r, ct: jax.ops.segment_sum(
        ct, r, num_segments=G * TM + 1, indices_are_sorted=True
    )[: G * TM],
    arrs[-3], contrib,
)
timeit("final c-add only", lambda a, b_: a + b_, kern, spill)

ref = kern + spill
err = float(jnp.linalg.norm(full - ref) / jnp.linalg.norm(full))
print("decomp consistency rel err", err, flush=True)
