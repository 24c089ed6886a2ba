"""XLA-native baseline for the headline kernel's MXU work (round 2).

Computes the identical dense-window FLOPs as the windowed Pallas kernel —
852 groups of (256 x 5632) @ (5632 x 256) in the 3-pass bf16 scheme — as a
plain XLA batched einsum over materialized per-group B windows.  This is
the strongest formulation available WITHOUT a custom kernel (each group's
B window must be materialized; XLA has no window-sharing DMA), so it
bounds what a user would get from stock JAX and calibrates how much of the
chip the Pallas kernel's scheduling leaves on the table.

Appends one JSON line to bench_results/r2_tpu_einsum_baseline.jsonl.
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

    G, TM, W, TN = 852, 256, 5632, 256
    rng = np.random.default_rng(0)
    ah = rng.standard_normal((G, TM, W)).astype(jnp.bfloat16)
    al = (rng.standard_normal((G, TM, W)) * 2e-3).astype(jnp.bfloat16)
    bwin = rng.standard_normal((G, W, TN)).astype(np.float32)

    @jax.jit
    def x3(ah, al, bwin):
        bh = bwin.astype(jnp.bfloat16)
        bl = (bwin - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda x, y: jnp.einsum(
            "gmk,gkn->gmn", x, y, preferred_element_type=jnp.float32
        )
        return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))

    d = jax.device_put((ah, al, bwin))
    reduce = jax.jit(jnp.sum)
    c = x3(*d)
    float(reduce(c))
    K, times = 10, []
    for _ in range(3):
        t0 = time.time()
        for _ in range(K):
            c = x3(*d)
        float(reduce(c))
        times.append((time.time() - t0) / K)
    t = min(times)
    flops = 2.0 * G * TM * W * TN * 3
    rec = dict(
        variant="xla_batched_einsum_x3", G=G, TM=TM, W=W, TN=TN,
        exec_s=round(t, 5), achieved_tflops=round(flops / t / 1e12, 1),
        note="same dense FLOPs as the headline pallas kernel; B windows "
             "materialized per group (no cross-group window sharing)",
    )
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "r2_tpu_einsum_baseline.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
