"""Host-side engine-init (pack) microbenchmark — no TPU needed.

The engines' init cost is dominated by the host pack + relay upload; the
pack half is measurable without a chip claim, so this script records it
independently of chip availability (the r3/r4 record queues carry the
on-chip init_breakdown rows; this pins the host term and the panel-byte
accounting the reach analysis depends on — VERDICT r3 weak #2/#3).

Reference analog: engine init time is one printed number in
``rp_spmm_print_stat`` (``src/rowpara_spmm.c:425``); the panel/CSR byte
ratio has no reference analog (MKL consumes CSR as-is) and is the
TPU-specific capacity metric.

Runs the single-shard pack exactly as a p=1 engine would (compact column
space = raw colidx at p=1), for each kernel form that has its own pack:

  * ragged @ x3 (bf16 hi/lo pair; the fp32 headline operating point)
  * ragged @ default (1-pass bf16)
  * gather (one-hot-MXU; O(nnz) arrays, no panels)
  * segsum (the baseline O(nnz) pack)

One JSON line per (spec, form):  PACK_SPECS / PACK_OUT override.
Usage: python scripts/pack_microbench.py [>> bench_results/r4_host_pack.jsonl]
"""

import json
import os
import sys
import time

# pack is pure host work: never let the import chain claim the TPU relay.
# The sitecustomize registers the axon backend at interpreter startup —
# before this module body — so setting env here is too late for the
# current process: re-exec with the CPU-platform env (conftest pattern).
if os.environ.get("PALLAS_AXON_POOL_IPS", None) != "" or (
    os.environ.get("JAX_PLATFORMS") != "cpu"
):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np  # noqa: E402


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from crp_tpu.cli.plan_cli import load_matrix
    from crp_tpu.kernels import dispatch

    specs = os.environ.get(
        "PACK_SPECS",
        "synth:cplaw:786432:16:1024,"
        "synth:banded:217918:53:2500,"
        "synth:banded:2600000:39:150",
    ).split(",")
    forms = os.environ.get("PACK_FORMS", "ragged_x3,ragged_bf16,gather,segsum")

    for spec in (s.strip() for s in specs if s.strip()):
        t0 = time.perf_counter()
        a = load_matrix(spec, need_symm=False)
        t_load = time.perf_counter() - t0
        # CSR footprint at the fp32 operating points (4B val + 4B col + ptr)
        csr_bytes = int(a.nnz) * 8 + a.rowptr.nbytes
        shard = [(
            np.ascontiguousarray(a.rowptr, np.int64),
            np.ascontiguousarray(a.colidx, np.int32),
            np.asarray(a.val),
        )]

        def one(form: str, fn, *args, **kw):
            t1 = time.perf_counter()
            try:
                arrays, local_fn = fn(*args, **kw)
            except Exception as e:  # UnsupportedSparsity etc — still a row
                print(json.dumps({
                    "spec": spec, "form": form, "nnz": int(a.nnz),
                    "load_s": round(t_load, 3), "error": f"{type(e).__name__}: {e}",
                }), flush=True)
                return
            t_pack = time.perf_counter() - t1
            total_bytes = int(sum(x.nbytes for x in arrays))
            rl = getattr(local_fn, "roofline", {}) or {}
            rec = {
                "spec": spec, "form": form, "nnz": int(a.nnz),
                "nrow": int(a.nrow), "ncol": int(a.ncol),
                "load_s": round(t_load, 3),
                "pack_s": round(t_pack, 3),
                "csr_bytes": csr_bytes,
                "device_bytes": total_bytes,
                "bytes_ratio": round(total_bytes / max(csr_bytes, 1), 2),
                "a_panel_bytes": int(rl.get("a_bytes", 0)),
                "S": int(rl.get("S", 0)),
                "spill_nnz": int(rl.get("spill_nnz", 0)),
                "TM": int(rl.get("TM", 0)), "Wc": int(rl.get("W", 0)),
                "host": "1vcpu",
            }
            print(json.dumps(rec), flush=True)

        if "pallas" in forms:
            # the dispatch chain as the engine runs it (uniform windowed
            # pack, routing to ragged when infeasible/wasteful) — the
            # headline config's actual init path
            one("pallas", dispatch._pack_pallas,
                shard, a.nrow, np.float32, "x3")
        if "ragged_x3" in forms:
            one("ragged_x3", dispatch._pack_ragged,
                shard, a.nrow, np.float32, "x3")
        if "ragged_bf16" in forms:
            one("ragged_bf16", dispatch._pack_ragged,
                shard, a.nrow, np.float32, "default")
        if "gather" in forms:
            one("gather", dispatch._pack_gather,
                shard, a.nrow, np.float32, "x3")
        if "segsum" in forms:
            one("segsum", dispatch.pack_local_kernel,
                shard, a.nrow, np.float32, "segsum")


if __name__ == "__main__":
    main()
