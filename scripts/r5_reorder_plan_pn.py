"""Fig.7 planner-pn analog: scrambled vs cluster-reordered cplaw.

The reference's Fig. 7 shows that RCM-reordering cage15 halves the
planner's chosen pn at every n (``plot_vary_n2.m:4-5``): less B-comm per
row block means splitting N pays off later.  This script reproduces the
effect with the planner alone (no chip): the exact-comm-count 2D planner
(``plan/planner2d.py``, oracle-locked against
``/root/reference/src/spmat_part.c``) is run per n on the SCRAMBLED
community power-law synthetic and on its ``cluster_reorder``-ed twin.

Host-only: re-execs onto the CPU platform before importing jax-adjacent
modules (sitecustomize registers the TPU backend at startup).

Usage:  python scripts/r5_reorder_plan_pn.py
Output: bench_results/r5_plan_pn_reorder.jsonl
"""

import json
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS", None) != "" or (
    os.environ.get("JAX_PLATFORMS") != "cpu"
):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import time  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPEC = os.environ.get("CRP_PN_SPEC", "synth:cplaw:786432:16:1024:85:perm")
NS = [int(x) for x in os.environ.get(
    "CRP_PN_NS", "16,64,128,256,512,1024,2048").split(",")]
NPROC = int(os.environ.get("CRP_PN_PROCS", 64))


def main() -> int:
    from crp_tpu.cli.plan_cli import load_matrix
    from crp_tpu.plan.planner2d import plan_from_csr
    from crp_tpu.sparse.reorder import cluster_reorder

    a = load_matrix(SPEC, need_symm=True)
    t0 = time.time()
    ar, _ = cluster_reorder(a)
    reorder_s = round(time.time() - t0, 1)
    out_path = os.path.join(REPO, "bench_results",
                            "r5_plan_pn_reorder.jsonl")
    with open(out_path, "w") as out:
        for label, mat in (("scrambled", a), ("cluster-reordered", ar)):
            for n in NS:
                t0 = time.time()
                plan = plan_from_csr(mat, n, NPROC)
                rec = dict(
                    spec=SPEC, variant=label, n=n, nproc=NPROC,
                    pm=plan.pm, pn=plan.pn,
                    comm_cost=int(plan.comm_cost),
                    plan_s=round(time.time() - t0, 2),
                )
                if label == "cluster-reordered" and n == NS[0]:
                    rec["reorder_s"] = reorder_s
                line = json.dumps(rec)
                print(line, flush=True)
                out.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
