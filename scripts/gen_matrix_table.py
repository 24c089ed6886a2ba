"""Generate the consolidated on-chip results table (README Benchmarks).

Reads suite JSONL records and emits one markdown table relating matrix
class, kernel, operating point, s/exec, vs-reference, accuracy, and MFU —
the single table the scattered per-sweep records roll up into.

Usage: python scripts/gen_matrix_table.py [jsonl ...]
Defaults to the round-3 record set in bench_results/.
"""

import json
import sys

DEFAULT_FILES = [
    "bench_results/r5_tpu_spill_fused.jsonl",
    "bench_results/r5_tpu_groupout.jsonl",
    "bench_results/r5_tpu_slots.jsonl",
    "bench_results/r5_tpu_cplaw_dd.jsonl",
    "bench_results/r4_tpu_geometry.jsonl",
    "bench_results/r4_tpu_spill_impl.jsonl",
    "bench_results/r4_tpu_reorder.jsonl",
    "bench_results/r3_tpu_matrix.jsonl",
    "bench_results/r3_tpu_plaw.jsonl",
    "bench_results/r3_tpu_dd.jsonl",
    "bench_results/r3_tpu_bigmat.jsonl",
    "bench_results/r3_tpu_plaw_tm.jsonl",
    "bench_results/r3_tpu_halo_smoke.jsonl",
]

REFERENCE_SECONDS = 1.060  # reference README pwtk n=256 published number

# matrix-class labels for records that predate the "spec" field
M_CLASS = {
    217918: "pwtk-class banded (11.6M nnz)",
    786432: "cplaw social-graph analog (10.8M nnz)",
    2600000: "big banded (95M nnz, cage15-class reach)",
    50000: "banded 50k rows",
}


def classify(rec):
    spec = rec.get("spec")
    m = rec.get("matrix", {}).get("m")
    if m in M_CLASS:
        return M_CLASS[m]
    return spec or f"m={m}"


def fmt(rec):
    ex = rec["exec_s"]
    t = ex["min"] if isinstance(ex, dict) else float(ex)
    prec = (rec.get("roofline") or {}).get("mxu_prec")
    kern = rec.get("kernel_resolved", rec.get("kernel"))
    if rec.get("dtype") == "float64":
        point = kern  # dd / dd_mxu are their own operating points
    else:
        point = f"{kern}/{prec}" if prec else kern
    # distinguish A/B rows sharing one kernel/point (spill impls, pinned
    # geometry, reorder) so dedup does not silently merge them
    knobs = rec.get("knobs", {})
    tags = []
    if knobs.get("CRP_TPU_SPILL_IMPL"):
        tags.append(f"spill={knobs['CRP_TPU_SPILL_IMPL']}")
    if knobs.get("CRP_TPU_SPILL_TMO") or knobs.get("CRP_TPU_SPILL_Q"):
        tags.append(
            f"spillgeo={knobs.get('CRP_TPU_SPILL_TMO', '?')}x"
            f"{knobs.get('CRP_TPU_SPILL_Q', '?')}"
        )
    if knobs.get("CRP_TPU_RAGGED_TM") or knobs.get("CRP_TPU_RAGGED_WC"):
        tags.append(
            f"TMxWc={knobs.get('CRP_TPU_RAGGED_TM', '?')}x"
            f"{knobs.get('CRP_TPU_RAGGED_WC', '?')}"
        )
    if knobs.get("CRP_TPU_RAGGED_AUTO") == "0":
        tags.append("fixed-geom")
    if knobs.get("CRP_TPU_RAGGED_SLOTS"):
        tags.append(f"slots={knobs['CRP_TPU_RAGGED_SLOTS']}")
    if rec.get("reorder"):
        tags.append(f"reorder={rec['reorder']['method']}")
    if rec.get("spec", "").endswith(":perm") and not rec.get("reorder"):
        tags.append("scrambled")
    if tags:
        point += " (" + ", ".join(tags) + ")"
    vs = REFERENCE_SECONDS / t if rec.get("matrix", {}).get("m") == 217918 \
        and rec.get("n") == 256 else None
    mfu = (rec.get("roofline") or {}).get("mxu_util")
    return dict(
        cls=classify(rec), point=point, n=rec.get("n"), t=t, vs=vs,
        err=rec.get("rel_fro_err"), mfu=mfu,
    )


def main(files):
    rows = []
    for f in files:
        try:
            with open(f) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if "error" in rec or "exec_s" not in rec:
                        continue
                    if rec.get("matrix", {}).get("m") is None:
                        continue  # foreign schema (microbench rows etc.)
                    rows.append(fmt(rec))
        except FileNotFoundError:
            print(f"(skipping missing {f})", file=sys.stderr)
    # dedup identical (cls, point, n): keep fastest
    best = {}
    for r in rows:
        key = (r["cls"], r["point"], r["n"])
        if key not in best or r["t"] < best[key]["t"]:
            best[key] = r
    rows = sorted(best.values(), key=lambda r: (r["cls"], r["t"]))

    print("# Consolidated on-chip results "
          "(roll-up of bench_results/*.jsonl)")
    print()
    print("Regenerate with `python scripts/gen_matrix_table.py > "
          "bench_results/MATRIX_TABLE.md` after each chip window.")
    print()
    print("| matrix class | kernel/point | n | s/exec | vs reference "
          "(1.060 s) | rel err | MFU |")
    print("|---|---|---|---|---|---|---|")
    last_cls = None
    for r in rows:
        cls = r["cls"] if r["cls"] != last_cls else ""
        last_cls = r["cls"]
        vs = f"**{r['vs']:.0f}x**" if r["vs"] else "—"
        mfu = f"{r['mfu'] * 100:.0f}%" if r["mfu"] else "—"
        err = f"{r['err']:.1e}" if r["err"] is not None else "—"
        print(f"| {cls} | {r['point']} | {r['n']} | {r['t']:.4f} | {vs} "
              f"| {err} | {mfu} |")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_FILES)
