"""Regenerate tests/fixtures/bandwidth_oracle.json.

Builds the reference v1 bandwidth planner driver
(/root/reference/deprecated/examples/crpspmm_calc_partition.c — the
standalone twin of the engine-embedded planner,
deprecated/src/crpspmm.c:133-195; linked, not copied), feeds it the test
suite's deterministic synthetic matrices as .mtx files, and records the
reference's split decisions, panel boundaries, B windows, and final B-copy
cost parsed from its step-by-step trace.  Run from the repo root:

    python tests/oracle/gen_bandwidth_oracle.py
"""

import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

from crp_tpu.sparse.csr import CSRMatrix  # noqa: E402
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_random_csr  # noqa: E402

REF_DEP = "/root/reference/deprecated/examples"
REF_EX = "/root/reference/examples"
HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "..", "fixtures", "bandwidth_oracle.json")


def interior_empty_matrix():
    """Empty rows strictly inside the nnz range: exercises the v1
    empty-row range quirk without the reference's out-of-bounds reads
    (first and last rows nonempty)."""
    rows, cols = [], []
    rng = np.random.default_rng(77)
    for i in range(0, 600, 3):  # rows 3j nonempty; 3j+1, 3j+2 empty
        for _ in range(4):
            rows.append(i)
            cols.append(int(rng.integers(max(0, i - 40), min(600, i + 40))))
    rows.append(599)
    cols.append(580)
    return CSRMatrix.from_coo(600, 600, np.array(rows), np.array(cols),
                              np.ones(len(rows)))


def oracle_cases():
    """(name, matrix, n, nproc) cases; mirrored in test_bandwidth_oracle.py."""
    cases = []
    banded = banded_random_csr(3000, nnz_per_row=9, bandwidth=120, seed=21)
    wide = banded_random_csr(2000, nnz_per_row=30, bandwidth=900, seed=23)
    plaw = powerlaw_random_csr(2500, avg_degree=14, seed=22)
    # rectangular both ways
    keep = banded.colidx < 2000
    rrows = np.repeat(np.arange(banded.nrow), np.diff(banded.rowptr))[keep]
    rect_mk = CSRMatrix.from_coo(3000, 2000, rrows, banded.colidx[keep],
                                 banded.val[keep])
    keep2 = banded.rowptr[2000]
    rect_km = CSRMatrix.from_coo(
        2000, 3000, np.repeat(np.arange(2000), np.diff(banded.rowptr[:2001])),
        banded.colidx[:keep2], banded.val[:keep2],
    )
    empties = interior_empty_matrix()
    for n in (1, 16, 256, 2048):
        for nproc in (2, 4, 8, 12, 16):
            cases.append((f"banded_n{n}_p{nproc}", banded, n, nproc))
            cases.append((f"plaw_n{n}_p{nproc}", plaw, n, nproc))
    for nproc in (6, 24, 64):
        cases.append((f"wide_n256_p{nproc}", wide, 256, nproc))
    cases.append(("rect_mk_n256_p8", rect_mk, 256, 8))
    cases.append(("rect_km_n256_p8", rect_km, 256, 8))
    cases.append(("rect_km_n64_p6", rect_km, 64, 6))
    cases.append(("empties_n64_p8", empties, 64, 8))
    cases.append(("empties_n256_p12", empties, 256, 12))
    return cases


def write_mtx(a: CSRMatrix, path: str) -> None:
    rows = np.repeat(np.arange(a.nrow), np.diff(a.rowptr))
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{a.nrow} {a.ncol} {a.nnz}\n")
        for r, c, v in zip(rows, a.colidx, a.val):
            f.write(f"{r + 1} {c + 1} {v:.1f}\n")


def parse_trace(text: str, m: int):
    """Extract the reference's final decisions from the step trace."""
    m_split, n_split = 1, 1
    cur_bounds = [0, m]
    cur_windows = None
    cur_copy_b = None
    steps = re.split(r"Step \d+, split size = \d+", text)[1:]
    decisions = []
    for step in steps:
        blocks = re.findall(
            r"Row block (\d+): \[(\d+), (\d+)\), B rows to copy: "
            r"\[(\d+), (\d+)\) \((-?\d+)\)", step
        )
        mline = re.search(r"Split M cost: copy A = \d+, copy B = (\d+)", step)
        choice = re.search(r"Split ([MN]), current m_split = (\d+), "
                           r"n_split = (\d+)", step)
        assert choice is not None, step
        decisions.append(choice.group(1))
        m_split, n_split = int(choice.group(2)), int(choice.group(3))
        if choice.group(1) == "M":
            bounds = [0] + [int(b[2]) for b in blocks]
            cur_bounds = bounds
            cur_windows = [[int(b[3]), int(b[4])] for b in blocks]
            cur_copy_b = int(mline.group(1))
    return {
        "pm": m_split,
        "pn": n_split,
        "m_split_idx": cur_bounds,
        "B_windows": cur_windows,          # None when pm == 1
        "copy_B_size": cur_copy_b,         # None when pm == 1
        "decisions": decisions,
    }


def main():
    exe = os.path.join(tempfile.gettempdir(), "crp_bw_oracle")
    subprocess.run(
        [
            "gcc", "-O2", "-fopenmp", "-I", REF_EX,
            "-I", "/root/reference/src",
            os.path.join(REF_DEP, "crpspmm_calc_partition.c"),
            os.path.join(REF_EX, "mmio.c"),
            os.path.join(REF_EX, "mmio_utils.c"),
            "-o", exe, "-lm",
        ],
        check=True,
    )
    out = {}
    for name, a, n, nproc in oracle_cases():
        with tempfile.NamedTemporaryFile("w", suffix=".mtx", delete=False) as f:
            path = f.name
        write_mtx(a, path)
        res = subprocess.run(
            [exe, path, str(n), str(nproc)],
            capture_output=True, text=True, check=True,
        )
        os.unlink(path)
        out[name] = parse_trace(res.stdout, a.nrow)
        print(name, "->", out[name]["pm"], "x", out[name]["pn"],
              "".join(out[name]["decisions"]))
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {len(out)} cases to {FIXTURE}")


if __name__ == "__main__":
    main()
