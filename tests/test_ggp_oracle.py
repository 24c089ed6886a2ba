"""Decision pinning for the GGGP METIS-fallback partitioner.

The planner is oracle-locked against the compiled reference, but the
partitioner at the bottom of the METIS seam's backend chain
(``sparse/reorder.py metis_partition_rows`` -> ``crp_ggp_partition``,
reference seam ``examples/metis_mat_part.c:44-62``) makes real decisions in
this libmetis-less environment with nothing pinning them (VERDICT r3
missing #3).  These fixtures (tests/fixtures/ggp_oracle.json, regenerated
by ``python tests/oracle/gen_ggp_oracle.py``) lock the exact part vectors
of both the native C++ partitioner and its numpy twin on the synthetic
suite — any change to their decisions, intended or not, shows up here.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from crp_tpu import native
from crp_tpu.sparse.csr import CSRMatrix
from crp_tpu.sparse.reorder import _ggp_partition_py
from crp_tpu.sparse.synth import (
    banded_random_csr, powerlaw_community_csr, powerlaw_random_csr,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ggp_oracle.json")


def _symmetrize(a):
    s = (a.to_scipy() + a.to_scipy().T).tocsr()
    return CSRMatrix.from_scipy(s)


def _matrix(spec):
    kind, *args = spec.split(":")
    args = [int(x) for x in args]
    if kind == "banded":
        n, deg, bw = args
        seed = {800: 60, 2000: 61}[n]
        return _symmetrize(
            banded_random_csr(n, nnz_per_row=deg, bandwidth=bw, seed=seed))
    if kind == "plaw":
        n, deg = args
        return _symmetrize(powerlaw_random_csr(n, avg_degree=deg, seed=62))
    if kind == "cplaw":
        n, deg, cs = args
        return _symmetrize(powerlaw_community_csr(
            n, avg_degree=deg, comm_size=cs, seed=63))
    raise ValueError(spec)


def _digest(part):
    return hashlib.sha256(
        np.ascontiguousarray(part, dtype=np.int32).tobytes()
    ).hexdigest()


def _cut_edges(a, part):
    rows = np.repeat(np.arange(a.nrow), np.diff(a.rowptr))
    return int((part[rows] != part[a.colidx]).sum())


with open(FIXTURE) as f:
    CASES = json.load(f)


@pytest.mark.parametrize(
    "case", CASES, ids=[f"{c['spec']}-p{c['nparts']}" for c in CASES]
)
def test_ggp_decisions_pinned(case):
    a = _matrix(case["spec"])
    assert a.nrow == case["nrow"] and a.nnz == case["nnz"]
    nparts = case["nparts"]
    impls = {"python": _ggp_partition_py(
        a.rowptr, a.colidx, nparts, case["imbalance"])}
    native_part = native.ggp_partition(
        a.rowptr, a.colidx, nparts, case["imbalance"])
    if native_part is not None:
        impls["native"] = native_part
    # (native presence itself is asserted by the quality test in
    # test_reorder_cli; toolchain-less boxes still verify the python pins)
    for name, part in impls.items():
        part = np.asarray(part, dtype=np.int32)
        exp = case[name]
        assert np.bincount(part, minlength=nparts).tolist() \
            == exp["part_sizes"], name
        assert _cut_edges(a, part) == exp["cut_edges"], name
        assert _digest(part) == exp["sha256"], name
