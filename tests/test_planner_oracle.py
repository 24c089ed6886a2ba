"""Planner-oracle parity: byte-identical boundaries vs the reference planner.

``tests/fixtures/planner_oracle.json`` holds the output of the *compiled
reference planner* (``/root/reference/src/spmat_part.c``, see
``tests/oracle/gen_planner_oracle.py``) on deterministic synthetic matrices.
Given the same matrix, p, and n, the new planner must produce the same
``pm x pn`` grid, the same comm cost, and the same four boundary arrays —
the acceptance criterion set by SURVEY.md sections 3.5 and 7 (stage 1).
"""

import json
import os

import numpy as np
import pytest

from crp_tpu.plan.partition1d import csr_row_partition
from crp_tpu.plan.planner2d import calc_spmm_part2d_from_1d
from tests.oracle.gen_planner_oracle import oracle_cases

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "planner_oracle.json")


@pytest.fixture(scope="module")
def oracle():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "case", [c[0] for c in oracle_cases()],
)
def test_planner_matches_reference(case, oracle):
    by_name = {c[0]: c for c in oracle_cases()}
    _, a, n, nproc, rA = by_name[case]
    expect = oracle[case]

    rb = csr_row_partition(a.rowptr, nproc)
    np.testing.assert_array_equal(rb, expect["rb_displs0"],
                                  err_msg="1D row partition mismatch")
    plan = calc_spmm_part2d_from_1d(
        nproc, a.nrow, n, a.ncol, rb, a.rowptr, a.colidx, rA=rA
    )
    assert (plan.pm, plan.pn) == (expect["pm"], expect["pn"])
    assert plan.comm_cost == expect["comm_cost"]
    np.testing.assert_array_equal(plan.A0_rowptr, expect["A0_rowptr"])
    np.testing.assert_array_equal(plan.B_rowptr, expect["B_rowptr"])
    np.testing.assert_array_equal(plan.AC_rowptr, expect["AC_rowptr"])
    np.testing.assert_array_equal(plan.BC_colptr, expect["BC_colptr"])
