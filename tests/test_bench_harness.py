"""bench.py harness regressions (VERDICT r3 weak #5).

The round headline depends on bench.py surviving the flaky relay: one
backend hiccup cost round 3 its record (BENCH_r03.json rc=1, raw
traceback).  These tests run the real script as a subprocess on the CPU
backend and check (a) the success path emits one parseable JSON line with
the accuracy field, (b) a transient failure retries then emits a
structured error record instead of a traceback.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env, timeout=420):
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        CRP_BENCH_NROW="4000",
        CRP_BENCH_NTEST="1",
        CRP_BENCH_INNER="2",
        **extra_env,
    )
    env.pop("CRP_BENCH_CHILD", None)
    env.pop("JAX_ENABLE_X64", None)  # conftest x64 is irrelevant here
    return subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, env=env,
    )


def _last_json(out):
    lines = [l for l in out.splitlines() if l.strip().startswith("{")]
    assert lines, out
    return json.loads(lines[-1])


def test_bench_success_emits_headline_with_accuracy():
    res = _run({})
    assert res.returncode == 0, res.stderr[-2000:]
    rec = _last_json(res.stdout)
    assert rec["unit"] == "s" and rec["value"] > 0
    assert rec["vs_baseline"] > 0
    # the reference's acceptance metric rides in every headline
    assert 0 <= rec["rel_fro_err"] < 1e-4
    assert "init_breakdown" in rec


def test_bench_transient_failure_yields_structured_record():
    # an injected relay-style fault is classified transient: one retry,
    # then a structured {"error": ...} JSON line — never a bare traceback
    res = _run({
        "CRP_BENCH_TEST_FAIL": "UNAVAILABLE: injected relay fault (test)",
        "CRP_BENCH_RETRIES": "2",
        "CRP_BENCH_RETRY_BACKOFF_S": "1",
    })
    # rc 0: a structured record was printed — the driver's "parsed" field
    # is the artifact that matters, not the exit code (VERDICT r4 weak #1)
    assert res.returncode == 0
    rec = _last_json(res.stdout)
    assert rec["value"] is None
    assert "error" in rec and len(rec["attempts"]) == 2
    # the failure record carries the last measured headline
    assert rec["last_good"]["value"] > 0
    assert rec["last_good"]["unit"] == "s"


def test_bench_nontransient_failure_does_not_retry():
    res = _run({
        "CRP_BENCH_TEST_FAIL": "ValueError: a real bug (test)",
        "CRP_BENCH_RETRIES": "3",
        "CRP_BENCH_RETRY_BACKOFF_S": "1",
    })
    assert res.returncode == 0
    rec = _last_json(res.stdout)
    assert "error" in rec and len(rec["attempts"]) == 1


def test_bench_total_budget_bounds_retries():
    # a wedged claim must not eat the round: the total budget stops the
    # retry loop even when attempts keep being classified transient
    res = _run({
        "CRP_BENCH_TEST_FAIL": "UNAVAILABLE: injected relay fault (test)",
        "CRP_BENCH_RETRIES": "50",
        "CRP_BENCH_RETRY_BACKOFF_S": "4",
        "CRP_BENCH_TOTAL_TIMEOUT_S": "6",
    }, timeout=120)
    assert res.returncode == 0
    rec = _last_json(res.stdout)
    assert "error" in rec
    assert len(rec["attempts"]) <= 4


def test_bench_hung_claim_is_terminated_and_recorded():
    # the wedged-chip failure mode: the child hangs in the relay claim
    # poll and never returns.  The supervisor must SIGTERM it at the
    # attempt timeout, classify the timeout transient, retry within the
    # total budget, and still emit one structured JSON record.
    res = _run({
        "CRP_BENCH_TEST_HANG": "1",
        "CRP_BENCH_RETRIES": "3",
        "CRP_BENCH_RETRY_BACKOFF_S": "1",
        "CRP_BENCH_ATTEMPT_TIMEOUT_S": "4",
        "CRP_BENCH_TOTAL_TIMEOUT_S": "12",
    }, timeout=180)
    assert res.returncode == 0
    rec = _last_json(res.stdout)
    assert rec["value"] is None
    assert "timed out" in rec["error"]
    assert 2 <= len(rec["attempts"]) <= 4


def test_bench_dead_backend_under_outer_timeout_still_parses():
    # VERDICT r4 next-2 acceptance: a dead backend under a 600 s outer
    # `timeout` must yield rc=0 and a parseable line.  The hang child
    # stands in for the dead relay's claim poll; DEFAULT-shaped budgets
    # are scaled down only via the deadline env the queue scripts pass.
    import time as _time
    res = _run({
        "CRP_BENCH_TEST_HANG": "1",
        "CRP_BENCH_DEADLINE_EPOCH": str(_time.time() + 60),
        "CRP_BENCH_ATTEMPT_TIMEOUT_S": "5",
        "CRP_BENCH_RETRY_BACKOFF_S": "2",
    }, timeout=120)
    assert res.returncode == 0
    rec = _last_json(res.stdout)
    assert rec["value"] is None and "error" in rec
    assert rec["last_good"]["value"] > 0


def test_bench_sigterm_mid_run_prints_record():
    # an external `timeout` fires SIGTERM first: the supervisor must use
    # the grace window to print the structured record (BENCH_r04 died in
    # backoff with NOTHING on stdout — the failure mode this pins)
    import signal as _signal
    import time as _time

    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        CRP_BENCH_TEST_HANG="1",
        CRP_BENCH_ATTEMPT_TIMEOUT_S="600",
        CRP_BENCH_TOTAL_TIMEOUT_S="600",
    )
    env.pop("CRP_BENCH_CHILD", None)
    proc = subprocess.Popen(
        [sys.executable, BENCH], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, env=env,
    )
    _time.sleep(5)  # let the supervisor spawn its hanging child
    proc.send_signal(_signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    assert proc.returncode == 0
    rec = _last_json(out)
    assert rec["value"] is None
    assert "signal" in rec["error"]
    assert rec["last_good"]["value"] > 0
