"""Round-10 bench self-calibration (VERDICT r9 task #2): BENCH_r09.json
recorded 16.989 s for code that measures 9.4 s clean, and nothing in the
file revealed the contamination. bench.py now re-times a fixed probe at
run start/middle/end (+ loadavg snapshots); scripts/bench_compare.py
refuses (exit 2) recordings whose probe drifts >30% within a run or
between the two runs, instead of emitting bogus regression signals."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COMPARE = os.path.join(REPO, "scripts", "bench_compare.py")


def _load_compare():
    spec = importlib.util.spec_from_file_location("bench_compare", COMPARE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rec(queries, spread=None, calibration=None):
    rec = {
        "metric": "m",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "estimator": "w2-med5-v2",
        "sf": 0.1,
    }
    if spread is not None:
        rec["spread"] = spread
    if calibration is not None:
        rec["calibration"] = calibration
        rec["loadavg"] = [[1.0, 1.0, 1.0]] * len(calibration)
    return rec


def _run_compare(tmp_path, old, new):
    a = tmp_path / "old.json"
    b = tmp_path / "new.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    proc = subprocess.run(
        [sys.executable, COMPARE, str(a), str(b)],
        capture_output=True,
        text=True,
    )
    return proc.returncode, proc.stdout


def test_within_run_drift_computation():
    bc = _load_compare()
    assert bc.calibration_drift({"calibration": [1.0, 1.0, 1.0]}) == 0.0
    # direction-aware: the worst INCREASE earlier->later (mid spike 50%)
    d = bc.calibration_drift({"calibration": [1.0, 1.5, 1.1]})
    assert abs(d - 0.5) < 1e-9
    # clean runs only DECAY (JIT): the measured clean profile scores ~0
    assert bc.calibration_drift({"calibration": [1.12, 0.84, 0.68]}) == 0.0
    assert bc.calibration_drift({"calibration": [0.74, 0.30, 0.29]}) == 0.0
    assert bc.calibration_drift({}) is None
    assert bc.cross_run_drift(
        {"calibration": [1.0, 1.0, 1.0]}, {"calibration": [2.0, 2.0, 2.0]}
    ) == 1.0
    # cross-run uses the probe MEDIAN: one cold start probe on either
    # side must not poison the comparison
    assert bc.cross_run_drift(
        {"calibration": [0.74, 0.30, 0.29]},
        {"calibration": [0.31, 0.30, 0.32]},
    ) < 0.05


def test_clean_recordings_compare_normally(tmp_path):
    old = _rec(
        {"q1": 1.0},
        spread={"q1": [0.9, 1.1]},
        calibration=[0.5, 0.52, 0.51],
    )
    new = _rec({"q1": 1.05}, calibration=[0.5, 0.49, 0.51])
    rc, out = _run_compare(tmp_path, old, new)
    assert rc == 0, out
    assert "contaminated" not in out


def test_within_run_contamination_refused(tmp_path):
    # the r9 scenario: contention ramps mid-run, so the END probe is
    # much slower than the START probe on IDENTICAL code
    old = _rec(
        {"q1": 1.0},
        spread={"q1": [0.9, 1.1]},
        calibration=[0.5, 0.5, 0.5],
    )
    new = _rec({"q1": 1.8}, calibration=[0.5, 0.8, 1.2])
    rc, out = _run_compare(tmp_path, old, new)
    assert rc == 2, out
    assert "contaminated recording" in out
    assert "REGRESSION" not in out  # refused BEFORE emitting signals


def test_cross_run_contamination_refused(tmp_path):
    # tight probes within each run, but the machines differ 2x: the
    # per-query deltas measure the environment, not the code
    old = _rec(
        {"q1": 1.0},
        spread={"q1": [0.9, 1.1]},
        calibration=[0.5, 0.5, 0.5],
    )
    new = _rec({"q1": 1.9}, calibration=[1.0, 1.0, 1.0])
    rc, out = _run_compare(tmp_path, old, new)
    assert rc == 2, out
    assert "contaminated recording" in out


def test_pre_calibration_recordings_still_compare(tmp_path):
    # r1-r9 files carry no calibration; the comparator warns and
    # proceeds (backwards compatible with every shipped BENCH_r*.json)
    old = _rec({"q1": 1.0}, spread={"q1": [0.9, 1.1]})
    new = _rec({"q1": 1.5})
    rc, out = _run_compare(tmp_path, old, new)
    assert rc == 1, out  # genuine regression signal still fires
    assert "no calibration" in out


def test_real_r08_r09_files_still_adjudicate():
    # the shipped pre-calibration recordings keep working end to end
    proc = subprocess.run(
        [
            sys.executable,
            COMPARE,
            os.path.join(REPO, "BENCH_r08.json"),
            os.path.join(REPO, "BENCH_r09.json"),
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode in (0, 1)
    assert "no calibration" in proc.stdout


def test_bench_emits_calibration_fields():
    # static check on bench.py's output dict: the three new fields are
    # wired (the full bench run is exercised by the driver per-round)
    src = open(os.path.join(REPO, "bench.py")).read()
    for field in ('"calibration"', '"calibration_probe"', '"loadavg"'):
        assert field in src


def test_decaying_contention_refused_via_start_probe(tmp_path):
    """Round-11 rule (c): BENCH_r10's signature — probes only DECAY
    (scores 0 in the direction-aware check) because contention was
    present at START and drained during the run. The start probe vs the
    recording's own in-run median for the same query is an
    identical-code inconsistency inside one file and must refuse."""
    old = _rec(
        {"q1": 1.0},
        spread={"q1": [0.9, 1.1]},
        calibration=[0.5, 0.5, 0.5],
    )
    old["calibration_probe"] = "q1"
    # the BENCH_r10 shape, scaled: start probe 63% above in-run median
    new = _rec({"q1": 1.007}, calibration=[1.639, 1.271, 1.112])
    new["calibration_probe"] = "q1"
    rc, out = _run_compare(tmp_path, old, new)
    assert rc == 2, out
    assert "START probe" in out
    assert "REGRESSION" not in out


def test_start_loadavg_bound_refused(tmp_path):
    """Round-11 rule (d): a recording that began at 1-min loadavg above
    the documented bound had something else demonstrably running."""
    old = _rec(
        {"q1": 1.0},
        spread={"q1": [0.9, 1.1]},
        calibration=[0.5, 0.5, 0.5],
    )
    new = _rec({"q1": 1.0}, calibration=[0.5, 0.5, 0.5])
    new["loadavg"] = [[2.92, 3.56, 3.27], [1.95, 3.17, 3.15], [1.82, 2.7, 2.98]]
    rc, out = _run_compare(tmp_path, old, new)
    assert rc == 2, out
    assert "loadavg" in out
    assert "REGRESSION" not in out


def test_real_r09_r10_files_refused_contaminated():
    """The shipped BENCH_r10.json (22.999 s for 11.69 s code, 9 false
    regression signals in round 10) must now refuse outright."""
    proc = subprocess.run(
        [
            sys.executable,
            COMPARE,
            os.path.join(REPO, "BENCH_r09.json"),
            os.path.join(REPO, "BENCH_r10.json"),
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 2, proc.stdout
    assert "contaminated recording" in proc.stdout
    assert "REGRESSION" not in proc.stdout
