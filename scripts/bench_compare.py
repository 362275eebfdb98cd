#!/usr/bin/env python
"""Mechanical regression check between two headline bench recordings.

Applies the spread rule BENCH_WIDE.md states: a per-query median that
lands INSIDE the other recording's [min, max] spread is noise; only a
median beyond the prior max (or below the prior min) is a signal. This
replaces the hand diff-audit of >20% upticks that round-8's judge had
to do four times.

Usage:
  python scripts/bench_compare.py BENCH_r08.json BENCH_r09.json

Exit code 0 = no regression signals; 1 = at least one query regressed
beyond the spread envelope (listed on stdout). Recordings made before
the spread field (r1-r8) fall back to a ±10% band around the median,
flagged as "approx" in the output.

Exit code 2 = CONTAMINATED RECORDING — refused, no comparison made.
Round-10 rule: recordings carry a ``calibration`` field (the fixed
probe query re-timed at run start/middle/end). Identical code must
yield near-identical probe times, so
  (a) a later probe RISING >30% above an earlier one ⇒ the container
      got contended during the run — identical code on a healthy JVM
      only gets faster — so its per-query numbers are biased and tight
      spreads cannot rescue them (the round-9 failure mode: 16.989 s
      recorded for 9.4 s code, spreads tight, bias ramping mid-run);
  (b) >30% drift BETWEEN the two recordings' probe medians ⇒ the two
      runs saw different machine health — a cross-run delta measures
      the environment, not the code.
Round-11 rules (BENCH_r10's DECAYING-contention signature slipped (a):
its probes only fell, 1.639→1.271→1.112, because the container was
contended at START and drained during the run — 9 false REGRESSION
signals for identical code):
  (c) the START probe exceeding the same recording's OWN in-run median
      for the probe query by >30% ⇒ identical code timed inconsistently
      inside one file (BENCH_r10: probe 1.639 vs q1 median 1.007 =
      +63%) — contention present at run start;
  (d) the recorded start loadavg[0] exceeding LOADAVG_BOUND ⇒ something
      else was demonstrably running when the recording began (BENCH_r10
      started at loadavg 2.92; clean recordings start ≤ ~1).
Any condition prints "contaminated recording" and exits 2 instead
of emitting regression signals. Pre-calibration recordings (r1-r9)
skip the check that needs the missing side, with a warning.
"""

from __future__ import annotations

import json
import sys

#: Max tolerated probe drift (max/min − 1) within and across recordings,
#: and for the start-probe-vs-in-run-median consistency check.
CALIBRATION_TOLERANCE = 0.30

#: Max tolerated 1-min loadavg at recording start. Clean recordings on
#: this container start at ≤ ~1 (BENCH_WIDE.md r10 header: 0.39); the
#: two contaminated recordings started at 2.9+ (r10) with another
#: process demonstrably competing. The bench process itself cannot have
#: driven the 1-min average that high before its first probe.
LOADAVG_BOUND = 2.5


def calibration_drift(rec: dict) -> float | None:
    """Within-run drift ratio (max/min - 1), or None if no calibration.

    DIRECTION-AWARE: the largest INCREASE from any earlier probe to any
    later one. On a clean run the JVM only gets faster (JIT keeps
    warming shared paths — measured clean profile at sf0.1:
    [1.12, 0.84, 0.68], monotone decreasing), so decay is expected and
    scores 0; contention ramping up mid-run — BENCH_r09's signature,
    where first-in-run queries stayed flat and everything after slowed
    50-150% — makes a later probe RISE above an earlier one, which
    identical code on a healthy machine cannot do. A uniformly-contended
    run (flat probes, all slow) is caught by the CROSS-run check
    instead, whose median is robust to the one cold start probe."""
    cal = rec.get("calibration")
    if not cal or min(cal) <= 0:
        return None
    worst = 0.0
    for i in range(len(cal)):
        for j in range(i + 1, len(cal)):
            worst = max(worst, cal[j] / cal[i] - 1.0)
    return worst


def start_probe_inconsistency(rec: dict) -> float | None:
    """Start probe vs the recording's OWN in-run median for the same
    query (ratio - 1), or None when either side is missing.

    The probe query is also timed as a regular headline query later in
    the same run (same code, same JVM, same file). A start probe far
    ABOVE that steady-state is an identical-code inconsistency inside
    one recording — the decaying-contention signature that the
    direction-aware within-run check structurally cannot see (probes
    that only fall score 0 there)."""
    cal = rec.get("calibration")
    probe = rec.get("calibration_probe")
    med = rec.get("queries", {}).get(probe)
    if not cal or not med or min(cal) <= 0 or med <= 0:
        return None
    return cal[0] / med - 1.0


def start_loadavg(rec: dict) -> float | None:
    """1-min loadavg at the first probe, or None if not recorded."""
    la = rec.get("loadavg")
    if not la or not la[0]:
        return None
    return float(la[0][0])


def cross_run_drift(old: dict, new: dict) -> float | None:
    """Drift between the two recordings' median probe times."""
    a, b = old.get("calibration"), new.get("calibration")
    if not a or not b:
        return None
    ma, mb = sorted(a)[len(a) // 2], sorted(b)[len(b) // 2]
    if min(ma, mb) <= 0:
        return None
    return max(ma, mb) / min(ma, mb) - 1.0


def envelope(rec: dict, name: str) -> tuple[float, float, bool]:
    """(min, max, exact) bound for a query in a recording."""
    med = rec["queries"][name]
    spread = rec.get("spread", {}).get(name)
    if spread:
        return spread[0], spread[1], True
    # pre-spread recordings (r1-r8): ±max(10%, 0.1 s) — the measured
    # run-to-run envelope at sf0.1 is ~±0.05-0.15 s per query (SCALE.md
    # round-7 notes), so a pure percentage under-covers sub-second rows
    band = max(med * 0.1, 0.1)
    return med - band, med + band, False


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
    old = json.load(open(sys.argv[1]))
    old = old.get("parsed", old)
    new = json.load(open(sys.argv[2]))
    new = new.get("parsed", new)
    if old.get("estimator") != new.get("estimator"):
        print(
            f"WARNING: estimators differ ({old.get('estimator')} vs "
            f"{new.get('estimator')}) — totals are not comparable"
        )
    # calibration gate: refuse contaminated recordings outright
    for label, rec in (("old", old), ("new", new)):
        drift = calibration_drift(rec)
        if drift is None:
            print(
                f"WARNING: {label} recording has no calibration probes "
                "(pre-r10) — within-run contamination cannot be checked"
            )
        elif drift > CALIBRATION_TOLERANCE:
            print(
                f"contaminated recording: {label} probe drifted "
                f"{drift:.0%} within the run (calibration="
                f"{rec['calibration']}, loadavg={rec.get('loadavg')}) — "
                "refusing comparison"
            )
            return 2
        inconsistency = start_probe_inconsistency(rec)
        if (
            inconsistency is not None
            and inconsistency > CALIBRATION_TOLERANCE
        ):
            print(
                f"contaminated recording: {label} START probe is "
                f"{inconsistency:.0%} above its own in-run median for "
                f"the same query ({rec['calibration'][0]}s vs "
                f"{rec['queries'][rec['calibration_probe']]}s) — "
                "identical code timed inconsistently inside one file "
                "(contention at run start); refusing comparison"
            )
            return 2
        la = start_loadavg(rec)
        if la is not None and la > LOADAVG_BOUND:
            print(
                f"contaminated recording: {label} started at 1-min "
                f"loadavg {la} (> bound {LOADAVG_BOUND}) — another "
                "process was running when the recording began; "
                "refusing comparison"
            )
            return 2
    xdrift = cross_run_drift(old, new)
    if xdrift is not None and xdrift > CALIBRATION_TOLERANCE:
        print(
            f"contaminated recording: probe medians differ {xdrift:.0%} "
            f"between runs ({old.get('calibration')} vs "
            f"{new.get('calibration')}) — the runs saw different machine "
            "health; refusing comparison"
        )
        return 2
    regressions, improvements = [], []
    for name, med in new["queries"].items():
        if name not in old.get("queries", {}):
            print(f"NEW   {name}: {med}s (no prior recording)")
            continue
        lo, hi, exact = envelope(old, name)
        tag = "" if exact else " (approx ±10% band: prior has no spread)"
        if med > hi:
            regressions.append((name, old["queries"][name], med, hi, tag))
        elif med < lo:
            improvements.append((name, old["queries"][name], med, lo, tag))
    for name, o, n, hi, tag in sorted(regressions, key=lambda r: r[1] - r[2]):
        print(f"REGRESSION {name}: {o}s -> {n}s (beyond prior max {hi}s){tag}")
    for name, o, n, lo, tag in improvements:
        print(f"improved   {name}: {o}s -> {n}s (below prior min {lo}s){tag}")
    print(
        f"total {old.get('value')}s -> {new.get('value')}s; "
        f"{len(regressions)} regression signal(s), "
        f"{len(improvements)} improvement(s), "
        f"{len(new['queries']) - len(regressions) - len(improvements)} inside envelope"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
