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
"""

from __future__ import annotations

import json
import sys


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
