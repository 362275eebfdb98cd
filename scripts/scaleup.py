#!/usr/bin/env python
"""Scale-up study (round 8): derive an sf1-shaped dataset from sf0.1 by
replicating every table ×N with join-consistent key offsets, then run
the headline queries at both scale factors with an identical estimator
and report per-query scaling ratios.

Why: every "scale-safe" grade so far argues from plan shape at ≤600k
rows. A 10× replication is the cheapest way to observe the actual
growth exponent of each plan — anything super-linear beyond shuffle
growth (ratio well above ~N·log-ish, in practice > ~12 at N=10) is a
plan to investigate, not an argument to make.

Derivation rules (offsets keep every FK join valid):
- customer/supplier/part/orders/lineitem: replica i offsets each key
  domain by i·(max_key+1), on both sides of every FK.
- events: event_id and user_id offset (10× users, same time window —
  the realistic shape of a bigger corpus over the same period).
- documents: doc_id offset; every WORD gets a per-replica suffix so
  replicas are textually distinct (otherwise the dedup gates see a
  corpus that is 90% exact duplicates — a different study); n_chars
  recomputed from the new text.
- embeddings: vec_id offset with the SAME base as doc_id (preserves
  the 1:1 doc↔vec alignment); label/embedding unchanged, so cluster
  sizes grow ×N and the SemDeDup mega-cluster cap genuinely engages.
- nation/region: dimensions, copied as-is.

Usage:
  python scripts/scaleup.py derive  [--src DIR] [--out DIR] [--factor N]
  python scripts/scaleup.py bench   [--sf-dir DIR] [--runs 3]
The two bench invocations (src and derived) must use the same --runs;
ratios are only meaningful within one estimator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# key columns per table, grouped by the id DOMAIN they draw from —
# every column in a domain gets the same offset so FK joins stay valid
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    # one shared domain: doc_id and vec_id are 1:1 aligned
    "docid": [("documents", "doc_id"), ("embeddings", "vec_id")],
}


def derive(src: str, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.session import get_spark_session

    spark = get_spark_session(app_name="deg04-scaleup-derive")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    # one pass to size every id domain
    base: dict[str, int] = {}
    frames = {
        t: spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        for t in TABLES
    }
    for dom, cols in DOMAINS.items():
        hi = 0
        for t, c in cols:
            m = frames[t].agg(F.max(c)).collect()[0][0]
            hi = max(hi, int(m))
        base[dom] = hi + 1

    offset_of = {
        (t, c): dom for dom, cols in DOMAINS.items() for t, c in cols
    }

    for t in TABLES:
        df = frames[t]
        if t in ("region", "nation"):
            df.write.mode("overwrite").parquet(
                os.path.join(out, f"{t}.parquet")
            )
            print(f"{t}: copied")
            continue
        replicas = []
        for i in range(factor):
            r = df
            for c in df.columns:
                dom = offset_of.get((t, c))
                if dom is not None:
                    r = r.withColumn(
                        c, (F.col(c) + F.lit(i * base[dom])).cast("long")
                    )
            if t == "documents" and i > 0:
                # per-replica word suffix: textually distinct replicas
                words = F.filter(
                    F.split(F.col("text"), " "), lambda x: x != ""
                )
                new_text = F.concat_ws(
                    " ",
                    F.transform(
                        words, lambda x: F.concat(x, F.lit(f"r{i}"))
                    ),
                )
                r = r.withColumn("text", new_text).withColumn(
                    "n_chars", F.length("text").cast("long")
                )
            replicas.append(r)
        union = replicas[0]
        for r in replicas[1:]:
            union = union.unionByName(r)
        union.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        print(f"{t}: x{factor} -> {union.count()} rows")
    spark.stop()


def bench(sf_dir: str, runs: int) -> None:
    from deg04_local_data_lake_spark import registry
    from deg04_local_data_lake_spark.caching import release_caches
    from deg04_local_data_lake_spark.session import get_spark_session

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as headline_bench

    spark = get_spark_session(app_name="deg04-scaleup-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    timings: dict[str, float] = {}
    for name in headline_bench.HEADLINE:
        if name not in qs:
            continue
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(sorted(samples)[runs // 2], 3)
        release_caches()
    print(
        json.dumps(
            {
                "metric": "scaleup study wall-clock",
                "estimator": f"w1-med{runs}",
                "sf_dir": sf_dir,
                "value": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )
    spark.stop()


def main() -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("derive")
    d.add_argument("--src", default="/root/testdata/sf0.1")
    d.add_argument("--out", default="/tmp/scaleup/sf1")
    d.add_argument("--factor", type=int, default=10)
    b = sub.add_parser("bench")
    b.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    b.add_argument("--runs", type=int, default=3)
    a = p.parse_args()
    if a.cmd == "derive":
        derive(a.src, a.out, a.factor)
    else:
        bench(a.sf_dir, a.runs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
