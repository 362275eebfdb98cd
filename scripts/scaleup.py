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

Round 9 adds ADVERSARIAL skew (VERDICT r8 task #2): uniform replication
under-stresses exactly the paths the salt caps protect, because every
key keeps its original (benign) frequency. ``derive --skew`` applies,
after replication, the worst realistic shapes:

- events.event_type: 90% of rows collapse onto one head type — the
  90%-key join side for events_tier_salted_join and the hot group key
  for events_value_by_type_salted.
- events.user_id: re-drawn Zipf(s=1.2) over the full replicated user
  domain via inverse-CDF of a hash (deterministic): the head user takes
  ~15% of all events.
- documents.text: 60% of docs become one boilerplate template plus a
  single per-doc tail token, so the MinHash LSH bands put >half the
  corpus into one band bucket (MEGA_BUCKET_CAP's worst case).
- embeddings: the same 60% get label 0 and near-identical vectors —
  one SemDeDup mega-cluster whose members genuinely pass the cosine
  gate (SEM_CLUSTER_CAP's worst case).

``skewbench`` then runs the five salted/capped queries on a uniform
and a skewed dataset with the Spark UI enabled and records, per query,
wall-clock plus the max and median task duration of its slowest stage
(REST /taskSummary): bounded max/median under skew is the claim the
caps make, now measured instead of argued.

Usage:
  python scripts/scaleup.py derive  [--src DIR] [--out DIR] [--factor N] [--skew]
  python scripts/scaleup.py bench   [--sf-dir DIR] [--runs 3]
  python scripts/scaleup.py skewbench --uniform DIR --skewed DIR [--runs 3]
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


#: ~80-word boilerplate shared by the skewed corpus — enough shingles
#: that MinHash signatures (and therefore every LSH band) collide across
#: all boilerplate docs; the per-doc tail token keeps rows distinct.
_BOILERPLATE = (
    "terms of service agreement please read carefully before using this "
    "site the content provided herein is offered as is without warranty "
    "of any kind either express or implied including but not limited to "
    "the implied warranties of merchantability fitness for a particular "
    "purpose and noninfringement in no event shall the authors or "
    "copyright holders be liable for any claim damages or other "
    "liability whether in an action of contract tort or otherwise "
    "arising from out of or in connection with the site or the use or "
    "other dealings in the site all rights reserved"
)


def _apply_skew(t: str, df, factor: int, base: dict):
    """Post-replication adversarial transforms (module docstring). All
    deterministic (hash-of-id inverse-CDF draws), so the derived dataset
    is reproducible and the DuckDB oracles still agree on it."""
    from pyspark.sql import functions as F

    if t == "events":
        # 90% head key on the 5-value join/group column
        df = df.withColumn(
            "event_type",
            F.when(
                F.pmod(F.xxhash64("event_id", F.lit("etype")), 10) < 9,
                F.lit("click"),
            ).otherwise(F.col("event_type")),
        )
        # Zipf(s=1.2) user ids: truncated-Pareto inverse CDF of a
        # uniform hash draw. P(X > x) ~ x^-(s-1) on [1, N]; with
        # s-1 = 0.2 the head user absorbs ~15% of all events.
        n_users = base["userid"] * factor
        u = (
            F.pmod(F.xxhash64("event_id", F.lit("zipf")), 1_000_000_000)
            + 0.5
        ) / 1_000_000_000.0
        x = F.pow(
            1.0 - u * (1.0 - float(n_users) ** -0.2), -5.0
        )  # in [1, N]
        df = df.withColumn(
            "user_id", F.least(F.floor(x) - 1, F.lit(n_users - 1)).cast("long")
        )
        return df
    if t == "documents":
        hot = F.pmod(F.xxhash64("doc_id", F.lit("boiler")), 10) < 6
        boiler = F.concat(
            F.lit(_BOILERPLATE + " doc"), F.col("doc_id").cast("string")
        )
        df = df.withColumn("text", F.when(hot, boiler).otherwise(F.col("text")))
        return df.withColumn("n_chars", F.length("text").cast("long"))
    if t == "embeddings":
        # ids share the docid domain, so the SAME hash rule selects the
        # vectors of the boilerplate docs: one label (= one SemDeDup
        # cluster) and near-identical directions (cosine ~= 1, so the
        # pairs the cap must bound all genuinely qualify as dups).
        hot = F.pmod(F.xxhash64("vec_id", F.lit("boiler")), 10) < 6
        near = F.transform(
            "embedding",
            lambda x, i: (
                F.lit(0.05)
                + i.cast("double") * F.lit(0.001)
                + F.col("vec_id").cast("double") * F.lit(1e-9)
            ).cast("float"),
        )
        return df.withColumn(
            "label", F.when(hot, F.lit(0)).otherwise(F.col("label"))
        ).withColumn("embedding", F.when(hot, near).otherwise(F.col("embedding")))
    return df


def derive(
    src: str, out: str, factor: int, skew: bool = False, spark=None
) -> None:
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.session import get_spark_session

    own_session = spark is None
    if own_session:
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
        if skew:
            union = _apply_skew(t, union, factor, base)
        union.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        print(f"{t}: x{factor} -> {union.count()} rows")
    # completion marker: a crash mid-derive leaves a partial directory
    # that must not be mistaken for a usable dataset (tests/
    # test_scale_parity.py's auto-derive fixture keys off this file)
    with open(os.path.join(out, "_DERIVED_OK"), "w") as f:
        f.write(f"src={src} factor={factor} skew={skew}\n")
    if own_session:
        spark.stop()


# ------------------------------------------------------------ skewbench

SKEW_QUERIES = [
    "events_value_by_type_salted",
    "events_tier_salted_join",
    "dedup_minhash_pairs",
    "dedup_semdedup",
    "training_shard_assignment",
]


def _rest(url: str):
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _completed_stages(ui: str, app: str) -> set[tuple[int, int]]:
    return {
        (s["stageId"], s["attemptId"])
        for s in _rest(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
    }


def _slowest_stage_tasks(
    ui: str, app: str, stages: set[tuple[int, int]]
) -> tuple[float, float]:
    """(max task ms, median task ms of the stage holding that max) over
    the given stages — the per-stage straggler picture the salt caps are
    supposed to bound."""
    worst = (0.0, 0.0)
    for sid, att in stages:
        try:
            s = _rest(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/"
                "taskSummary?quantiles=0.5,1.0"
            )
        except Exception:
            continue  # tiny stages may be gone/unsummarized; skip
        dur = s.get("duration") or []
        if len(dur) == 2 and dur[1] > worst[0]:
            worst = (dur[1], dur[0])
    return worst


def skewbench(uniform_dir: str, skewed_dir: str, runs: int) -> None:
    from deg04_local_data_lake_spark import registry
    from deg04_local_data_lake_spark.caching import release_caches
    from deg04_local_data_lake_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="deg04-skewbench",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4049"
    app = spark.sparkContext.applicationId
    qs = registry.queries()
    report: dict[str, dict] = {}
    for tag, sf_dir in (("uniform", uniform_dir), ("skewed", skewed_dir)):
        for name in SKEW_QUERIES:
            fn = qs[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            before = _completed_stages(ui, app)
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            new_stages = _completed_stages(ui, app) - before
            max_ms, med_ms = _slowest_stage_tasks(ui, app, new_stages)
            report.setdefault(name, {})[tag] = {
                "wall_s": round(sorted(samples)[runs // 2], 3),
                "max_task_ms": max_ms,
                "med_task_ms": med_ms,
                "straggler_ratio": round(max_ms / med_ms, 2) if med_ms else None,
            }
            release_caches()
    print(
        json.dumps(
            {
                "metric": "salted-path skew study (wall + slowest-stage tasks)",
                "estimator": f"w1-med{runs}",
                "uniform": uniform_dir,
                "skewed": skewed_dir,
                "queries": report,
            }
        )
    )
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
    d.add_argument("--skew", action="store_true")
    b = sub.add_parser("bench")
    b.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    b.add_argument("--runs", type=int, default=3)
    s = sub.add_parser("skewbench")
    s.add_argument("--uniform", default="/tmp/scaleup/sf1")
    s.add_argument("--skewed", default="/tmp/scaleup/sf1skew")
    s.add_argument("--runs", type=int, default=3)
    a = p.parse_args()
    if a.cmd == "derive":
        derive(a.src, a.out, a.factor, skew=a.skew)
    elif a.cmd == "skewbench":
        skewbench(a.uniform, a.skewed, a.runs)
    else:
        bench(a.sf_dir, a.runs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
