"""Analytics-engine completeness operators: rollup, pivot, set ops,
try_cast semantics, deterministic sampling, and sequence packing.

None of these exist in the reference (SURVEY.md §2.6-2.8 notes: no grouping
sets, no intersect/except, no sampling) — they round out what "a user could
switch their queries to this engine" means, plus two LLM-data staples
(hash-split sampling, token-budget packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import (
    dec,
    exact_corr,
    exact_corr_sql,
    exact_std_sql,
    md5_long,
    md5_long_sql,
)
from deg04_local_data_lake_spark.operators import rankdist
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table


@register(
    "rollup_revenue",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
       CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (year, quarter)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, quarter): per-quarter, per-year, and grand totals in
    one pass — Spark expands grouping sets inside a single shuffle; the
    NULL super-aggregate rows match ANSI semantics in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("year"),
            F.quarter("o_orderdate").alias("quarter"),
            "o_totalprice",
        )
        .rollup("year", "quarter")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "pivot_daily_event_matrix",
    oracle="""
SELECT CAST(ts AS DATE) AS day,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY 1
""",
)
def pivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot events into a day × type count matrix. The pivot values are
    declared explicitly — with an unspecified value list Spark runs an extra
    distinct job to discover them; never do that at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(F.col("ts").cast("date").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "except_modest_customers",
    oracle="""
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
""",
)
def except_modest_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers who ordered, but never above 300k —
    ``subtract`` mirrors ANSI EXCEPT (distinct); Spark plans it as an
    aggregate + anti join under the hood."""
    orders = load_table(spark, sf_dir, "orders")
    all_buyers = orders.select("o_custkey")
    big_buyers = orders.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    return all_buyers.subtract(big_buyers)


@register(
    "intersect_buyer_sellers_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def intersect_buyer_sellers_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return customer.intersect(supplier)


@register(
    "try_cast_props",
    oracle="""
SELECT event_id,
       try_cast(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       try_cast(json_extract_string(props, '$.missing') AS INTEGER) AS missing_int,
       try_cast(event_type AS DOUBLE) AS not_a_number
FROM events WHERE event_id < 100
""",
)
def try_cast_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast semantics (NULL on failure, never error) — the engine's
    answer to the reference's ANSI-off permissive casts
    (financial_dl_etl.py:13): opt into safety per expression instead of
    globally disabling ANSI."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") < 100).select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").try_cast("int").alias("missing_int"),
        F.col("event_type").try_cast("double").alias("not_a_number"),
    )


@register(
    "distinct_users_daily",
    oracle="""
SELECT CAST(ts AS DATE) AS day,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(*) AS n_events
FROM events GROUP BY 1
""",
)
def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per day. Spark plans COUNT(DISTINCT) as a
    two-stage expand+aggregate; at 100 TB prefer
    ``approx_count_distinct`` (HLL, single pass) when ±2% is acceptable —
    approx results are engine-specific, so the exact form is the
    oracle-checkable one."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count_distinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "median_order_by_segment",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, o_totalprice AS median_price
FROM ranked WHERE rn = (n + 1) // 2
""",
)
def median_order_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median order value per market segment, via rank
    selection — interpolating medians differ across engines' arithmetic;
    the discrete element is portable. One shuffle on the segment."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment")
    ranked = joined.select(
        "c_mktsegment",
        "o_totalprice",
        F.row_number()
        .over(w.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n + 1) DIV 2")
    ).select("c_mktsegment", F.col("o_totalprice").alias("median_price"))


@register(
    "fk_integrity_audit",
    oracle="""
SELECT 'lineitem.l_orderkey -> orders' AS fk,
       CAST(COUNT(*) AS BIGINT) AS n_violations
FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'orders.o_custkey -> customer',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'customer.c_nationkey -> nation',
       CAST(COUNT(*) AS BIGINT)
FROM customer WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
UNION ALL
SELECT 'lineitem.l_partkey -> part',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
""",
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for each foreign key via
    anti joins — the other half of the bronze promotion gate next to
    ``profile_orders``. Each check is one anti join; small dimension sides
    broadcast, and a healthy lake reports all zeros (as here)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    def orphans(fact, dim_keys, cond, label):
        return fact.join(dim_keys, cond, "left_anti").agg(
            F.lit(label).alias("fk"), F.count(F.lit(1)).alias("n_violations")
        )

    return (
        orphans(li, orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"),
                "lineitem.l_orderkey -> orders")
        .unionByName(orphans(orders, customer.select("c_custkey"),
                             orders.o_custkey == F.col("c_custkey"),
                             "orders.o_custkey -> customer"))
        .unionByName(orphans(customer, nation.select("n_nationkey"),
                             customer.c_nationkey == F.col("n_nationkey"),
                             "customer.c_nationkey -> nation"))
        .unionByName(orphans(li, part.select("p_partkey"),
                             li.l_partkey == F.col("p_partkey"),
                             "lineitem.l_partkey -> part"))
    )


@register(
    "order_price_deciles",
    oracle="""
WITH d AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile,
       COUNT(*) AS n_orders,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
FROM d GROUP BY decile
""",
)
def order_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile boundaries via NTILE over a total order (orderkey
    tiebreak) — the distribution-profiling companion to the discrete
    median. Distributed: the NTILE is computed from an exact bucketed
    global rank (``rankdist``), so no task ever holds more than one
    cutpoint bucket — the full-fact total order never lands on one
    executor (the scale posture SCALE.md documents for rank selection)."""
    orders = load_table(spark, sf_dir, "orders")
    tiled = rankdist.with_global_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        10,
        "decile",
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "sample_train_split",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
            THEN 'train' ELSE 'eval' END AS split
FROM documents
""",
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/eval split by content-stable hash —
    reproducible across engines, runs, and cluster sizes (``rand(seed)`` is
    partitioning-dependent; a hash split never is)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        F.when(h % 100 < 90, F.lit("train")).otherwise(F.lit("eval")).alias("split"),
    )


@register(
    "profile_orders",
    oracle="""
SELECT 'o_orderkey' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS DOUBLE) AS min_value,
       CAST(max(o_orderkey) AS DOUBLE) AS max_value
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice), min(o_totalprice), max(o_totalprice)
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
       COUNT(DISTINCT o_custkey), CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
FROM orders
""",
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling utility: per-column row/null/distinct counts and
    min/max in long format — the quality gate run before promoting a
    bronze table. One pass per column here for clarity; at scale fuse them
    into a single aggregate projection (one scan for all columns)."""
    orders = load_table(spark, sf_dir, "orders")

    def prof(col: str):
        return orders.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            F.min(col).cast("double").alias("min_value"),
            F.max(col).cast("double").alias("max_value"),
        )

    return prof("o_orderkey").unionByName(prof("o_totalprice")).unionByName(
        prof("o_custkey")
    )


@register(
    "anomalous_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
),
stats AS (
  SELECT CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mu,
         {exact_std_sql("revenue")} AS sigma
  FROM daily
)
SELECT order_date, revenue,
       (revenue - mu) / sigma AS z_score
FROM daily, stats
WHERE revenue > mu + 2.5 * sigma
""",
)
def anomalous_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection over the daily revenue series: flag days
    above mean + 2.5σ. Stats come from the exact decimal mean and the
    cancellation-free stddev, so the flagged set is bit-deterministic —
    a threshold comparison on engine-varying floats would flap."""
    from deg04_local_data_lake_spark.functions.portable import exact_avg, exact_std

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("order_date")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("revenue"))
    stats = daily.agg(
        exact_avg("revenue").alias("mu"), exact_std("revenue").alias("sigma")
    )
    return (
        daily.crossJoin(F.broadcast(stats))
        .filter(F.col("revenue") > F.col("mu") + 2.5 * F.col("sigma"))
        .select(
            "order_date",
            "revenue",
            ((F.col("revenue") - F.col("mu")) / F.col("sigma")).alias("z_score"),
        )
    )


# keep rates per source (testdata sources are src0..src19; unlisted → 0.1)
MIXTURE_WEIGHTS = {"src0": 0.5, "src1": 0.9, "src2": 1.0, "src3": 0.7, "src4": 0.3}


@register(
    "sample_domain_mixture",
    oracle=f"""
SELECT doc_id, source,
       CAST(CASE source {' '.join(f"WHEN '{k}' THEN {v}" for k, v in MIXTURE_WEIGHTS.items())}
            ELSE 0.1 END AS DOUBLE) AS keep_rate
FROM documents
WHERE {md5_long_sql("CAST(doc_id AS VARCHAR)", "mix")} % 1000
      < CAST(round(1000 * (CASE source {' '.join(f"WHEN '{k}' THEN {v}" for k, v in MIXTURE_WEIGHTS.items())}
                     ELSE 0.1 END)) AS BIGINT)
""",
)
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: per-source keep rates applied via the
    content-stable hash — how training mixtures reweight web vs books vs
    code. Deterministic and partitioning-independent, unlike
    ``df.sample`` (seeded sampling shifts when the file split changes)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(0.1)
    for k, v in reversed(MIXTURE_WEIGHTS.items()):
        rate = F.when(F.col("source") == k, F.lit(v)).otherwise(rate)
    h = md5_long(F.col("doc_id").cast("string"), salt="mix")
    # round before the cast: a bare double cast truncates in Spark but the
    # oracle's exact-decimal cast rounds — diverges for non-exact weights
    return docs.filter(h % 1000 < F.round(1000 * rate).cast("bigint")).select(
        "doc_id", "source", rate.alias("keep_rate")
    )


@register(
    "sample_token_budget",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum WHERE cum_tokens <= 2500
""",
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget quota: keep documents (stable doc_id order)
    until each source's cumulative token count hits the budget — the
    corpus-capping step of a mixture pipeline. One window shuffle on
    source."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    toks = docs.select("doc_id", "source", F.size(words).alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= 2500)
    )


@register(
    "pack_sequences",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS tokens_before
  FROM toks
)
SELECT doc_id, lang, n_tokens,
       CAST(tokens_before // 2048 AS BIGINT) AS bin_id
FROM cum
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign docs (per language, in stable
    doc_id order) to ~2048-token training bins via a cumulative-sum window.
    The window shuffles once on lang; at 100 TB packing runs per shard with
    a second tiny pass over shard boundaries."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    toks = docs.select("doc_id", "lang", F.size(words).alias("n_tokens"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048)
        .cast("long")
        .alias("bin_id"),
    )


@register(
    "approx_distinct_calibration",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= 0.1 * COUNT(DISTINCT user_id) AS approx_within_10pct
FROM events GROUP BY event_type
""",
)
def approx_distinct_calibration(spark, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch, calibrated against the exact
    count. The sketch values themselves differ across engines (different
    HLL variants), so the published columns are the exact count plus a
    within-10%-of-exact flag each engine computes over its OWN sketch —
    both HLLs are hash-deterministic for fixed input, so the flag is
    stable. At 100 TB the sketch is THE distinct-count path (mergeable,
    fixed-size state, one narrow shuffle vs count-distinct's two-level
    expansion); this query pins its accuracy contract."""
    events = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id")
    return events.groupBy("event_type").agg(
        exact.alias("n_exact"),
        (F.abs(approx - exact) <= 0.1 * exact).alias("approx_within_10pct"),
    )


@register(
    "approx_quantile_calibration",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*)     OVER (PARTITION BY event_type) AS n
  FROM events
), ex AS (
  SELECT event_type,
         max(n) AS n_rows,
         max(CASE WHEN rn = CAST(ceil(n * 0.5)  AS BIGINT) THEN value END) AS p50_exact,
         max(CASE WHEN rn = CAST(ceil(n * 0.48) AS BIGINT) THEN value END) AS lo,
         max(CASE WHEN rn = CAST(ceil(n * 0.52) AS BIGINT) THEN value END) AS hi
  FROM ranked GROUP BY event_type
), ap AS (
  SELECT event_type, approx_quantile(value, 0.5) AS p50_approx
  FROM events GROUP BY event_type
)
SELECT ex.event_type, n_rows, p50_exact,
       p50_approx BETWEEN lo AND hi AS approx_within_band
FROM ex JOIN ap USING (event_type)
""",
)
def approx_quantile_calibration(spark, sf_dir: str) -> DataFrame:
    """Quantile sketch calibrated against the exact discrete median, the
    same contract pattern as :func:`approx_distinct_calibration`: sketch
    internals differ per engine (Spark: Greenwald-Khanna via
    ``percentile_approx``; DuckDB: t-digest), so the published columns are
    the exact value plus a flag each engine computes over its OWN sketch —
    "approx p50 lies inside the exact p48..p52 rank band" (GK with
    accuracy=1000 guarantees rank error <= 0.1%, well inside the 2% band,
    at ANY scale factor — a rank-error contract, unlike value-space
    tolerances, is distribution-free). The exact quantiles are *discrete*
    (the value AT a rank, no interpolation arithmetic) so the doubles
    hash-match bitwise. At 100 TB the sketch is the only sane quantile
    path: fixed-size mergeable state, one narrow shuffle, vs the exact
    path's full sort per group."""
    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    wp = Window.partitionBy("event_type")
    ranked = events.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    at = lambda p: F.max(  # noqa: E731 — value at discrete rank ceil(n*p)
        F.when(F.col("rn") == F.ceil(F.col("n") * p), F.col("value"))
    )
    ex = ranked.groupBy("event_type").agg(
        F.max("n").alias("n_rows"),
        at(0.5).alias("p50_exact"),
        at(0.48).alias("lo"),
        at(0.52).alias("hi"),
    )
    ap = events.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000).alias("p50_approx")
    )
    return ex.join(ap, "event_type").select(
        "event_type",
        "n_rows",
        "p50_exact",
        F.col("p50_approx").between(F.col("lo"), F.col("hi")).alias(
            "approx_within_band"
        ),
    )


@register(
    "unpivot_event_matrix",
    oracle="""
WITH wide AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
         CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
         CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
         CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error
  FROM events GROUP BY 1
)
SELECT day, event_type, cnt
FROM (UNPIVOT wide ON click, view, purchase, signup, error
      INTO NAME event_type VALUE cnt)
""",
)
def unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the pivoted day × type matrix back to long form with native
    ``unpivot`` (Spark ≥3.4) — the wide→long inverse of
    :func:`pivot_daily_event_matrix`. Unpivot is a zero-shuffle,
    per-row expansion (a generator, not an aggregate): the only exchange
    in the plan belongs to the upstream pivot. Columns-to-rows at 100 TB
    beats the union-of-selects rewrite, which would scan the input once
    per measure column."""
    wide = pivot_daily_event_matrix(spark, sf_dir)
    return wide.unpivot(
        ids=["day"],
        values=["click", "view", "purchase", "signup", "error"],
        variableColumnName="event_type",
        valueColumnName="cnt",
    )


@register(
    "expectations_audit",
    oracle="""
WITH agg AS (
  SELECT CAST(count(*) FILTER (o_custkey IS NULL)        AS BIGINT) AS null_custkey,
         CAST(count(*) FILTER (o_orderstatus NOT IN ('O','F','P')
                               OR o_orderstatus IS NULL) AS BIGINT) AS bad_status,
         CAST(count(*) FILTER (o_totalprice <= 0
                               OR o_totalprice IS NULL)  AS BIGINT) AS bad_price,
         CAST(count(*) - count(DISTINCT o_orderkey)      AS BIGINT) AS dup_orderkey,
         CAST(count(*) FILTER (o_orderdate < DATE '1992-01-01'
                               OR o_orderdate > DATE '1998-12-31'
                               OR o_orderdate IS NULL)   AS BIGINT) AS date_out_of_range
  FROM orders
)
SELECT rule, n_violations
FROM (UNPIVOT agg ON null_custkey, bad_status, bad_price, dup_orderkey,
                     date_out_of_range
      INTO NAME rule VALUE n_violations)
""",
)
def expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the not-null / enum / range /
    unique / bounds rule set a Delta-constraints or dbt-tests user writes),
    evaluated in ONE scan: every rule compiles to a conditional count in a
    single aggregate — no per-rule pass, no shuffle beyond the one global
    agg (uniqueness is the exception that earns its count-distinct) — then
    unpivots to a (rule, n_violations) report. At 100 TB this is the
    bronze-gate pattern: rules are column expressions, so adding a rule
    adds zero scans."""
    orders = load_table(spark, sf_dir, "orders")
    cnt = lambda c: F.count(F.when(c, F.lit(1)))  # noqa: E731
    agg = orders.agg(
        cnt(F.col("o_custkey").isNull()).alias("null_custkey"),
        cnt(
            ~F.col("o_orderstatus").isin("O", "F", "P")
            | F.col("o_orderstatus").isNull()
        ).alias("bad_status"),
        cnt(
            (F.col("o_totalprice") <= 0) | F.col("o_totalprice").isNull()
        ).alias("bad_price"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
        cnt(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
            | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date"))
            | F.col("o_orderdate").isNull()
        ).alias("date_out_of_range"),
    )
    return agg.unpivot(
        ids=[],
        values=[
            "null_custkey",
            "bad_status",
            "bad_price",
            "dup_orderkey",
            "date_out_of_range",
        ],
        variableColumnName="rule",
        valueColumnName="n_violations",
    )


@register(
    "full_outer_wealth_by_nation",
    oracle="""
WITH c AS (
  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_rich_customers
  FROM customer WHERE c_acctbal > 9000.0 GROUP BY 1
),
s AS (
  SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_rich_suppliers
  FROM supplier WHERE s_acctbal > 9000.0 GROUP BY 1
)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_rich_customers, 0) AS n_rich_customers,
       coalesce(n_rich_suppliers, 0) AS n_rich_suppliers
FROM c FULL JOIN s ON c.nk = s.nk
""",
)
def full_outer_wealth_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type the rest of the suite didn't
    exercise): high-balance customer vs supplier counts per nation, where
    either side can be absent — keys coalesce across sides, counts 0-fill.
    Both inputs are pre-aggregated to |nations| rows BEFORE the join, so
    the full-outer itself is dimension-sized (broadcastable) — never
    full-outer-join fact tables and aggregate after."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = (
        customer.filter(F.col("c_acctbal") > 9000.0)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    s = (
        supplier.filter(F.col("s_acctbal") > 9000.0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce(F.col("n_rich_customers"), F.lit(0)).alias("n_rich_customers"),
        F.coalesce(F.col("n_rich_suppliers"), F.lit(0)).alias("n_rich_suppliers"),
    )


@register(
    "corr_price_quantity",
    oracle=f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {exact_corr_sql('l_extendedprice', 'l_quantity')} AS corr_price_qty,
       {exact_corr_sql('l_extendedprice', 'l_discount')} AS corr_price_disc
FROM lineitem GROUP BY l_returnflag
""",
)
def corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation per return flag — ``F.corr`` (and SQL
    CORR) streams doubles and is order-dependent, so this engine's
    correlation rides the cancellation-free integer power/cross sums in
    ``functions/portable.exact_corr``: one hash aggregate with map-side
    combine (all five moment sums are associative decimals), identical
    plan shape to a plain SUM, bitwise equal across engines and
    partitionings."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_corr("l_extendedprice", "l_quantity").alias("corr_price_qty"),
        exact_corr("l_extendedprice", "l_discount").alias("corr_price_disc"),
    )


def _ols_num_sql(ex: str, ey: str, q_scale: int = 4):
    """DuckDB OLS helper: exact numerators + single-conversion sums."""
    p = 10**q_scale

    def q(e: str) -> str:
        return f"CAST(CAST({e} AS DECIMAL(18,{q_scale})) * {p} AS DECIMAL(19,0))"

    qx, qy = q(ex), q(ey)
    nd = "CAST(COUNT(*) AS DECIMAL(10,0))"
    sx = f"CAST(SUM({qx}) AS DECIMAL(19,0))"
    sy = f"CAST(SUM({qy}) AS DECIMAL(19,0))"
    sxx = f"CAST(SUM({qx} * {qx}) AS DECIMAL(28,0))"
    sxy = f"CAST(SUM({qx} * {qy}) AS DECIMAL(28,0))"
    v = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    num_xy = v(f"{nd} * {sxy} - {sx} * {sy}")
    num_x = v(f"{nd} * {sxx} - {sx} * {sx}")
    return num_xy, num_x, v(sx), v(sy)


_OLS_XY, _OLS_XX, _OLS_SX, _OLS_SY = _ols_num_sql("l_quantity", "l_extendedprice")


@register(
    "ols_price_on_quantity",
    oracle=f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CASE WHEN COUNT(*) > 1 AND {_OLS_XX} > 0
            THEN {_OLS_XY} / {_OLS_XX} ELSE NULL END AS slope,
       CASE WHEN COUNT(*) > 1 AND {_OLS_XX} > 0
            THEN ({_OLS_SY} - ({_OLS_XY} / {_OLS_XX}) * {_OLS_SX})
                 / COUNT(*) / 10000.0
            ELSE NULL END AS intercept
FROM lineitem GROUP BY l_returnflag
""",
)
def ols_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple linear regression (price ~ quantity) per return flag —
    ``REGR_SLOPE``'s deterministic replacement, from the same exact
    decimal cross-moments as :func:`corr_price_quantity`:

        slope     = num_xy / num_x            (quantization cancels)
        intercept = (Σqy − slope·Σqx) / n / 10^s

    Each exact integer converts to double exactly once, then the finish
    is a fixed chain of IEEE ops written identically in both engines.
    One hash aggregate, map-side combinable — a distributed OLS fit whose
    cost is a SUM."""
    li = load_table(spark, sf_dir, "lineitem")
    p = 10**4

    def q(c):  # quantized integer column
        return (dec(c, "decimal(18,4)") * p).cast("decimal(19,0)")

    qx, qy = q("l_quantity"), q("l_extendedprice")
    n = F.count(F.lit(1))
    nd = n.cast("decimal(10,0)")
    sx = F.sum(qx).cast("decimal(19,0)")
    sy = F.sum(qy).cast("decimal(19,0)")
    sxx = F.sum(qx * qx).cast("decimal(28,0)")
    sxy = F.sum(qx * qy).cast("decimal(28,0)")
    num_xy = (nd * sxy - sx * sy).cast("double")
    num_x = (nd * sxx - sx * sx).cast("double")
    slope = num_xy / num_x
    intercept = (sy.cast("double") - slope * sx.cast("double")) / n / F.lit(
        float(p)
    )
    ok = (n > 1) & (num_x > 0)
    return li.groupBy("l_returnflag").agg(
        n.alias("n_rows"),
        F.when(ok, slope).otherwise(F.lit(None)).alias("slope"),
        F.when(ok, intercept).otherwise(F.lit(None)).alias("intercept"),
    )


# --- order-insensitive table fingerprints (replica / snapshot audit) -----
#
# Per table: hash a canonical pipe-joined row string (doubles first pinned
# to DECIMAL(18,4) so both engines render identical digits), take 48 bits
# of the md5 as an integer, SUM exactly. Addition is commutative, so the
# fingerprint is independent of row order, partitioning, and engine — equal
# fingerprints+counts ⇒ equal tables (up to 48-bit collision odds).
_FP_TABLES: dict[str, list[str]] = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": [
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        "CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS STRING)",
    ],
}


def _fp_oracle() -> str:
    parts = []
    for t, cols in _FP_TABLES.items():
        dk_cols = [c.replace(" AS STRING", " AS VARCHAR") for c in cols]
        key = " || '|' || ".join(f"CAST({c} AS VARCHAR)" if "CAST" not in c else c
                                 for c in dk_cols)
        parts.append(f"""
SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(('0x' || substr(md5({key}), 1, 12))::BIGINT)
                 AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
FROM {t}""")
    return "\nUNION ALL\n".join(parts)


@register("table_fingerprint", oracle=_fp_oracle())
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (n_rows, fingerprint) row per audited table — the cheap answer
    to "are these two copies of a 100 TB table identical?" (replica sync,
    post-migration audit, snapshot equality): each side computes its
    fingerprint locally in one scan + a 1-row aggregate; only the
    fingerprints travel. The same construction per-partition gives
    file/partition-level diffs (restrict the scan, compare sums).
    """
    fps = []
    for t, cols in _FP_TABLES.items():
        df = load_table(spark, sf_dir, t)
        key = F.concat_ws("|", *[F.expr(c).cast("string") for c in cols])
        h = F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
        fps.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(h).cast("decimal(38,0)").cast("string").alias("fingerprint"),
            ).select(F.lit(t).alias("table_name"), "n_rows", "fingerprint")
        )
    out = fps[0]
    for other in fps[1:]:
        out = out.unionByName(other)
    return out


# log10(1 + 1/d) for d = 1..9, as exact double literals: the same decimal
# text parses to the same IEEE double in Spark and DuckDB, so no libm call
# (whose last-ulp behavior differs across runtimes) appears in either plan.
_BENFORD = {
    "1": "0.3010299956639812",
    "2": "0.17609125905568124",
    "3": "0.12493873660829992",
    "4": "0.09691001300805642",
    "5": "0.07918124604762482",
    "6": "0.06694678963061322",
    "7": "0.05799194697768673",
    "8": "0.05115252244738129",
    "9": "0.04575749056067514",
}


@register(
    "benford_first_digit",
    oracle=f"""
WITH digits AS (
  SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS VARCHAR), 1, 1) AS digit
  FROM orders
),
counts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n,
         SUM(CAST(count(*) AS BIGINT)) OVER () AS total
  FROM digits GROUP BY 1
)
SELECT digit, n,
       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS observed_rate,
       expected_rate,
       ((CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - expected_rate)
        * (CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - expected_rate)
        / expected_rate) * CAST(total AS DOUBLE) AS chi_term
FROM counts,
     LATERAL (SELECT CAST(CASE digit
       {" ".join(f"WHEN '{d}' THEN {v}" for d, v in _BENFORD.items())}
       END AS DOUBLE) AS expected_rate)
""",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order amounts: leading-digit distribution vs
    the log10(1+1/d) expectation, with per-digit chi-square contributions —
    the classic fabricated-data / ingest-corruption detector for financial
    columns.

    The leading digit is extracted in exact integer space (decimal cents →
    string head), never via float log10. One scan, 9-group hash aggregate
    (collapses map-side at any scale), window total over 9 rows. Expected
    rates are embedded as decimal literals so both engines parse identical
    doubles; the chi term is the same IEEE expression tree on both sides —
    bitwise reproducible."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .cast("string"),
        1,
        1,
    ).alias("digit")
    counts = orders.select(digit).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for d, v in _BENFORD.items() for x in (d, float(v))]
        ),
        F.col("digit"),
    )
    obs = F.col("n").cast("double") / F.col("total").cast("double")
    dev = obs - F.col("expected_rate")
    return (
        counts.withColumn("total", total)
        .withColumn("expected_rate", expected)
        .select(
            "digit",
            "n",
            obs.alias("observed_rate"),
            "expected_rate",
            (dev * dev / F.col("expected_rate") * F.col("total").cast("double")).alias(
                "chi_term"
            ),
        )
    )


@register(
    "feature_minmax_scale",
    oracle="""
WITH stats AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY 1
)
SELECT event_id, e.event_type,
       (value - lo) / (hi - lo) AS value_scaled
FROM events e JOIN stats USING (event_type)
""",
)
def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling to [0,1] — the everyday ML
    feature-engineering normalizer, grouped by event type.

    min/max are *selection* aggregates (no arithmetic), so the group stats
    are exact; the scale expression is two IEEE ops applied row-wise,
    bitwise identical cross-engine. Plan: tiny stats aggregate →
    broadcast back onto the fact scan — the fact table itself never
    shuffles, which is the property that matters when the fact is 100 TB
    (a window-function formulation would shuffle everything for the same
    five numbers)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        ((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias(
            "value_scaled"
        ),
    )


MAD_K = 5  # outlier threshold: |x - median| > K * MAD


@register(
    "robust_outliers_mad",
    oracle=f"""
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (SELECT event_type, value AS med FROM ranked WHERE rn = (n + 1) // 2),
dev AS (
  SELECT e.event_type, e.event_id, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m USING (event_type)
),
ranked2 AS (
  SELECT event_type, adev, med,
         row_number() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (SELECT event_type, med, adev AS mad FROM ranked2 WHERE rn = (n + 1) // 2)
SELECT d.event_type, min(m.med) AS median_value, min(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.adev > {MAD_K} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
""",
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median / MAD (median
    absolute deviation) instead of mean / stddev, so a few extreme values
    cannot mask themselves by inflating the spread — the robust sibling of
    ``anomalous_daily_revenue``.

    Both medians are *discrete rank selections* (lower median, ties broken
    by event_id) — actual data elements, no interpolation arithmetic — so
    every derived comparison is IEEE-deterministic. Both rank passes run
    as the distributed bucketed selection (``rankdist`` grouped by
    event_type): a 5-key partitioning can never pin a full type's rows to
    one task; each median then broadcasts back onto the fact.

    The 5-row ``med``/``mad`` frames are PERSISTED
    (``caching.persist_tracked``): the second rank pass and the final
    aggregate both consume ``dev``, whose lineage contains the whole
    first rank pass — without the persist each downstream subtree
    re-derives the first median from scratch (measured 5.3 s → ~2 s at
    sf0.1)."""
    from deg04_local_data_lake_spark.caching import persist_tracked

    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    lower_median = F.col(rankdist.RANK) == F.floor((F.col(rankdist.N) + 1) / 2)
    ranked = rankdist.with_global_ranks(
        ev, ["value", "event_id"], group_by=["event_type"]
    )
    med = persist_tracked(
        ranked.filter(lower_median).select("event_type", F.col("value").alias("med"))
    )
    # dev feeds four subtrees (second rank pass ×3, final aggregate) —
    # persist (MEMORY_AND_DISK, spill-safe) rather than re-scan 4×; at
    # extreme scale flipping this to recompute is a one-line knob.
    dev = persist_tracked(
        ev.join(F.broadcast(med), "event_type").select(
            "event_type",
            "event_id",
            F.abs(F.col("value") - F.col("med")).alias("adev"),
            "med",
        )
    )
    ranked2 = rankdist.with_global_ranks(
        dev.select("event_type", "adev", "event_id"),
        ["adev", "event_id"],
        group_by=["event_type"],
    )
    mad = persist_tracked(
        ranked2.filter(lower_median).select("event_type", F.col("adev").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad"),
            F.sum(
                (F.col("adev") > MAD_K * F.col("mad")).cast("int")
            ).cast("bigint").alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "value_percentiles_by_type",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       max(CASE WHEN rn = greatest(1, CAST(ceil(0.50 * n) AS BIGINT))
                THEN value END) AS p50,
       max(CASE WHEN rn = greatest(1, CAST(ceil(0.90 * n) AS BIGINT))
                THEN value END) AS p90,
       max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
                THEN value END) AS p99,
       CAST(min(n) AS BIGINT) AS n_rows
FROM ranked GROUP BY 1
""",
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 per event type in ONE rank pass — the latency-SLO
    query shape. ``percentile_disc`` picks the lowest value whose cumulative
    rank reaches p, i.e. the element at rank ⌈p·n⌉ — computed here
    explicitly so both engines select the identical data element (no
    interpolation arithmetic, ties pinned by event_id). All three
    percentiles ride ONE distributed rank pass (``rankdist`` grouped by
    event_type): a handful of event types can never pin a full type's
    rows to one task — each (type, cutpoint-bucket) sorts independently,
    then a 5-row aggregate. The contract (exact discrete element) is
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    ranked = rankdist.with_global_ranks(
        ev.select("event_type", "value", "event_id"),
        ["value", "event_id"],
        group_by=["event_type"],
    ).withColumnsRenamed({rankdist.RANK: "rn", rankdist.N: "n"})

    def at(p: float):
        rank = F.greatest(
            F.lit(1).cast("bigint"), F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        )
        return F.max(F.when(F.col("rn") == rank, F.col("value")))

    return ranked.groupBy("event_type").agg(
        at(0.50).alias("p50"),
        at(0.90).alias("p90"),
        at(0.99).alias("p99"),
        F.min("n").cast("bigint").alias("n_rows"),
    )


@register(
    "cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev
  FROM orders GROUP BY 1
),
cur AS (
  SELECT day,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
         SUM(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prefix,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         SUM(rev) OVER () AS s
  FROM daily
),
stat AS (
  SELECT day, n * prefix - k * s AS cusum
  FROM cur
)
SELECT day,
       CAST(cusum AS DOUBLE) AS cusum_stat,
       CASE WHEN cusum > 0 THEN 1 WHEN cusum < 0 THEN -1 ELSE 0 END AS direction
FROM (SELECT *, row_number() OVER (ORDER BY abs(cusum) DESC, day) AS rn FROM stat)
WHERE rn = 1
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily revenue series: the day
    k maximizing |n·prefix_k − k·S| — the integer-rescaled form of the
    classic max-|cumulative deviation from mean| statistic (multiplying
    through by n removes the mean division, so the argmax is computed over
    EXACT integers; only the winning statistic is converted to double).

    Scale shape: the fact scan collapses to ~|days| rows in a distributed
    pre-aggregate (revenue as exact integer cents); every window after
    that runs on the tiny daily series — the single-partition ordered pass
    is over thousands of rows by construction, same posture as
    ``open_orders_per_day``. Direction says which way the mean shifted."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).cast("decimal(38,0)").alias("rev")
    )
    wseq = Window.orderBy("day")
    wall = wseq.rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy()
    cur = daily.select(
        "day",
        F.row_number().over(wseq).cast("bigint").alias("k"),
        F.sum("rev").over(wall).alias("prefix"),
        F.count(F.lit(1)).over(wtot).cast("bigint").alias("n"),
        F.sum("rev").over(wtot).alias("s"),
    )
    cusum = (
        F.col("n").cast("decimal(38,0)") * F.col("prefix")
        - F.col("k").cast("decimal(38,0)") * F.col("s")
    ).alias("cusum")
    stat = cur.select("day", cusum)
    pick = Window.orderBy(F.abs(F.col("cusum")).desc(), "day")
    return (
        stat.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "day",
            F.col("cusum").cast("double").alias("cusum_stat"),
            F.signum(F.col("cusum").cast("double")).cast("int").alias("direction"),
        )
    )


STRATUM_K = 20


@register(
    "sample_stratified_fixed_k",
    oracle=f"""
SELECT lang, doc_id, rn
FROM (
  SELECT lang, doc_id,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
              AS BIGINT) AS rn
  FROM documents
)
WHERE rn <= {STRATUM_K}
""",
)
def sample_stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling: the first K=20 documents of each
    language in md5(doc_id) order — a deterministic, reproducible
    "uniform k per group" draw (the hash order is uniform and fixed, so
    reruns and engines agree; complements the proportional
    ``sample_domain_mixture`` and the rate-based ``sample_train_split``).

    One rank pass per stratum; at 100 TB the window input is (lang, id) —
    two thin columns, not the documents — and the K winners join back by
    id if payloads are needed. Hash-order selection is also the standard
    trick for consistent eval-set carve-outs: adding documents never
    evicts more than the hash order implies."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= STRATUM_K)
    )


@register(
    "sample_sqrt_temperature",
    oracle="""
WITH sized AS (
  SELECT lang, doc_id,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
              AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
  FROM documents
)
SELECT lang, doc_id, rn,
       CAST(floor(sqrt(CAST(n_lang AS DOUBLE))) AS BIGINT) AS k_lang
FROM sized
WHERE rn <= CAST(floor(sqrt(CAST(n_lang AS DOUBLE))) AS BIGINT)
""",
)
def sample_sqrt_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture sampling: each language contributes
    ⌊√n⌋ documents instead of n — the α=0.5 upweighting of low-resource
    strata that multilingual training mixtures use, realized as a
    deterministic hash-order draw (same machinery as
    ``sample_stratified_fixed_k``, but the per-stratum quota derives from
    the stratum size).

    √n is IEEE-exact on perfect squares and correctly rounded elsewhere,
    and the floor pins the quota to an integer both engines agree on —
    no round-half ambiguity. One rank pass over (lang, id); the stratum
    size rides the same window partitioning as the rank, so there is one
    shuffle total."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang")
    sized = docs.select(
        "lang",
        "doc_id",
        F.row_number()
        .over(w.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
        .cast("bigint")
        .alias("rn"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_lang"),
    )
    k = F.floor(F.sqrt(F.col("n_lang").cast("double"))).cast("bigint")
    return sized.filter(F.col("rn") <= k).select(
        "lang", "doc_id", "rn", k.alias("k_lang")
    )


@register(
    "weighted_median_price",
    oracle="""
WITH wtd AS (
  SELECT o_orderkey, o_totalprice, CAST(count(*) AS BIGINT) AS wt
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT o_totalprice, wt,
         SUM(wt) OVER (ORDER BY o_totalprice, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(wt) OVER () AS total
  FROM wtd
)
SELECT o_totalprice AS weighted_median_price,
       CAST(cumw AS BIGINT) AS cum_weight,
       CAST(total AS BIGINT) AS total_weight
FROM ranked
WHERE 2 * cumw >= total AND 2 * (cumw - wt) < total
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: the order price at which half the total
    lineitem weight is reached (weight = lines per order) — the
    volume-weighted sibling of the discrete median, e.g. "the price point
    where half the shipped lines sit below".

    The crossing-point predicate ``2·cumw ≥ total ∧ 2·(cumw−wt) < total``
    selects exactly ONE row (cumw is strictly increasing), in pure integer
    arithmetic — no interpolation, no rank arithmetic, bitwise portable.
    The fact join reduces to one row per order in a distributed aggregate,
    and the running weight sum is the distributed bucketed pass
    (``rankdist`` with a weight column) — no single-partition tail. The
    reduced per-order frame is PERSISTED: rankdist consumes its input
    three times (cutpoints, local ranks, offsets), and without the
    persist each consumer re-runs the orders⋈lineitem join (measured
    4.8 s → ~1.5 s at sf0.1)."""
    from deg04_local_data_lake_spark.caching import persist_tracked

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    wtd = persist_tracked(
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wt"))
    )
    ranked = rankdist.with_global_ranks(
        wtd, ["o_totalprice", "o_orderkey"], weight="wt"
    ).withColumnsRenamed({rankdist.CUMW: "cumw", rankdist.TOTW: "total"})
    return ranked.filter(
        (2 * F.col("cumw") >= F.col("total"))
        & (2 * (F.col("cumw") - F.col("wt")) < F.col("total"))
    ).select(
        F.col("o_totalprice").alias("weighted_median_price"),
        F.col("cumw").cast("bigint").alias("cum_weight"),
        F.col("total").cast("bigint").alias("total_weight"),
    )


@register(
    "fulfillment_lag_distribution",
    oracle="""
WITH lags AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           AS lag_days
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
       CASE WHEN lag_days <= 7 THEN 'week_1'
            WHEN lag_days <= 30 THEN 'month_1'
            WHEN lag_days <= 60 THEN 'month_2'
            ELSE 'over_60d' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(min(lag_days) AS BIGINT) AS min_days,
       CAST(max(lag_days) AS BIGINT) AS max_days
FROM lags GROUP BY 1, 2
""",
)
def fulfillment_lag_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per priority class, in fixed
    integer-day buckets — the operations SLA panel (are URGENT orders
    actually shipping faster?).

    The fact-fact join shuffles once on the order key; lag is an integer
    date difference (no timestamp float math); buckets are closed integer
    ranges so no value can straddle engines. ≤ 5 priorities × 4 buckets
    out — the aggregate collapses map-side at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    lags = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderpriority", lag.alias("lag_days")
    )
    bucket = (
        F.when(F.col("lag_days") <= 7, "week_1")
        .when(F.col("lag_days") <= 30, "month_1")
        .when(F.col("lag_days") <= 60, "month_2")
        .otherwise("over_60d")
    )
    return lags.groupBy("o_orderpriority", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("lag_days").cast("bigint").alias("min_days"),
        F.max("lag_days").cast("bigint").alias("max_days"),
    )


@register(
    "winsorized_value_mean",
    oracle="""
WITH ranked AS (
  SELECT value, event_id,
         row_number() OVER (ORDER BY value, event_id) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM events
),
bounds AS (
  SELECT max(CASE WHEN rn = greatest(1, CAST(ceil(0.01 * n) AS BIGINT))
                  THEN value END) AS lo,
         max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
                  THEN value END) AS hi,
         CAST(min(n) AS BIGINT) AS n
  FROM ranked
)
SELECT n, lo AS p01, hi AS p99,
       CAST(SUM(CAST(CASE WHEN value < lo THEN lo
                          WHEN value > hi THEN hi
                          ELSE value END AS DECIMAL(18,4))) AS DOUBLE) / n
         AS winsorized_mean,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / n AS raw_mean
FROM events, bounds
GROUP BY n, lo, hi
""",
)
def winsorized_value_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of event values: clamp to the exact discrete
    p01/p99 elements, then average — the outlier-robust location estimate
    that, unlike trimming, keeps n constant. Standard preprocessing before
    fitting anything to heavy-tailed metrics.

    The bounds are rank-selected data elements (no interpolation); the
    clamp is a comparison against those exact values; both means ride
    exact-decimal sums with one final division each — bitwise portable.
    The rank pass is the distributed bucketed selection (``rankdist``) —
    no single-task global sort; the 1-row bounds frame broadcasts back
    onto the fact scan for the clamp."""
    ev = load_table(spark, sf_dir, "events")
    ranked = rankdist.with_global_ranks(
        ev.select("value", "event_id"), ["value", "event_id"]
    ).withColumnsRenamed({rankdist.RANK: "rn", rankdist.N: "n"})

    def at(p: float):
        rank = F.greatest(
            F.lit(1).cast("bigint"), F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        )
        return F.max(F.when(F.col("rn") == rank, F.col("value")))

    bounds = ranked.groupBy().agg(
        at(0.01).alias("lo"), at(0.99).alias("hi"), F.min("n").alias("n")
    )
    clamped = (
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("n", F.col("lo").alias("p01"), F.col("hi").alias("p99"))
        .agg(
            (F.sum(clamped.cast("decimal(18,4)")).cast("double") / F.col("n")).alias(
                "winsorized_mean"
            ),
            (F.sum(dec("value")).cast("double") / F.col("n")).alias("raw_mean"),
        )
        .select("n", "p01", "p99", "winsorized_mean", "raw_mean")
    )


@register(
    "monthly_revenue_growth",
    oracle="""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
         CAST(month(o_orderdate) AS INTEGER) AS month,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
)
SELECT year, month,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       CAST(cents - lag(cents) OVER (ORDER BY year, month) AS DOUBLE)
         / CAST(lag(cents) OVER (ORDER BY year, month) AS DOUBLE) AS mom_growth
FROM monthly
""",
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the first line of every business
    review. Exact integer cents through the lag; growth is one division of
    exact integer differences (NULL for the first month, by lag
    semantics). The monthly series is tiny after the distributed
    pre-aggregate; the unpartitioned lag is the documented bounded tail."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("year"), F.month("o_orderdate").alias("month")
    ).agg(F.sum(cents).alias("cents"))
    w = Window.orderBy("year", "month")
    prev = F.lag("cents").over(w)
    return monthly.select(
        "year",
        "month",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        ((F.col("cents") - prev).cast("double") / prev.cast("double")).alias(
            "mom_growth"
        ),
    )


@register(
    "ks_value_distribution",
    oracle="""
WITH s AS (
  SELECT value,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i1,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i2
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
g AS (
  SELECT value,
         CAST(sum(i1) AS BIGINT) AS a,
         CAST(sum(i2) AS BIGINT) AS b
  FROM s GROUP BY 1
),
n AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2 FROM g),
c AS (
  SELECT n.n1, n.n2,
         CAST(sum(g.a * n.n2 - g.b * n.n1)
                OVER (ORDER BY g.value) AS BIGINT) AS cw
  FROM g, n
)
SELECT n1, n2,
       CAST(max(abs(cw)) AS BIGINT) AS ks_num,
       CAST(max(abs(cw)) AS DOUBLE)
         / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_stat
FROM c GROUP BY 1, 2
""",
)
def ks_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the value
    distributions of click vs purchase events — the standard drift /
    distribution-shift test between two cohorts (training-data curation:
    did this source's quality distribution move between snapshots?).

    KS = max over x of |F₁(x) − F₂(x)|. Exact-integer formulation: after
    pre-aggregating to per-distinct-value counts (a, b), the scaled ECDF
    gap at value x is ``Σ_{v≤x} (a·n₂ − b·n₁)`` — a running sum of exact
    integers whose max |·| divided by ``n₁·n₂`` is the statistic. One
    final double division, so Spark and DuckDB agree bitwise. (n₁·n₂ and
    the running sum live in int64 — fine to ~3·10⁹ rows per side; past
    that, lift the weight to decimal(38,0) — the plan is unchanged.)

    No single-task sort: the running sum rides the bucketed two-level
    selection (``rankdist.with_global_ranks`` with a weight column) —
    approx-quantile cutpoints broadcast map-side, exact per-bucket running
    sums, prefix-sum offsets joined back. Grouping first by distinct value
    both shrinks the ranked frame and makes tie handling exact (the gap is
    only ever evaluated at complete value groups). Per-sample sizes ride a
    1-row broadcast.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .filter(F.col("value").isNotNull())
    )
    return ks_two_sample(ev, "value", F.col("event_type") == "click")


def ks_two_sample(df: DataFrame, value_col: str, is_first: "F.Column") -> DataFrame:
    """Core of :func:`ks_value_distribution`, reusable on any frame: rows
    where ``is_first`` is true form sample 1, the rest sample 2; returns
    one row (n1, n2, ks_num, ks_stat). See the query docstring for the
    exact-integer formulation and the rankdist scaling argument."""
    s = df.select(
        F.col(value_col).alias("value"),
        F.when(is_first, 1).otherwise(0).alias("i1"),
        F.when(~is_first, 1).otherwise(0).alias("i2"),
    )
    g = s.groupBy("value").agg(
        F.sum("i1").cast("bigint").alias("a"),
        F.sum("i2").cast("bigint").alias("b"),
    )
    n = g.agg(
        F.sum("a").cast("bigint").alias("n1"),
        F.sum("b").cast("bigint").alias("n2"),
    )
    gg = g.crossJoin(F.broadcast(n)).withColumn(
        "w", F.col("a") * F.col("n2") - F.col("b") * F.col("n1")
    )
    ranked = rankdist.with_global_ranks(gg, ["value"], weight="w")
    return (
        ranked.groupBy("n1", "n2")
        .agg(F.max(F.abs(F.col(rankdist.CUMW))).cast("bigint").alias("ks_num"))
        .select(
            "n1",
            "n2",
            "ks_num",
            (
                F.col("ks_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("ks_stat"),
        )
    )


@register(
    "skyline_orders",
    oracle="""
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders a
  WHERE a.o_orderdate <= o.o_orderdate
    AND a.o_totalprice >= o.o_totalprice
    AND (a.o_orderdate < o.o_orderdate OR a.o_totalprice > o.o_totalprice)
)
""",
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): orders not dominated on
    (earlier-or-equal date, higher-or-equal price) — "the largest order
    seen so far" frontier. The oracle is the naive NOT EXISTS dominance
    query; matching it proves the distributed reduction exact.

    Börzsönyi et al.'s skyline operator reduced to monotone algebra: an
    order is in the skyline iff its price equals its timestamp's max AND
    strictly exceeds the running max over all earlier timestamps. That
    rewrites the O(n²) dominance test as

      1. per-timestamp ``max`` (one map-side-combinable aggregate — only
         per-ts champions can survive),
      2. a PARTITIONED running max: within-day prefix max ordered by ts
         (``Window.partitionBy(day)`` — parallel), plus a cross-day
         prefix max over the per-day maxima (calendar-bounded frame:
         ~2.4k rows here, ≤ days-in-history at ANY corpus size, the same
         bounded-domain argument as the other day-grain windows),
      3. one broadcast join of the day frontier and one semi-join back to
         pick up tied order keys.

    No unpartitioned pass ever sees un-reduced input, so the plan
    survives 100 TB: step 1 reduces to |distinct ts|, step 2's only
    serial frame is |distinct days|."""
    orders = load_table(spark, sf_dir, "orders")
    return pareto_frontier(orders)


def pareto_frontier(orders: DataFrame) -> DataFrame:
    """Distributed 2-D skyline core over (o_orderkey, o_orderdate,
    o_totalprice) rows — see :func:`skyline_orders` for the derivation;
    property-tested against a brute-force dominance reference in
    ``tests/test_properties.py``."""
    # 1. per-timestamp champions
    per_ts = orders.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("m_ts")
    )

    # 2a. per-day maxima → cross-day strictly-earlier prefix max (bounded)
    per_day = per_ts.groupBy(
        F.date_trunc("DAY", "o_orderdate").alias("day")
    ).agg(F.max("m_ts").alias("m_day"))
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    day_prev = per_day.select(
        "day", F.max("m_day").over(w_days).alias("m_prev_days")
    )

    # 2b. within-day strictly-earlier prefix max (partitioned by day)
    w_in_day = (
        Window.partitionBy(F.date_trunc("DAY", "o_orderdate"))
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_frontier = per_ts.select(
        "o_orderdate",
        "m_ts",
        F.max("m_ts").over(w_in_day).alias("m_prev_in_day"),
        F.date_trunc("DAY", "o_orderdate").alias("day"),
    ).join(F.broadcast(day_prev), "day")

    # skyline timestamps: champion beats everything strictly earlier
    m_prev = F.greatest(
        F.coalesce("m_prev_in_day", F.lit(float("-inf"))),
        F.coalesce("m_prev_days", F.lit(float("-inf"))),
    )
    sky_ts = ts_frontier.filter(F.col("m_ts") > m_prev).select(
        F.col("o_orderdate").alias("sky_ts"), F.col("m_ts").alias("sky_price")
    )

    # 3. recover all tied order rows at the surviving (ts, price) points
    return orders.join(
        F.broadcast(sky_ts),
        (F.col("o_orderdate") == F.col("sky_ts"))
        & (F.col("o_totalprice") == F.col("sky_price")),
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "grouping_sets_revenue",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE compile to,
    here with the asymmetric set list neither shorthand can express
    ((a,b), (a), (b), ()) plus per-column GROUPING() indicators to
    disambiguate super-aggregate NULLs from genuine NULL keys.

    Spark expands all four sets inside ONE Expand+HashAggregate pair —
    one scan, one shuffle regardless of set count, the same plan shape as
    a plain groupBy. GROUPING() is the ANSI bitfield in both engines, so
    the indicator columns hash-match too."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders_gs
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
"""
    )


@register(
    "chi2_dow_event_mix",
    oracle="""
WITH cells AS (
  SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS weekday, event_type,
         count(*) AS observed
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT weekday, event_type, observed,
         sum(observed) OVER (PARTITION BY weekday) AS row_total,
         sum(observed) OVER (PARTITION BY event_type) AS col_total,
         sum(observed) OVER () AS grand_total
  FROM cells
),
scored AS (
  SELECT weekday, event_type, observed,
         CAST(row_total * col_total AS DOUBLE) / grand_total AS expected,
         (observed - CAST(row_total * col_total AS DOUBLE) / grand_total)
           * (observed - CAST(row_total * col_total AS DOUBLE) / grand_total)
           / (CAST(row_total * col_total AS DOUBLE) / grand_total) AS chi2_cell
  FROM tot
),
total AS (
  SELECT list_reduce(list(chi2_cell ORDER BY weekday, event_type),
                     (acc, x) -> acc + x) AS chi2_total
  FROM scored
)
SELECT weekday, event_type, observed, expected, chi2_cell, chi2_total
FROM scored, total
""",
)
def chi2_dow_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence audit of (day-of-week × event-type) — the
    drift check for "did the traffic mix change by weekday", published
    per-cell (observed, expected, contribution) plus the total statistic.

    Exactness: observed/row/col/grand totals are integers; each cell's
    expected value and χ² contribution is a short fixed-association chain
    of IEEE ops on those integers — identical doubles in both engines.
    The TOTAL is where naive float summation breaks (sum order is
    engine-dependent), so it folds the per-cell contributions in a FIXED
    (weekday, event_type) order — the frame is |dow|·|types| = 35 cells,
    bounded by the category product at any data volume, the same
    bounded-frame argument as the daily-grain windows.

    Plan: one shuffle into the cell aggregate; the margin totals are
    windows over the 35-cell frame; the ordered fold is a 35-element
    array in one task. The raw fact table is touched exactly once."""
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        F.dayofweek("ts").alias("weekday"), "event_type"
    ).agg(F.count(F.lit(1)).alias("observed"))
    w_r = Window.partitionBy("weekday")
    w_c = Window.partitionBy("event_type")
    w_g = Window.partitionBy()
    tot = cells.select(
        "weekday",
        "event_type",
        "observed",
        F.sum("observed").over(w_r).alias("row_total"),
        F.sum("observed").over(w_c).alias("col_total"),
        F.sum("observed").over(w_g).alias("grand_total"),
    )
    expected = (F.col("row_total") * F.col("col_total")).cast("double") / F.col(
        "grand_total"
    )
    diff = F.col("observed") - expected
    scored = tot.select(
        "weekday",
        "event_type",
        "observed",
        expected.alias("expected"),
        (diff * diff / expected).alias("chi2_cell"),
    )
    total = scored.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("weekday", "event_type", "chi2_cell"))
                ),
                lambda x: x["chi2_cell"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("chi2_total")
    )
    return scored.crossJoin(F.broadcast(total))
