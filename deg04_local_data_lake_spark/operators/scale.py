"""Explicit scale mechanics: skew salting and bucketed co-located joins.

AQE (on by default, session.py) already splits skewed *join* partitions and
coalesces small ones; the helpers here cover the cases AQE doesn't:

- ``salted_agg``: a groupBy whose key distribution is pathological (a few
  keys own most rows) bottlenecks on the reducers owning hot keys — even
  with map-side combine, when upstream is thousands of mappers the combine
  ratio per mapper shrinks. Salting splits each hot key into N sub-keys,
  aggregates partially, then merges. Only valid for algebraic aggregates
  (sum/count/min/max — anything with an associative merge).
- ``write_bucketed`` / co-located joins: two fact tables bucketed by the
  same key into the same bucket count join WITHOUT any exchange — at
  100 TB, pre-bucketing the canonical join keys (orderkey, doc_id) turns
  every downstream join/aggregation on that key into a map-side operation.
  Verified by plan assertion in tests/test_scale.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

DEFAULT_SALT = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = DEFAULT_SALT,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage skew-resistant aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs`` merge the
    partials per key. The salt derives from a high-cardinality source
    column when given (deterministic), else ``spark_partition_id()`` —
    which is nondeterministic in value but the *merged* result is identical
    because the aggregates are associative.
    """
    salt = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


@register(
    "events_value_by_type_salted",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       max(value) AS max_value
FROM events GROUP BY event_type
""",
)
def events_value_by_type_salted(spark, sf_dir: str) -> DataFrame:
    """Per-event-type totals via salted two-stage aggregation. event_type
    has 5 values over all rows — exactly the shape that melts a single
    reducer at 100 TB. The decimal partial sums merge exactly, so the
    result is bit-identical to the direct group-by (which is the oracle)."""
    events = load_table(spark, sf_dir, "events")
    return salted_agg(
        events,
        keys=["event_type"],
        partial_aggs=[
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec("value")).alias("_sum"),
            F.max("value").alias("_max"),
        ],
        final_aggs=[
            F.sum("_n").cast("bigint").alias("n_events"),
            F.sum("_sum").cast("double").alias("total_value"),
            F.max("_max").alias("max_value"),
        ],
        salt_source="event_id",
    )


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist bucketed+sorted by the canonical join key (Spark bucketing
    requires saveAsTable). Readers joining two tables bucketed identically
    skip the exchange entirely."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


SKEW_SALT = 8


@register(
    "events_tier_salted_join",
    oracle="""
WITH dim AS (
  SELECT DISTINCT event_type,
         CASE WHEN event_type IN ('click', 'view') THEN 'high_volume'
              ELSE 'low_volume' END AS tier
  FROM events
)
SELECT tier,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events JOIN dim USING (event_type)
GROUP BY tier
""",
)
def events_tier_salted_join(spark, sf_dir: str) -> DataFrame:
    """Salted shuffle join for a pathologically hot join key. ``events``
    joins its type dimension on ``event_type`` — 5 distinct values, so a
    plain shuffle join lands ~all rows on 5 reducers no matter how many
    executors exist. The salt replicates each dim row ``SKEW_SALT`` ways
    and splits each big-side key by a hash of a high-cardinality column,
    so the join key becomes (event_type, salt) with 5×SKEW_SALT uniform
    partitions.

    This is the manual fallback for when AQE's skew splitting can't help
    (it only splits *oversized partitions* of sort-merge joins, not the
    logical key skew of a reused exchange). The oracle is the plain join —
    results are identical, only the partitioning differs.

    (At this dim size Spark would broadcast and no salt would be needed;
    the query force-disables broadcast via a NO_BROADCAST_HASH hint to
    exercise the shuffle path it exists to fix.)
    """
    events = load_table(spark, sf_dir, "events")
    dim = (
        events.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.when(F.col("event_type").isin("click", "view"), "high_volume")
            .otherwise("low_volume")
            .alias("tier"),
            F.explode(F.sequence(F.lit(0), F.lit(SKEW_SALT - 1))).alias("_salt"),
        )
    )
    salted = events.withColumn(
        "_salt", F.pmod(F.hash("event_id"), F.lit(SKEW_SALT))
    )
    joined = salted.hint("shuffle_hash").join(
        dim.hint("no_broadcast_hash"), ["event_type", "_salt"]
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@register(
    "cube_returnflag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grouping_level,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_returnflag_status(spark, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with an explicit grouping level —
    all four grouping sets (detail, per-flag, per-status, grand total) in
    one pass. Spark expands the sets before the shuffle, so the exchange
    carries each input row once per set but pre-aggregated by map-side
    combine; the ``grouping_id`` disambiguates real NULLs from
    super-aggregate NULLs exactly as GROUPING() does in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", "l_quantity")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("grouping_level"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ZORDER_BITS = 8


def _zorder_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of sources.writers.zorder_key: bit i of a → 2i, bit i
    of b → 2i+1. Non-overlapping targets, so + is |."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} & {1 << i}) * {1 << i})")
        terms.append(f"(({b} & {1 << i}) * {1 << (i + 1)})")
    return " + ".join(terms)


@register(
    "zorder_locality_audit",
    oracle=f"""
WITH keyed AS (
  SELECT o_custkey % 256 AS a,
         CAST(epoch(CAST(o_orderdate AS DATE)) / 86400 AS BIGINT) % 256 AS b
  FROM orders
),
z AS (SELECT a, b, {_zorder_sql('a', 'b')} AS zkey FROM keyed)
SELECT zkey // 1024 AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(a) AS min_a, MAX(a) AS max_a, MAX(a) - MIN(a) AS span_a,
       MIN(b) AS min_b, MAX(b) AS max_b, MAX(b) - MIN(b) AS span_b
FROM z GROUP BY 1
""",
)
def zorder_locality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-curve locality, measured: interleave two 8-bit keys with the
    REAL write-path expression (``sources.writers.zorder_key`` — the
    format-agnostic core of Delta's OPTIMIZE ZORDER) and aggregate each
    contiguous z-range's bounding box. Every 1024-wide z-bucket covers a
    small square in BOTH dimensions (span_a and span_b ≤ 31 for 8-bit
    keys, vs a 1-D sort where the non-sort dimension's span is the full
    256) — exactly the property that lets parquet min/max file stats
    prune predicates on EITHER column of a z-ordered layout. Map-only
    bit arithmetic + one low-cardinality aggregate; the oracle replicates
    the interleave bit-for-bit."""
    from deg04_local_data_lake_spark.sources.writers import zorder_key

    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        (F.col("o_custkey") % 256).alias("a"),
        (
            (
                F.col("o_orderdate").cast("date").cast("timestamp").cast("long")
                / 86400
            ).cast("bigint")
            % 256
        ).alias("b"),
    )
    z = keyed.withColumn(
        "zkey", zorder_key(F.col("a"), F.col("b"), ZORDER_BITS)
    )
    return (
        z.groupBy((F.col("zkey") / 1024).cast("bigint").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            (F.max("a") - F.min("a")).alias("span_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
            (F.max("b") - F.min("b")).alias("span_b"),
        )
    )


@register(
    "compaction_roundtrip",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       CAST(16 AS BIGINT) AS files_before,
       TRUE AS files_as_expected
FROM events GROUP BY 1
""",
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip, driver-attested: fragment the
    events table into 16 small files (the CDC-microbatch accumulation
    shape), run ``sources.writers.compact_table`` (side-dir rewrite +
    two-rename atomic swap — with Delta jars this is OPTIMIZE), and
    aggregate the COMPACTED table. Content surviving the rewrite
    bit-exactly is the parity check. ``files_before`` is 16 by
    construction (we fragment with ``repartition(16)``); the after-count
    is asserted as the INVARIANT ``files_after == ⌈bytes/target⌉`` rather
    than a literal, so the query stays green at any scale factor (at
    sf0.01 that's 1 file; at larger SFs it grows with the data, which a
    hardcoded constant would spuriously fail)."""
    import glob
    import math
    import os
    import shutil
    import tempfile

    from deg04_local_data_lake_spark.sources.writers import compact_table

    base = tempfile.mkdtemp(prefix="deg04_compact_")
    path = base + "/events"
    target = 128 * 1024 * 1024
    try:
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        ev.repartition(16).write.mode("overwrite").parquet(path)
        files_before = len(glob.glob(f"{path}/part-*"))
        size = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(path)
            for f in files
            if not f.startswith(("_", "."))
        )
        expected_after = max(1, math.ceil(size / target))
        compact_table(spark, path, target_file_bytes=target)
        files_after = len(glob.glob(f"{path}/part-*"))
        out = (
            spark.read.parquet(path)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(dec("value")).cast("double").alias("total_value"),
            )
            .withColumn("files_before", F.lit(files_before).cast("bigint"))
            .withColumn(
                "files_as_expected", F.lit(files_after == expected_after)
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "restore_rollback_roundtrip",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
       CAST(3 AS BIGINT) AS versions_written,
       CAST(1 AS BIGINT) AS restored_to,
       CAST(1 AS BIGINT) AS versions_vacuumed
FROM customer GROUP BY 1
""",
)
def restore_rollback_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE + VACUUM on the versioned-snapshot layer, driver-attested:
    write customer as v1, two derived snapshots as v2/v3, roll the
    manifest back to v1 (``rollback_versioned`` — Delta RESTORE), vacuum
    old snapshots (keeping the restored one: ``vacuum_versioned`` never
    drops the manifest target), and aggregate the manifest-latest read.
    The result must equal the ORIGINAL table — restore actually restored,
    vacuum didn't eat the restored version — with the version bookkeeping
    riding along as asserted constants so a manifest bug breaks the hash."""
    import tempfile

    from deg04_local_data_lake_spark.sources.writers import (
        read_versioned,
        rollback_versioned,
        vacuum_versioned,
        write_versioned,
    )
    from deg04_local_data_lake_spark.operators.lakehouse import _derived_snapshot

    import shutil

    base = tempfile.mkdtemp(prefix="deg04_restore_")
    path = base + "/customer"
    try:
        cust = load_table(spark, sf_dir, "customer")
        write_versioned(cust, path)
        snap2 = _derived_snapshot(cust)
        write_versioned(snap2, path)
        v3 = write_versioned(_derived_snapshot(snap2), path)
        rollback_versioned(path, 1)
        doomed = vacuum_versioned(path, keep_last=1)  # keeps v3 AND the manifest's v1
        out = (
            read_versioned(spark, path)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
            )
            .withColumn("versions_written", F.lit(v3).cast("bigint"))
            .withColumn("restored_to", F.lit(1).cast("bigint"))
            .withColumn("versions_vacuumed", F.lit(len(doomed)).cast("bigint"))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "pyds_ticks_scan",
    oracle="""
WITH grid AS (
  SELECT t.ticker, d.day, s.seq
  FROM (SELECT unnest(['AAPL', 'MSFT', 'GOOG']) AS ticker) t,
       (SELECT unnest(generate_series(0, 4)) AS day) d,
       (SELECT unnest(generate_series(0, 9)) AS seq) s
  WHERE d.day IN (1, 3)
),
ticks AS (
  SELECT day, ticker,
         100.0 + (('0x' || substr(md5(ticker || ':' || day || ':' || seq),
                                  1, 8))::BIGINT % 10000) / 100.0 AS price,
         1000 + ('0x' || substr(md5(ticker || ':' || day || ':' || seq),
                                9, 8))::BIGINT % 100000 AS volume
  FROM grid
)
SELECT ticker, day,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(SUM(volume) AS BIGINT) AS total_volume
FROM ticks GROUP BY 1, 2
""",
)
def pyds_ticks_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 DataSource API), driver-attested:
    ``spark.read.format("deg04_ticks")`` fans out one InputPartition per
    trading day and the ``day IN (1, 3)`` predicate reaches
    ``pushFilters`` — three of five day-partitions are never generated
    (source-side pruning, the contract a vendor-SDK wrapper needs). The
    tick stream is md5-derived, so the DuckDB oracle regenerates the
    exact rows the partitions emit: the hash match proves the custom
    source's partition fan-out, filter pushdown, and row generation all
    agree with the spec. Money sums ride exact decimals."""
    from deg04_local_data_lake_spark.operators.multimodal import (
        ensure_workers_can_import,
    )
    from deg04_local_data_lake_spark.sources.pyds import TicksDataSource

    ensure_workers_can_import(spark)
    # The session factory enables this conf by default; a vanilla driver
    # session may not — without it, a reader implementing pushFilters()
    # refuses to plan. Set it only for the duration of this query's
    # EAGER materialization, then restore the caller's value — no
    # cross-query side effect on a shared session.
    conf_key = "spark.sql.python.filterPushdown.enabled"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        try:
            spark.dataSource.register(TicksDataSource)
        except Exception:
            pass  # already registered in this session
        df = (
            spark.read.format("deg04_ticks")
            .option("days", 5)
            .option("rowsperday", 10)
            .load()
            .filter(F.col("day").isin(1, 3))
        )
        out = df.groupBy("ticker", "day").agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col("price").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.sum("volume").alias("total_volume"),
        )
        # tiny, SF-independent frame (|tickers|×|days| rows): pin it so
        # the conf can be restored before the caller ever executes it
        return out.localCheckpoint(eager=True)
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)


@register(
    "observed_write_audit",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS observed_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS observed_value,
       CAST(COUNT(*) AS BIGINT) AS reread_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS reread_value
FROM events
""",
)
def observed_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight write audit (``df.observe`` → ``Observation``),
    driver-attested: quality metrics accumulate on the executors WHILE
    the rows stream to the sink — zero extra scans — and the query emits
    them beside a full re-read aggregate of the written table. All four
    columns hash-matching the source oracle proves (a) the observed
    metrics describe exactly what was written, and (b) the write was
    lossless; at 100 TB you keep (a) and drop the re-read — that is the
    point of observing in-flight."""
    import tempfile

    from deg04_local_data_lake_spark.sources.writers import write_observed

    import shutil

    base = tempfile.mkdtemp(prefix="deg04_observed_")
    path = base + "/events"
    try:
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        m = write_observed(
            ev,
            path,
            {
                "n": F.count(F.lit(1)),
                "v": F.sum(dec("value")).cast("double"),
            },
        )
        reread = spark.read.parquet(path).agg(
            F.count(F.lit(1)).cast("bigint").alias("reread_rows"),
            F.sum(dec("value")).cast("double").alias("reread_value"),
        )
        out = reread.select(
            F.lit(m["n"]).cast("bigint").alias("observed_rows"),
            F.lit(m["v"]).cast("double").alias("observed_value"),
            "reread_rows",
            "reread_value",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "parquet_agg_pushdown_stats",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
       TRUE AS agg_pushed
FROM lineitem
""",
)
def parquet_agg_pushdown_stats(spark, sf_dir: str) -> DataFrame:
    """Parquet AGGREGATE pushdown (Spark 3.3+ DSv2): a filterless
    MIN/MAX/COUNT is answered from parquet FOOTER statistics — zero data
    pages decoded. At 100 TB this turns "how many rows / what's the
    value range of this table" from a full scan into an
    O(row-groups) metadata read, the same class of win as partition
    pruning; it is how table-stats collection and range-probe planning
    stay cheap at fleet scale.

    The v1 parquet reader cannot push aggregates, so the query flips the
    scan to DSv2 (``spark.sql.sources.useV1SourceList=""``) plus
    ``spark.sql.parquet.aggregatePushdown=true``, SCOPED: the plan is
    forced eagerly (the 1-row aggregate is localCheckpointed) and both
    confs are restored in ``finally`` — no cross-query leakage. The
    result row carries ``agg_pushed``, read from the OPTIMIZED PLAN
    itself (``PushedAggregation: [COUNT(*), MIN(...)...]``), so the
    oracle comparison fails loudly if a future Spark/conf change
    silently falls back to scanning — the same self-attesting-boolean
    pattern as ``delta_log_partition_prune``."""
    from deg04_local_data_lake_spark.plans.explain import formatted_plan

    conf = spark.conf
    prior_v1 = conf.get("spark.sql.sources.useV1SourceList")
    prior_agg = conf.get("spark.sql.parquet.aggregatePushdown", "false")
    try:
        conf.set("spark.sql.sources.useV1SourceList", "")
        conf.set("spark.sql.parquet.aggregatePushdown", "true")
        agg = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.min("l_quantity").alias("min_qty"),
                F.max("l_quantity").alias("max_qty"),
                F.min("l_extendedprice").alias("min_price"),
                F.max("l_extendedprice").alias("max_price"),
            )
        )
        pushed = "PushedAggregation: [COUNT(*)" in formatted_plan(agg)
        return (
            agg.withColumn("agg_pushed", F.lit(pushed))
            .localCheckpoint(eager=True)
        )
    finally:
        conf.set("spark.sql.sources.useV1SourceList", prior_v1)
        conf.set("spark.sql.parquet.aggregatePushdown", prior_agg)
