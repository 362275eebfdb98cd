"""Scale-mechanics tests: bucketed joins skip the exchange; salted
aggregation matches the direct plan bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from deg04_local_data_lake_spark.operators.scale import write_bucketed
from deg04_local_data_lake_spark.plans import explain
from deg04_local_data_lake_spark.sources.readers import load_table


def test_bucketed_join_has_no_exchange(spark, smoke_dir):
    # warehouse dir is static config — the session fixture points it at a
    # temp dir; tables here are dropped in the finally block
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    li = load_table(spark, smoke_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, smoke_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "bktest.li_b", "l_orderkey")
    write_bucketed(orders, "bktest.orders_b", "o_orderkey")

    # disable broadcast so the join would otherwise need a shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bktest.li_b").join(
            spark.table("bktest.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = explain.formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # sanity: result is correct
        n = joined.count()
        assert n == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bktest.li_b")
        spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")


def test_clustered_write_prunes_files(spark, smoke_dir, tmp_path):
    """Range-clustered output: a date-range filter must scan a strict
    subset of the written files (parquet min/max pruning)."""
    from deg04_local_data_lake_spark.operators.aggregates import ohlcv_quotes
    from deg04_local_data_lake_spark.sources.writers import write_clustered

    quotes = ohlcv_quotes(load_table(spark, smoke_dir, "lineitem"))
    out = str(tmp_path / "clustered")
    write_clustered(quotes, out, cluster_by=["trade_date"], n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == quotes.count()

    # clustering proof: per-file key ranges are narrow — min and max of the
    # whole dataset never share a file, and files are (near-)disjoint, so
    # parquet footer min/max stats can prune range scans to few files
    import pyarrow.parquet as pq

    files = sorted((tmp_path / "clustered").glob("*.parquet"))
    assert len(files) >= 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "trade_date"
        )
        st = md.row_group(0).column(idx).statistics
        ranges.append((st.min, st.max))
    ranges.sort()
    overlaps = sum(
        1 for (a, b) in zip(ranges, ranges[1:]) if b[0] < a[1]
    )
    assert overlaps == 0, f"file key ranges overlap: {ranges}"


def test_salted_agg_matches_direct(spark, sf_dir):
    from deg04_local_data_lake_spark.operators.scale import events_value_by_type_salted

    salted = {
        r["event_type"]: (r["n_events"], r["total_value"], r["max_value"])
        for r in events_value_by_type_salted(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: (r["n"], r["tv"], r["mx"])
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("tv"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert salted == direct


def test_zorder_write_prunes_both_dimensions(spark, smoke_dir, tmp_path):
    """A Z-ordered (value, user_id) table must give narrow per-file ranges
    in BOTH dimensions — the one-dimensional clustered write only narrows
    its own key. Compare the mean fraction of the global range each file
    covers."""
    import glob

    from deg04_local_data_lake_spark.sources.readers import load_table
    from deg04_local_data_lake_spark.sources.writers import (
        write_clustered,
        write_zordered,
    )

    events = load_table(spark, smoke_dir, "events").select("user_id", "value")
    zpath = str(tmp_path / "zordered")
    cpath = str(tmp_path / "clustered")
    write_zordered(events, zpath, ("value", "user_id"), n_files=16, bits=8)
    write_clustered(events, cpath, ["value"], n_files=16)

    def mean_span(path: str, col: str) -> float:
        lo, hi = events.selectExpr(f"min({col})", f"max({col})").first()
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            fl, fh = spark.read.parquet(f).selectExpr(
                f"min({col})", f"max({col})"
            ).first()
            spans.append((fh - fl) / (hi - lo))
        return sum(spans) / len(spans)

    # both layouts narrow `value`; only z-order also narrows `user_id`
    assert mean_span(cpath, "user_id") > 0.9          # stripe: full range
    assert mean_span(zpath, "user_id") < 0.5
    assert mean_span(zpath, "value") < 0.5


def test_analyze_table_feeds_cbo_stats(spark, smoke_dir):
    """Cost-based optimization contract: ANALYZE TABLE materializes
    row-count/size statistics into the catalog, and Catalyst's estimates
    pick them up — at 100 TB those stats are what drive join reordering
    and broadcast decisions for catalog tables (file listing alone only
    yields sizeInBytes)."""
    from deg04_local_data_lake_spark.sources.readers import load_table

    spark.sql("CREATE DATABASE IF NOT EXISTS statstest")
    old_cbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        nation = load_table(spark, smoke_dir, "nation")
        nation.write.mode("overwrite").saveAsTable("statstest.nation_s")

        def row_count_stat():
            stats = (
                spark.table("statstest.nation_s")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            rc = stats.rowCount()
            return rc.get() if rc.isDefined() else None

        assert row_count_stat() is None  # no stats before ANALYZE
        spark.sql("ANALYZE TABLE statstest.nation_s COMPUTE STATISTICS")
        assert row_count_stat() == nation.count()
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old_cbo)
        spark.sql("DROP TABLE IF EXISTS statstest.nation_s")
        spark.sql("DROP DATABASE IF EXISTS statstest")


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join contract: when one join key dominates, the runtime
    re-plan must split the oversized shuffle partition (SortMergeJoin
    gains ``skew=true`` and the shuffle read reports skewed splits)
    instead of letting one task carry 90% of the rows — the no-manual-salt
    skew path; `events_tier_salted_join` is the explicit-salt one. The
    byte thresholds are cluster-sized, so the test lowers them to observe
    the mechanism at test scale."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    keep = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        n_rows = len(j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        # the split is a pure partitioning change — row count must match
        # the logical join size: 180k rows on key 0 + 20k distinct-key
        # rows that land inside right's [0, 50000) range
        assert n_rows == 180000 + 5000
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
