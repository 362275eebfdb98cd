"""Plan-shape assertions — the scale contract, checked mechanically:
filters reach the scan, projections prune, small sides broadcast, and no
row-at-a-time Python appears anywhere (SURVEY.md §4 / the 100 TB stance)."""

from __future__ import annotations

import pytest

from deg04_local_data_lake_spark import registry
from deg04_local_data_lake_spark.plans import explain


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = registry.queries()["q1_pricing_summary"](spark, sf_dir)
    explain.assert_pushed_filter(df, "LessThanOrEqual(l_shipdate")
    explain.assert_read_schema_pruned(df, max_cols=7)  # 7 of 11 lineitem cols


def test_orders_filter_pushdown(spark, sf_dir):
    df = registry.queries()["orders_filter_project"](spark, sf_dir)
    explain.assert_pushed_filter(df, "GreaterThan(o_totalprice")


def test_dimension_join_broadcasts(spark, sf_dir):
    df = registry.queries()["union_account_balances"](spark, sf_dir)
    explain.assert_broadcast_join(df)


def test_cdc_upsert_broadcasts_increment(spark, sf_dir):
    df = registry.queries()["cdc_upsert_customer"](spark, sf_dir)
    explain.assert_broadcast_join(df)


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_no_row_python_udf_anywhere(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    explain.assert_no_python_row_udf(df)


def test_partitioned_bronze_prunes_partitions(spark, smoke_dir, tmp_path):
    """Dynamic partition pruning contract: a date-filtered read of the
    partitioned bronze table must carry PartitionFilters and scan a subset
    of partition directories."""
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.pipelines.medallion import run_medallion

    paths = run_medallion(spark, smoke_dir, str(tmp_path / "lake"))
    bronze = spark.read.parquet(paths["bronze"])
    some_day = bronze.select("trade_date").limit(1).collect()[0][0]
    filtered = bronze.filter(F.col("trade_date") == F.lit(some_day))
    plan = explain.formatted_plan(filtered)
    assert "PartitionFilters" in plan and "trade_date" in plan
    n_dirs = len(list((tmp_path / "lake" / "bronze" / "stock_quotes").glob("trade_date=*")))
    assert filtered.count() > 0
    assert n_dirs > 1  # pruning is meaningful: many partitions exist


def test_minhash_single_exchange(spark, sf_dir):
    """Shingle window + signature groupBy must share one doc_id exchange."""
    # cached plans from earlier tests (dedup_minhash_estimate persists the
    # signature subtree) would splice an InMemoryRelation — whose stored
    # plan carries its own Exchange — into this plan; count the clean shape
    spark.catalog.clearCache()
    df = registry.queries()["dedup_minhash_signatures"](spark, sf_dir)
    n = explain.count_shuffle_exchanges(df)
    assert n <= 1, f"expected <=1 shuffle exchange, found {n}"


# The user-timeline family's shuffle budget, pinned per query. The FACT
# table shuffles at most once (onto user_id); where a second exchange
# appears it carries already-reduced rows (a ≤5-key channel/bucket
# aggregate, a 1-row global sum, or deduplicated user-days), never the
# fact again. hashpartitioning(user_id) satisfies the clustered-
# distribution requirement of any (user_id, ...) grouping, which is why
# the windows + island aggregates stack exchange-free.
_SEQUENCE_SHUFFLE_BUDGET = {
    "merge_event_intervals": 1,      # windows + both aggs inside user_id
    "events_sessionize": 1,
    "forward_fill_values": 1,
    "attribution_last_touch": 2,     # + ≤5-row channel aggregate
    "attribution_linear_integer": 2, # + 1-row global sum
    "sessionized_conversion": 2,     # + ≤5-row entry-channel aggregate
    "session_duration_histogram": 2, # + 6-row bucket aggregate
    "activity_streaks": 2,           # distinct days first (map-side combine
                                     # shrinks BOTH shuffles below the fact)
}


@pytest.mark.parametrize("name", sorted(_SEQUENCE_SHUFFLE_BUDGET))
def test_sequence_family_shuffle_budget(spark, sf_dir, name):
    """The user-timeline operators' scale claim, checked mechanically: the
    fact shuffles ONCE; any further exchange moves reduced data only. A
    regression that re-shuffles the fact (e.g. a window repartitioned on a
    non-prefix key) breaks the pinned budget."""
    spark.catalog.clearCache()  # see test_minhash_single_exchange
    df = registry.queries()[name](spark, sf_dir)
    n = explain.count_shuffle_exchanges(df)
    budget = _SEQUENCE_SHUFFLE_BUDGET[name]
    assert n <= budget, f"{name}: expected <={budget} shuffle exchanges, found {n}"


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """At 100 TB a selective dim-side predicate must reach the fact scan
    even when the dim is too big to broadcast: Spark's runtime bloom
    filter builds a sketch of the filtered build-side keys and injects a
    ``might_contain`` predicate on the probe side, cutting the shuffled
    fact volume to ~the selectivity. The thresholds that gate it are
    sized for clusters, so the test lowers the application-side floor to
    observe the mechanism at test scale."""
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.sources.readers import load_table

    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        # the rewrite is a pure pruning optimization — results unchanged
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        plain = li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        assert j.count() == plain.count()
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# deliberate nested-loop joins: one-row scalar broadcasts (global aggregate
# crossed back onto the data) or the documented brute-force verify baseline
_BNLJ_ALLOWED = {
    "anomalous_daily_revenue",   # 1-row (mean, std) broadcast
    "pagerank_step",             # 1-row node-count broadcast
    "pagerank_iterated",         # the same 1-row node-count broadcast x5
    "q11_value_concentration",   # 1-row global-threshold broadcast
    "rfm_segments",              # 1-row anchor-date broadcast
    "q22_idle_balances",         # 1-row average-balance broadcast
    "embedding_pca_power_iter",  # 1-row norm broadcast
    "not_in_null_semantics",     # null-aware anti join — the query EXISTS to
                                 # demonstrate why NOT IN plans a BNLJ
    "similarity_topk",           # brute-force baseline (verify stage; IVF is the scale path)
    "text_rare_token_score",     # 1-row corpus-size broadcast
    "triangle_count",            # three 1-row aggregates combined
    "tfidf_top_terms",           # 1-row doc-count broadcast
    "bm25_top_terms",            # 1-row (doc-count, total-length) broadcast
    "ks_value_distribution",     # 1-row (n1, n2) sample-sizes broadcast
    "weekday_seasonality",       # 1-row overall-mean broadcast
    "basket_affinity_lift",      # 1-row basket-count broadcast
    "langid_confusion",          # 1-row total-docs broadcast
    "lm_trigram_familiarity",    # 1-row char-vocabulary broadcast
    "dedup_lsh_recall",          # two 1-row audit aggregates combined
    "hll_portable_merge",        # 1-row exact-count broadcast beside the sketch
    "chi2_dow_event_mix",        # 1-row ordered-fold total broadcast
    "bitmap_user_overlap",       # three 1-row popcount aggregates combined
    "hll_user_overlap",          # three 1-row sketch estimates combined
    "heavy_hitters_tokens",      # 1-row total-token-count broadcast
    "sample_dsir_weights",       # 1-row (source-total, target-total) broadcast
    "click_to_purchase_within_hour",  # two 1-row count aggregates combined
    "winsorized_value_mean",     # 1-row clamp-bounds broadcast (+ rankdist cuts)
    # rankdist's ungrouped cutpoint frame is ONE row joined on a constant
    # key; Catalyst folds the constant equality away, leaving the same
    # 1-row-broadcast nested loop as the scalar broadcasts above
    "order_price_deciles",
    "weighted_median_price",
    "pareto_revenue_share",
    "time_to_conversion",
}


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_no_accidental_quadratic_join(spark, sf_dir, name):
    """No registered query may plan a CartesianProduct, and nested-loop
    joins are allowed only where deliberate (one-row scalar broadcasts /
    the documented brute-force baseline) — the guard against a dropped
    join predicate silently going quadratic at 100 TB."""
    df = registry.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in _BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_dynamic_partition_pruning_from_dim_filter(spark, smoke_dir, tmp_path):
    """True runtime DPP — the 100 TB star-join contract: when a partitioned
    fact joins a dim whose *filter* (not the fact's) selects few partitions,
    Catalyst must inject a ``dynamicpruningexpression`` into the fact scan's
    PartitionFilters so only the matching partition directories are read.
    Static PartitionFilters (covered by the medallion test above) don't help
    here because the selective predicate lives on the dim side."""
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.sources.readers import load_table

    ev = load_table(spark, smoke_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    path = str(tmp_path / "fact_by_day")
    ev.write.partitionBy("day").parquet(path)
    fact = spark.read.parquet(path)

    days = sorted(r[0] for r in fact.select("day").distinct().collect())
    assert len(days) > 2  # pruning is meaningful
    dim = spark.createDataFrame(
        [(d, "keep" if i == 0 else "drop") for i, d in enumerate(days)],
        "day date, tag string",
    )
    j = fact.join(dim.filter(F.col("tag") == "keep"), "day")

    plan = explain.formatted_plan(j)
    assert "dynamicpruningexpression" in plan.lower(), plan
    assert j.count() == fact.filter(F.col("day") == days[0]).count()


# ---------------------------------------------------------------------------
# Rank-selection scale contract: no unpartitioned ordered Window over
# un-reduced input. An unpartitioned Window.orderBy funnels every input row
# into ONE task — the exact failure VERDICT r2 flagged on the rank-selection
# family; those queries now run the distributed bucketed selection in
# operators/rankdist.py. The whitelist below is every remaining legitimate
# site, each justified by a bounded input frame.
# ---------------------------------------------------------------------------

# Frames whose row count is bounded by the calendar (one row per day / hour
# / month — ~10^3-10^4 rows even at 100 TB, because the grain is time, not
# data volume) or by a pre-limit.
_UNPARTITIONED_WINDOW_ALLOWED = {
    "cusum_changepoint",           # one row per order day
    "events_burst_detection",      # one row per hour
    "monthly_revenue_growth",      # one row per (year, month)
    "open_orders_per_day",         # one row per day
    "range_interval_window",       # one row per day
    "revenue_autocorr_lag1",       # one row per day
    "rolling_trend_daily_revenue", # one row per day
    "window_daily_revenue",        # one row per day
    "similarity_ivfadc_topk",      # cell rank over the |cells|-row centroid
                                   # frame (cells scale ~sqrt(n), not with
                                   # data volume)
    "skyline_orders",              # cross-day prefix max over per-day maxima
                                   # (one row per day; within-day prefix max
                                   # is partitioned)
    "session_path_topk",           # WindowGroupLimit pre-limits to k rows
                                   # per input partition before the final
                                   # single-partition rank (asserted below)
}


def _unpartitioned_ordered_windows(plan: str) -> list[str]:
    """Window nodes whose spec orders without partitioning.

    In executed-plan toString form, ``windowspecdefinition(...)`` lists
    partition columns first (bare attributes), then sort orders
    (``col ASC/DESC NULLS ...``), then the frame. A spec whose FIRST
    argument is a sort order has an empty partition spec — the
    single-task shape this test polices.
    """
    import re

    out = []
    for ln in plan.splitlines():
        if not re.search(r"\bWindow \[", ln):
            continue
        for m in re.finditer(r"windowspecdefinition\(([^,]+),", ln):
            first = m.group(1)
            if " ASC" in first or " DESC" in first:
                out.append(ln.strip())
                break
    return out


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_no_unpartitioned_window_over_unreduced_input(spark, sf_dir, name):
    spark.catalog.clearCache()
    df = registry.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    offending = [
        w for w in _unpartitioned_ordered_windows(plan) if "_rsel_" not in w
    ]  # rankdist's own offsets window runs over a |buckets|-row frame
    if name in _UNPARTITIONED_WINDOW_ALLOWED:
        return
    assert not offending, f"{name}: unpartitioned ordered Window over un-reduced input:\n" + "\n".join(offending)


def test_session_path_topk_has_window_group_limit(spark, sf_dir):
    """The one whitelisted top-k window must keep its WindowGroupLimit
    pre-limit (k rows per partition reach the final rank) — without it the
    whitelist entry above would be unsound."""
    df = registry.queries()["session_path_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# Queries built on operators/rankdist.py. Their correctness depends on the
# cutpoints broadcast being computed ONCE and shared by the rank-window and
# counts branches; Spark guarantees that via ReuseExchange on the
# canonically-equal deterministic subplans. AQE performs the same reuse at
# stage-materialization time but does not annotate it in plan text, so the
# assert pins the static (AQE-off) plan.
_RANKDIST_QUERIES = [
    "order_price_deciles",
    "winsorized_value_mean",
    "value_percentiles_by_type",
    "robust_outliers_mad",
    "weighted_median_price",
    "pareto_revenue_share",
    "time_to_conversion",
    "rfm_segments",
    "ks_value_distribution",
]


@pytest.mark.parametrize("name", _RANKDIST_QUERIES)
def test_rankdist_reuses_cutpoint_exchange(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = registry.queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan, f"{name}: cutpoint broadcast not reused"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
