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
    df = registry.queries()["dedup_minhash_signatures"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, f"expected <=1 hash exchange, plan:\n{plan}"
