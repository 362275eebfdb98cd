"""Medallion (bronze → silver → gold) pipeline
(SURVEY.md §3 EP3 — scratchpads/financial_dl_etl.py, the reference's
flagship flow — and §2.2 sinks).

Composable, pure-function stages over the OHLCV quote stream; the write
path mirrors the reference's Delta layout but on format-agnostic parquet
(Delta/Iceberg via the ``fmt`` flag when the jars are wired, sources/
writers.py).

Deliberate divergences from the reference (SURVEY.md §7 risk register):
- bronze appends/overwrites *partitions by date+ticker*, not a blanket
  ``mode("overwrite")`` of one path per ticker — the reference's loop
  (financial_dl_etl.py:39-42,115-117) keeps only the last ticker written;
- SCD2 columns get deterministic values; open/close are min_by/max_by over
  a unique sequence, not unordered first/last.

Scale: bronze is partitioned by trade_date (dynamic partition pruning for
date-ranged queries); silver/gold are small aggregates. The full pipeline
is three jobs with exactly one wide shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.operators.aggregates import (
    _CLOSE_SQL,
    _OHLCV_SQL,
    _OPEN_SQL,
    asset_performance,
    market_trend,
    monthly_summary,
    ohlcv_quotes,
)
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table
from deg04_local_data_lake_spark.sources.writers import write_lake_table

SCD2_SENTINEL = "2099-01-01"


def scd2_wrap(df: DataFrame, valid_from_col: str) -> DataFrame:
    """SCD2 validity columns as the reference populates them
    (financial_dl_etl.py:59-62): active version 1 with an open-ended
    sentinel end date."""
    return df.select(
        "*",
        F.lit(True).alias("is_active"),
        F.lit(1).alias("version"),
        F.col(valid_from_col).alias("valid_from"),
        F.to_date(F.lit(SCD2_SENTINEL), "yyyy-MM-dd").alias("valid_to"),
    )


def run_medallion(
    spark: SparkSession, sf_dir: str, out_dir: str, fmt: str = "parquet"
) -> dict[str, str]:
    """Execute the full bronze → silver → gold flow, writing lake tables.

    Returns the written table paths. Bronze is partitioned by trade_date
    (K6 / financial_dl_bronze.py:26); silver gets SCD2 columns; gold is the
    monthly rollup.
    """
    paths = {
        "bronze": f"{out_dir}/bronze/stock_quotes",
        "silver_asset": f"{out_dir}/silver/asset_performance",
        "silver_market": f"{out_dir}/silver/market_trend",
        "gold": f"{out_dir}/gold/monthly_summary",
    }
    quotes = ohlcv_quotes(load_table(spark, sf_dir, "lineitem"))
    write_lake_table(quotes, paths["bronze"], fmt=fmt, partition_by=["trade_date"])

    bronze = spark.read.format(fmt).load(paths["bronze"])
    silver_asset = scd2_wrap(asset_performance(bronze), "trade_date")
    write_lake_table(silver_asset, paths["silver_asset"], fmt=fmt, merge_schema=True)
    silver_market = scd2_wrap(market_trend(bronze), "trade_date")
    write_lake_table(silver_market, paths["silver_market"], fmt=fmt, merge_schema=True)

    silver = spark.read.format(fmt).load(paths["silver_asset"])
    gold = monthly_summary(silver)
    write_lake_table(gold, paths["gold"], fmt=fmt)
    return paths


@register(
    "silver_scd2_snapshot",
    # oracle reuses the aggregates module's shared SQL fragments so the
    # quote projection and open/close semantics cannot silently diverge
    oracle=f"""
WITH quotes AS ({_OHLCV_SQL})
SELECT trade_date, ticker,
       {_OPEN_SQL} AS opening_price,
       {_CLOSE_SQL} AS closing_price,
       max(price) AS high_price,
       min(price) AS low_price,
       CAST(SUM(CAST(volume AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS average_volume,
       TRUE AS is_active,
       1 AS version,
       trade_date AS valid_from,
       DATE '2099-01-01' AS valid_to
FROM quotes GROUP BY trade_date, ticker
""",
)
def silver_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver asset-performance with SCD2 validity columns — the
    reference's AssetPerformanceSilver shape (financial_dl_silver.py:14-26)."""
    quotes = ohlcv_quotes(load_table(spark, sf_dir, "lineitem"))
    return scd2_wrap(asset_performance(quotes), "trade_date")
