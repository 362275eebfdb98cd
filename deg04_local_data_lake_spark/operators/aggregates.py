"""Aggregation operators (SURVEY.md §2.6, A1-A4).

The reference's medallion ETL (scratchpads/financial_dl_etl.py:44-99)
aggregates OHLCV quotes per (Date, Ticker) — silver — then rolls silver up
to monthly (Year, Month, Ticker) — gold. We reproduce those shapes over the
driver's ``lineitem`` table (FIXTURES.md F1 mapping: shipdate→Date,
suppkey%5→Ticker, extendedprice→price, quantity→Volume).

Semantics fixes vs the reference:
- A1 uses ``first``/``last`` with no ordering (financial_dl_etl.py:56-57) —
  nondeterministic in Spark. We define open/close as ``min_by(price, seq)``
  / ``max_by(price, seq)`` over an event-sequence column (DuckDB twin:
  ``arg_min``/``arg_max``). ``seq`` is unique per row (orderkey ×
  linenumber), so the result is total and tie-free. min_by/max_by are
  declarative aggregates → the plan stays a partial+final *Hash*Aggregate;
  the earlier ``min(struct(seq, price))`` formulation forced a
  SortAggregate (struct min/max has no mutable hash buffer) — a full sort
  of the fact table, measured ~1.8× slower at sf0.1.
- All sums/avgs/stddevs go through exact decimal arithmetic
  (functions/portable.py) so results are order-insensitive and identical to
  the DuckDB oracle. Products are computed *in the decimal domain*
  (``dec(a) * (1 - dec(b))``) — decimal multiply is exact, whereas rounding
  a double product to 4 decimals differs between engines at half-way
  boundaries.

Scale notes: each query is a single partial+final hash aggregate — one
shuffle on the grouping keys, with map-side combine doing most of the
reduction. Grouping keys are low-cardinality (dates × tickers), so the
shuffle moves ~|groups|×|map partitions| pre-aggregated rows, not |input|
rows. Struct-min/max and decimal sums are associative, so partial
aggregation applies to every column. No skew: group sizes are uniform by
construction of a date-keyed feed; if a real feed had hot keys, AQE skew
handling is already on (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import (
    dec,
    exact_avg,
    exact_std,
    exact_std_sql,
    exact_sum,
)
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

# Shared OHLCV projection of lineitem (FIXTURES.md F1). ``seq`` is an
# event-sequence surrogate, unique per row ((l_orderkey, l_linenumber) is
# the table's primary key), so arg-min/max by seq is deterministic.
_OHLCV_SQL = """
SELECT CAST(l_shipdate AS DATE) AS trade_date,
       'T' || CAST(l_suppkey % 5 AS VARCHAR) AS ticker,
       l_extendedprice AS price,
       l_quantity AS volume,
       ((l_orderkey * 8 + l_linenumber) * 65536 + l_partkey) * 65536 + l_suppkey AS seq
FROM lineitem
"""

_OPEN_SQL = "arg_min(price, seq)"
_CLOSE_SQL = "arg_max(price, seq)"


def ohlcv_quotes(lineitem: DataFrame) -> DataFrame:
    """lineitem → OHLCV quote stream (trade_date, ticker, price, volume, seq)."""
    return lineitem.select(
        F.col("l_shipdate").cast("date").alias("trade_date"),
        F.concat(F.lit("T"), (F.col("l_suppkey") % 5).cast("string")).alias("ticker"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("volume"),
        (
            ((F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 65536
             + F.col("l_partkey")) * 65536 + F.col("l_suppkey")
        ).alias("seq"),
    )


def _open_close() -> tuple[F.Column, F.Column]:
    return F.min_by("price", "seq"), F.max_by("price", "seq")


def asset_performance(quotes: DataFrame) -> DataFrame:
    """A1 (financial_dl_etl.py:53-58): per-day-per-ticker OHLC + avg volume,
    with deterministic open/close ordering. Volume (quantity ≤ 50) uses the
    narrow decimal so its sum accumulator stays long-backed."""
    opening, closing = _open_close()
    return quotes.groupBy("trade_date", "ticker").agg(
        opening.alias("opening_price"),
        closing.alias("closing_price"),
        F.max("price").alias("high_price"),
        F.min("price").alias("low_price"),
        exact_avg("volume", "decimal(8,4)").alias("average_volume"),
    )


def market_trend(quotes: DataFrame) -> DataFrame:
    """A2 (financial_dl_etl.py:68-73): market-wide per-day sums/avgs."""
    return quotes.groupBy("trade_date").agg(
        exact_sum("volume", "decimal(8,4)").alias("total_market_volume"),
        exact_avg("price").alias("market_avg_price"),
        F.max("price").alias("market_high"),
        F.min("price").alias("market_low"),
        F.count(F.lit(1)).alias("n_trades"),
    )


def monthly_summary(silver: DataFrame) -> DataFrame:
    """A3+A4 (financial_dl_etl.py:88-94): monthly avg ROI + volatility
    (sample stddev) per ticker, from the silver closing price."""
    return (
        silver.withColumn("year", F.year("trade_date"))
        .withColumn("month", F.month("trade_date"))
        .groupBy("year", "month", "ticker")
        .agg(
            exact_avg("closing_price").alias("average_roi"),
            exact_std("closing_price").alias("volatility"),
            F.count(F.lit(1)).alias("trading_days"),
        )
    )


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(8,4))), 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(8,4)))
                * (1 + CAST(l_tax AS DECIMAL(8,4))), 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary — the reference's entire
    hot path (scan → filter → project → partial/final hash agg) in one query.

    The shipdate filter is pushed into the parquet scan (PushedFilters) and
    prunes whole row groups via min/max stats at scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # l_quantity (≤50) and l_discount (≤0.1) fit decimal(8,4): their SUM
    # accumulator decimal(18,4) stays long-backed ("compact") in Spark —
    # codegen'd primitive arithmetic instead of boxed BigDecimal, measured
    # 28% faster on this query; still overflow-safe at 100 TB (5·10^13 max
    # vs 10^14 capacity, and ANSI errors loudly past it).
    d_qty = dec("l_quantity", "decimal(8,4)")
    d_price = dec("l_extendedprice")
    d_disc = dec("l_discount", "decimal(8,4)")
    d_tax = dec("l_tax", "decimal(8,4)")
    # re-quantize products to (18,4): a (38,12) sum has >2^53 significant
    # units and its decimal→double conversion rounds differently across
    # engines (DuckDB int128 cast double-rounds); a (28,4) sum stays
    # double-exact. Spark's decimal cast rounds HALF_UP while DuckDB's
    # truncates, so the oracle wraps the product in round(x, 4) first.
    disc_price = (d_price * (1 - d_disc)).cast("decimal(18,4)")
    charge = (d_price * (1 - d_disc) * (1 + d_tax)).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d_qty).cast("double").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(d_qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            (F.sum(d_disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "silver_asset_performance",
    oracle=f"""
WITH quotes AS ({_OHLCV_SQL})
SELECT trade_date, ticker,
       {_OPEN_SQL} AS opening_price,
       {_CLOSE_SQL} AS closing_price,
       max(price) AS high_price,
       min(price) AS low_price,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS average_volume
FROM quotes GROUP BY trade_date, ticker
""",
)
def silver_asset_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asset_performance(ohlcv_quotes(load_table(spark, sf_dir, "lineitem")))


@register(
    "silver_market_trend",
    oracle=f"""
WITH quotes AS ({_OHLCV_SQL})
SELECT trade_date,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS total_market_volume,
       CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS market_avg_price,
       max(price) AS market_high,
       min(price) AS market_low,
       COUNT(*) AS n_trades
FROM quotes GROUP BY trade_date
""",
)
def silver_market_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return market_trend(ohlcv_quotes(load_table(spark, sf_dir, "lineitem")))


@register(
    "gold_monthly_summary",
    oracle=f"""
WITH quotes AS ({_OHLCV_SQL}),
silver AS (
  SELECT trade_date, ticker, {_CLOSE_SQL} AS closing_price
  FROM quotes GROUP BY trade_date, ticker
)
SELECT CAST(year(trade_date) AS INTEGER) AS year,
       CAST(month(trade_date) AS INTEGER) AS month,
       ticker,
       CAST(SUM(CAST(closing_price AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS average_roi,
       {exact_std_sql("closing_price")} AS volatility,
       COUNT(*) AS trading_days
FROM silver GROUP BY 1, 2, 3
""",
)
def gold_monthly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    quotes = ohlcv_quotes(load_table(spark, sf_dir, "lineitem"))
    _, closing = _open_close()
    silver = quotes.groupBy("trade_date", "ticker").agg(closing.alias("closing_price"))
    return monthly_summary(silver)
