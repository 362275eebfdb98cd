"""Financial technical indicators over the OHLCV quote stream.

The reference's entire workload is daily OHLCV stock data (5 ticker CSVs,
financial_dl_etl.py:102-108) aggregated into per-day bars
(financial_dl_etl.py:53-58) and monthly summaries — but it stops at
min/max/avg. This module adds the indicator layer an actual quant/analyst
user of that lakehouse would run next, all expressed as window passes over
the same daily-bar frame the silver table holds:

- :func:`vwap_daily` — volume-weighted average price per (day, ticker).
- :func:`sma_crossover` — 5-day vs 20-day simple moving average with a
  golden/dead-cross signal.
- :func:`rsi_14` — 14-day relative strength index (Cutler's simple-average
  form — a pure frame aggregate; Wilder's recursive EMA smoothing is not
  window-expressible and is deliberately not emulated).
- :func:`price_momentum` — 10-day rate-of-change.
- :func:`max_drawdown` — per-ticker maximum peak-to-trough drawdown via a
  running-max window.

Determinism: every aggregate/window sum runs in exact decimal (see
functions/portable.py); the only double arithmetic is a fixed sequence of
IEEE ops applied identically in the DuckDB oracle, so results are bitwise
reproducible across engines, partitionings, and runs.

Scale notes: all windows partition by ticker and order by trade_date. The
sf testdata has 5 synthetic tickers, but a real equities universe is
~10⁴-10⁵ symbols × ~10⁴ daily bars each — the per-symbol window state is
tiny and the partition count is large, so these plans parallelize cleanly
at 100 TB (the expensive part is the upstream bar aggregation, which is a
keyed partial+final hash agg on (trade_date, ticker)). Nothing here adds a
shuffle beyond the one hash exchange on ticker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.operators.aggregates import (
    _OHLCV_SQL,
    ohlcv_quotes,
)
from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

# Shared daily-bar fragment: exact-decimal close / price*volume / volume per
# (trade_date, ticker). `seq` is unique per quote row (aggregates._OHLCV_SQL)
# so arg_max is deterministic.
_BARS_SQL = f"""
WITH quotes AS ({_OHLCV_SQL}),
bars AS (
  SELECT trade_date, ticker,
         CAST(arg_max(price, seq) AS DECIMAL(18,4)) AS close_dec,
         SUM(CAST(price AS DECIMAL(18,4)) * CAST(volume AS DECIMAL(8,4)))
           AS pv_dec,
         SUM(CAST(volume AS DECIMAL(8,4))) AS vol_dec
  FROM quotes GROUP BY trade_date, ticker
)
"""


def daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → one exact-decimal bar per (trade_date, ticker):
    deterministic close plus price*volume and volume sums (the inputs every
    indicator below needs). One keyed hash aggregate."""
    quotes = ohlcv_quotes(load_table(spark, sf_dir, "lineitem"))
    price_d = F.col("price").cast("decimal(18,4)")
    vol_d = F.col("volume").cast("decimal(8,4)")
    return quotes.groupBy("trade_date", "ticker").agg(
        F.max_by("price", "seq").cast("decimal(18,4)").alias("close_dec"),
        F.sum(price_d * vol_d).alias("pv_dec"),
        F.sum(vol_d).alias("vol_dec"),
    )


_W = "PARTITION BY ticker ORDER BY trade_date"


def _w() -> Window:
    return Window.partitionBy("ticker").orderBy("trade_date")


@register(
    "vwap_daily",
    oracle=f"""
{_BARS_SQL}
SELECT trade_date, ticker,
       CAST(close_dec AS DOUBLE) AS close,
       CAST(pv_dec AS DOUBLE) / CAST(vol_dec AS DOUBLE) AS vwap,
       CAST(vol_dec AS DOUBLE) AS total_volume
FROM bars
""",
)
def vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day-per-ticker VWAP — the execution-quality benchmark price.
    Numerator and denominator are exact decimal sums; the single IEEE
    division is the only double op, so the value is bitwise stable."""
    return daily_bars(spark, sf_dir).select(
        "trade_date",
        "ticker",
        F.col("close_dec").cast("double").alias("close"),
        (F.col("pv_dec").cast("double") / F.col("vol_dec").cast("double")).alias(
            "vwap"
        ),
        F.col("vol_dec").cast("double").alias("total_volume"),
    )


@register(
    "sma_crossover",
    oracle=f"""
{_BARS_SQL}
SELECT trade_date, ticker, CAST(close_dec AS DOUBLE) AS close,
       CAST(SUM(close_dec) OVER w5 AS DOUBLE) / COUNT(*) OVER w5 AS sma5,
       CAST(SUM(close_dec) OVER w20 AS DOUBLE) / COUNT(*) OVER w20 AS sma20,
       CASE
         WHEN CAST(SUM(close_dec) OVER w5 AS DOUBLE) / COUNT(*) OVER w5
            > CAST(SUM(close_dec) OVER w20 AS DOUBLE) / COUNT(*) OVER w20
           THEN 'golden'
         WHEN CAST(SUM(close_dec) OVER w5 AS DOUBLE) / COUNT(*) OVER w5
            < CAST(SUM(close_dec) OVER w20 AS DOUBLE) / COUNT(*) OVER w20
           THEN 'dead'
         ELSE 'flat'
       END AS signal
FROM bars
WINDOW w5 AS ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
       w20 AS ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
""",
)
def sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-day vs 20-day simple-moving-average crossover signal. Both SMAs
    are exact-decimal frame sums divided once in doubles; the golden/dead
    comparison therefore compares bitwise-identical values in both
    engines. Warm-up rows average over the shorter available frame (the
    conventional expanding start)."""
    bars = daily_bars(spark, sf_dir)
    w5 = _w().rowsBetween(-4, 0)
    w20 = _w().rowsBetween(-19, 0)
    sma5 = F.sum("close_dec").over(w5).cast("double") / F.count(F.lit(1)).over(w5)
    sma20 = F.sum("close_dec").over(w20).cast("double") / F.count(F.lit(1)).over(w20)
    return bars.select(
        "trade_date",
        "ticker",
        F.col("close_dec").cast("double").alias("close"),
        sma5.alias("sma5"),
        sma20.alias("sma20"),
        F.when(sma5 > sma20, F.lit("golden"))
        .when(sma5 < sma20, F.lit("dead"))
        .otherwise(F.lit("flat"))
        .alias("signal"),
    )


@register(
    "rsi_14",
    oracle=f"""
{_BARS_SQL},
deltas AS (
  SELECT trade_date, ticker, close_dec,
         close_dec - lag(close_dec) OVER ({_W}) AS delta
  FROM bars
),
sums AS (
  SELECT trade_date, ticker, close_dec,
         SUM(CASE WHEN delta > 0 THEN delta ELSE CAST(0 AS DECIMAL(18,4)) END)
           OVER w AS gain_dec,
         SUM(CASE WHEN delta < 0 THEN -delta ELSE CAST(0 AS DECIMAL(18,4)) END)
           OVER w AS loss_dec,
         COUNT(delta) OVER w AS n_deltas
  FROM deltas
  WINDOW w AS ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT trade_date, ticker, CAST(close_dec AS DOUBLE) AS close,
       CASE
         WHEN n_deltas < 14 THEN NULL
         WHEN loss_dec = 0 THEN 100.0
         ELSE 100.0 - 100.0 / (1.0 + CAST(gain_dec AS DOUBLE)
                                     / CAST(loss_dec AS DOUBLE))
       END AS rsi14
FROM sums
""",
)
def rsi_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (Cutler's form: simple averages of gains/losses over the
    trailing 14 day-over-day moves). NULL until a full 14-delta history
    exists; 100 when the frame has no losses. Gain/loss sums stay in exact
    decimal; RS and the final 100−100/(1+RS) are a fixed IEEE sequence."""
    bars = daily_bars(spark, sf_dir)
    w = _w()
    wf = w.rowsBetween(-13, 0)
    zero = F.lit(0).cast("decimal(18,4)")
    deltas = bars.withColumn("delta", F.col("close_dec") - F.lag("close_dec").over(w))
    gain = F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(zero)).over(wf)
    loss = F.sum(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(zero)).over(wf)
    n = F.count("delta").over(wf)
    return deltas.select(
        "trade_date",
        "ticker",
        F.col("close_dec").cast("double").alias("close"),
        F.when(n < 14, F.lit(None).cast("double"))
        .when(loss == 0, F.lit(100.0))
        .otherwise(
            100.0 - 100.0 / (1.0 + gain.cast("double") / loss.cast("double"))
        )
        .alias("rsi14"),
    )


@register(
    "price_momentum",
    oracle=f"""
{_BARS_SQL}
SELECT trade_date, ticker, CAST(close_dec AS DOUBLE) AS close,
       CAST(close_dec - lag(close_dec, 10) OVER ({_W}) AS DOUBLE)
         / CAST(lag(close_dec, 10) OVER ({_W}) AS DOUBLE) AS roc10
FROM bars
""",
)
def price_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-day rate of change ((close − close₋₁₀)/close₋₁₀); NULL during
    warm-up (lag propagates NULL). The subtraction happens in exact decimal,
    then one conversion and one division in doubles."""
    bars = daily_bars(spark, sf_dir)
    prev = F.lag("close_dec", 10).over(_w())
    return bars.select(
        "trade_date",
        "ticker",
        F.col("close_dec").cast("double").alias("close"),
        ((F.col("close_dec") - prev).cast("double") / prev.cast("double")).alias(
            "roc10"
        ),
    )


@register(
    "max_drawdown",
    oracle=f"""
{_BARS_SQL},
dd AS (
  SELECT ticker,
         CAST(max(close_dec) OVER w - close_dec AS DOUBLE)
           / CAST(max(close_dec) OVER w AS DOUBLE) AS drawdown
  FROM bars
  WINDOW w AS ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT ticker, max(drawdown) AS max_drawdown,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM dd GROUP BY ticker
""",
)
def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ticker maximum peak-to-trough drawdown: running max of close
    (exact decimal), per-row drawdown ratio in doubles, then MAX — which is
    order-insensitive, so the aggregate stays bitwise stable. One window
    pass + one tiny hash agg, both on the ticker exchange."""
    bars = daily_bars(spark, sf_dir)
    w = _w().rowsBetween(Window.unboundedPreceding, 0)
    peak = F.max("close_dec").over(w)
    dd = (peak - F.col("close_dec")).cast("double") / peak.cast("double")
    return (
        bars.select("ticker", dd.alias("drawdown"))
        .groupBy("ticker")
        .agg(
            F.max("drawdown").alias("max_drawdown"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )


TREND_WINDOW = 14  # days


@register(
    "rolling_trend_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
idx AS (
  SELECT day, cents,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS x
  FROM daily
),
mo AS (
  SELECT day, x, cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         SUM(x) OVER w AS sx,
         SUM(cents) OVER w AS sy,
         SUM(x * x) OVER w AS sxx,
         SUM(x * cents) OVER w AS sxy
  FROM idx
  WINDOW w AS (ORDER BY x ROWS BETWEEN {TREND_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT day, n,
       CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
            END AS slope_cents_per_day
FROM mo
""",
)
def rolling_trend_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 14-day OLS trend of daily revenue: the regression slope over
    a sliding window, recomputed for every day — the streaming-dashboard
    "is revenue trending up" panel.

    The rolling-regression trick: keep the four cross-moments (Σx, Σy,
    Σx², Σxy) as WINDOW sums of exact integers (revenue in cents, day
    index from row_number), then the slope is one ratio of exact integers
    per row — ``(n·Σxy − Σx·Σy)/(n·Σxx − Σx²)`` — evaluated as a single
    IEEE division. Nothing float accumulates, so the rolling fit is
    bitwise reproducible (the same posture as the distributed OLS in
    ``ols_price_on_quantity``, specialized to window frames). The ordered
    pass runs over the pre-aggregated daily series (~|days| rows), same
    bounded single-partition tail as the other curve operators."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).alias("cents")
    )
    idx = daily.select(
        "day",
        "cents",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("x"),
    )
    w = Window.orderBy("x").rowsBetween(-(TREND_WINDOW - 1), 0)
    # moments ride decimal(38,0): x·cents alone nears int64 at planetary
    # revenue volumes, and Spark's ANSI mode would error where DuckDB
    # silently promotes to HUGEINT — widening keeps both engines on the
    # same exact integers
    d38 = "decimal(38,0)"
    mo = idx.select(
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(d38)).over(w).alias("sx"),
        F.sum(F.col("cents").cast(d38)).over(w).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).over(w).alias("sxx"),
        F.sum((F.col("x") * F.col("cents")).cast(d38)).over(w).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return mo.select(
        "day",
        "n",
        F.when(
            (F.col("n") >= 2) & (den != 0), num.cast("double") / den.cast("double")
        ).alias("slope_cents_per_day"),
    )


@register(
    "revenue_autocorr_lag1",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT cents AS y,
         lag(cents) OVER (ORDER BY day) AS x
  FROM daily
),
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM lagged WHERE x IS NOT NULL
)
SELECT n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS autocorr_lag1
FROM mo WHERE n >= 2
""",
)
def revenue_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily revenue — the "is today predictive of
    tomorrow" statistic that decides whether a forecast model is worth
    building. Pearson r over (yesterday, today) pairs with every moment an
    EXACT integer sum (cents; map-side-combinable decimal aggregates), so
    the final r is one fixed IEEE expression over exact integers — bitwise
    cross-engine, any partitioning (the same posture as
    ``corr_price_quantity``, composed with a window lag).

    Caveat the docstring owns: each exact moment (n·Σxy ≈ days·cents²)
    needs decimal(38) headroom, provided by the quantized-cents scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).alias("cents")
    )
    lagged = daily.select(
        F.col("cents").alias("y"),
        F.lag("cents").over(Window.orderBy("day")).alias("x"),
    ).filter(F.col("x").isNotNull())
    d38 = "decimal(38,0)"
    mo = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    r = (nd * sxy - sx * sy) / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
    return mo.filter(F.col("n") >= 2).select("n", r.alias("autocorr_lag1"))


@register(
    "weekday_seasonality",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
dow AS (
  SELECT CAST(dayofweek(day) + 1 AS INTEGER) AS weekday,
         CAST(count(*) AS BIGINT) AS n_days,
         SUM(cents) AS total_cents
  FROM daily GROUP BY 1
),
total AS (SELECT SUM(total_cents) AS all_cents, SUM(n_days) AS all_days FROM dow)
SELECT weekday, n_days,
       CAST(total_cents AS DOUBLE) / n_days AS mean_daily_cents,
       (CAST(total_cents AS DOUBLE) / n_days)
         / (CAST(all_cents AS DOUBLE) / all_days) AS seasonal_index
FROM dow, total
""",
)
def weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile of revenue: mean daily revenue per
    weekday and its seasonal index (ratio to the overall daily mean) —
    the decomposition step before any de-seasonalized trend or anomaly
    model. Day-of-week numbering is an engine trap: Spark ``dayofweek``
    is 1=Sunday, DuckDB's is 0=Sunday — the oracle pins the 1-based
    convention explicitly (``dayofweek(day) + 1``). Exact
    integer cents throughout; each output number is one or two IEEE
    divisions of exact integers. The 7-row profile broadcasts back onto
    the daily series for residuals at scale."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).alias("cents")
    )
    dow = daily.groupBy(F.dayofweek("day").alias("weekday")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cents").alias("total_cents"),
    )
    total = dow.agg(
        F.sum("total_cents").alias("all_cents"), F.sum("n_days").alias("all_days")
    )
    mean_daily = F.col("total_cents").cast("double") / F.col("n_days")
    overall = F.col("all_cents").cast("double") / F.col("all_days")
    return dow.crossJoin(F.broadcast(total)).select(
        "weekday",
        "n_days",
        mean_daily.alias("mean_daily_cents"),
        (mean_daily / overall).alias("seasonal_index"),
    )


@register(
    "ewma_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
),
packed AS (
  SELECT list(order_date ORDER BY order_date) AS dates,
         list(revenue ORDER BY order_date) AS vals
  FROM daily
)
SELECT dates[i] AS order_date,
       vals[i] AS revenue,
       list_reduce(vals[1:i], (acc, x) -> acc * CAST(0.5 AS DOUBLE) + x)
         AS ewma
FROM packed,
     LATERAL (SELECT unnest(generate_series(1, len(vals))) AS i) u
""",
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted daily revenue, α = 1/2: the one smoothing
    constant whose every weight is a power of two, making EWMA — normally
    the poster child for float drift — bitwise reproducible across
    engines: each fold step is ``acc·0.5 + v`` where the halving is an
    exact exponent decrement and the add is one correctly-rounded IEEE
    op in a FIXED left-to-right order (Spark ``aggregate`` and DuckDB
    ``list_reduce`` both fold left).

    A running fold is inherently sequential, so it must never see raw
    fact rows: the heavy input is first reduced to one row per day by a
    partitioned exact-decimal aggregate, and only the calendar-bounded
    daily series (~2.4k rows here, ≤ days-in-history at ANY scale) is
    collected into the ordered fold — the same bounded-frame argument as
    the other day-grain windows. The per-row ``slice`` re-fold is
    O(days²) lambda steps on that bounded frame, a deliberate trade for
    cross-engine determinism over a windowed float sum that would
    reproduce on neither engine."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("order_date")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("revenue"))
    return ewma_halving(daily)


def ewma_halving(daily: DataFrame) -> DataFrame:
    """α=1/2 EWMA core over a (order_date, revenue) day frame — see
    :func:`ewma_daily_revenue`; property-tested against a sequential
    Python fold in ``tests/test_properties.py``."""
    packed = daily.agg(
        F.array_sort(
            F.collect_list(F.struct("order_date", "revenue"))
        ).alias("a")
    ).select(
        F.transform("a", lambda x: x["order_date"]).alias("dates"),
        F.transform("a", lambda x: x["revenue"]).alias("vals"),
    )
    row = packed.select(
        "dates", "vals", F.posexplode("dates").alias("pos", "order_date")
    )
    return row.select(
        "order_date",
        F.element_at("vals", F.col("pos") + 1).alias("revenue"),
        F.aggregate(
            F.slice("vals", 1, F.col("pos") + 1),
            F.lit(0.0),
            lambda acc, x: acc * F.lit(0.5) + x,
        ).alias("ewma"),
    )
