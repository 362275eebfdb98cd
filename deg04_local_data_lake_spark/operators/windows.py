"""Window functions / top-k / sessionization (SURVEY.md §2.7).

The reference never imports ``Window`` — but its silver ``first/last``
semantics are only well-defined through an ordering, and the north-star
dedup/similarity ops need rank/top-k. These operators supply that surface.

Every window here partitions on a key with bounded group size (customer,
user, day), so the shuffle is a single hash exchange and state per group is
small. Sorting happens within partitions only (no global sort). Ordering
keys always end in a unique tiebreaker column — a window over a non-total
order is the same nondeterminism bug as the reference's ``first/last``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.operators.aggregates import _OHLCV_SQL
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table


def top_k_per_group(
    df: DataFrame, partition: list[str], order: list, k: int, rank_col: str = "rn"
) -> DataFrame:
    """Generic top-k: ``row_number`` over a total order, filter ≤ k.

    Spark executes this without materializing full sorted groups when k is
    small (rank filter pushes a per-partition limit); for extreme skew,
    pre-aggregate a per-partition top-k first (map-side) — not needed at
    the reference's group sizes.
    """
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


@register(
    "window_topk_orders",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (orderkey tiebreak → total order)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


@register(
    "window_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT order_date, revenue,
       lag(revenue) OVER (ORDER BY order_date) AS prev_revenue,
       CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER (
         ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
       / CAST(COUNT(*) OVER (
         ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
       AS ma7_revenue
FROM daily
""",
)
def window_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + 7-row moving average over the daily revenue series.

    NB: the outer window is unpartitioned — fine here because the *daily*
    series is tiny (one row per date) after the pre-aggregation; the heavy
    lifting happened in the partitioned hash-agg. Never run an
    unpartitioned window over raw fact rows at scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("order_date")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("revenue"))
    w = Window.orderBy("order_date")
    wf = w.rowsBetween(-6, 0)
    return daily.select(
        "order_date",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (
            F.sum(dec("revenue")).over(wf).cast("double")
            / F.count(F.lit(1)).over(wf).cast("bigint")
        ).alias("ma7_revenue"),
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization as a relational window program: a session
    starts when the gap to the previous event of the same user exceeds
    ``gap_minutes``; session ids are a running sum of session starts.

    This is the batch twin of the streaming session-window operator
    (streaming/ingest.py): one shuffle on user, two window passes over the
    same partitioning (Spark reuses the exchange).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # microsecond-integer timestamps: exact gap arithmetic in both engines
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_ok = (us - F.lag(us).over(w)) <= gap_minutes * 60 * 1_000_000
    is_new = F.when(gap_ok, F.lit(0)).otherwise(F.lit(1))
    return events.withColumn("session_seq", F.sum(is_new).over(w).cast("bigint"))


@register(
    "events_sessionize",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000000
              THEN 0 ELSE 1 END AS is_new
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS session_seq
FROM gaps
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize(events).select("user_id", "event_id", "session_seq")


@register(
    "events_rollup_cascade",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: minute → hour → day, each level
    re-aggregating the previous level's partials (counts sum, decimal sums
    sum — associativity is what makes continuous aggregates valid). The
    oracle aggregates raw rows directly, so the test IS the proof that the
    cascade loses nothing. At scale each level is a materialized rollup
    table ~60× smaller than the last; queries hit the coarsest level that
    answers them."""
    events = load_table(spark, sf_dir, "events")
    minute = events.groupBy(
        F.window("ts", "1 minute").getField("start").alias("minute"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).alias("sum_value"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "minute").alias("hour"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
    )
    return (
        hour.groupBy(F.date_trunc("day", "hour").cast("date").alias("day"), "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").cast("double").alias("total_value"),
        )
    )


@register(
    "fill_missing_days",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
),
bounds AS (SELECT min(order_date) AS lo, max(order_date) AS hi FROM daily),
calendar AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS order_date
  FROM bounds
)
SELECT c.order_date,
       coalesce(d.revenue, 0.0) AS revenue,
       d.revenue IS NULL AS was_missing
FROM calendar c LEFT JOIN daily d USING (order_date)
""",
)
def fill_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: build the full calendar between min and max
    date with ``sequence`` + explode, left-join the observed series, zero-
    fill gaps. The calendar generation is one row → |days| explode (tiny);
    the join broadcasts the calendar — the observed series never shuffles.
    The standard prelude to window features over regular time series.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("order_date")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("revenue"))
    calendar = (
        daily.agg(F.min("order_date").alias("lo"), F.max("order_date").alias("hi"))
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias(
                "order_date"
            )
        )
    )
    return (
        F.broadcast(calendar)
        .join(daily, "order_date", "left")
        .select(
            "order_date",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.col("revenue").isNull().alias("was_missing"),
        )
    )


@register(
    "events_hourly_counts",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
)
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate in batch — the semantic spec for the
    Structured Streaming twin (streaming/ingest.py ``stream_hourly_counts``
    runs the same plan over ``readStream`` with a watermark)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


BOLL_WINDOW = 5  # trading days


@register(
    "bollinger_bands",
    oracle=f"""
WITH quotes AS ({_OHLCV_SQL}),
silver AS (
  SELECT trade_date, ticker, arg_max(price, seq) AS closing_price
  FROM quotes GROUP BY trade_date, ticker
),
q AS (
  SELECT trade_date, ticker,
         CAST(CAST(closing_price AS DECIMAL(18,4)) * 10000 AS BIGINT) AS qd
  FROM silver
),
w AS (
  SELECT trade_date, ticker, qd,
         COUNT(*) OVER win AS n,
         CAST(SUM(qd) OVER win AS BIGINT) AS s1,
         CAST(SUM(qd * qd) OVER win AS BIGINT) AS s2
  FROM q
  WINDOW win AS (PARTITION BY ticker ORDER BY trade_date
                 ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT trade_date, ticker,
       qd / 10000.0 AS closing_price,
       (CAST(s1 AS DOUBLE) / n) / 10000.0 AS ma,
       CASE WHEN n > 1 THEN
         sqrt(CAST(CAST(n AS DECIMAL(10,0)) * CAST(s2 AS DECIMAL(28,0))
                   - CAST(s1 AS DECIMAL(19,0)) * CAST(s1 AS DECIMAL(19,0))
              AS VARCHAR)::DOUBLE / (n * (n - 1))) / 10000.0
       END AS sd,
       CASE WHEN n > 1 THEN
         (CAST(s1 AS DOUBLE) / n) / 10000.0
         + 2.0 * (sqrt(CAST(CAST(n AS DECIMAL(10,0)) * CAST(s2 AS DECIMAL(28,0))
                   - CAST(s1 AS DECIMAL(19,0)) * CAST(s1 AS DECIMAL(19,0))
              AS VARCHAR)::DOUBLE / (n * (n - 1))) / 10000.0)
       END AS upper_band
FROM w
""",
)
def bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the silver closing-price series: 5-day moving
    average ± 2 sample standard deviations per ticker — the windowed form
    of the gold volatility aggregate, and the classic finance overlay the
    reference's OHLCV domain implies.

    The stddev uses the same cancellation-free integer power sums as
    ``exact_std`` (functions/portable.py), but composed as window sums
    (``SUM(q) OVER``, ``SUM(q²) OVER``) so every value is exact until one
    final sqrt/division — bitwise equal across engines. One shuffle for
    the silver aggregate; the window reuses the ticker partitioning."""
    from deg04_local_data_lake_spark.operators.aggregates import (
        _open_close,
        ohlcv_quotes,
    )

    quotes = ohlcv_quotes(load_table(spark, sf_dir, "lineitem"))
    _, closing = _open_close()
    silver = quotes.groupBy("trade_date", "ticker").agg(
        closing.alias("closing_price")
    )
    qd = (F.col("closing_price").cast("decimal(18,4)") * 10000).cast("long")
    q = silver.select("trade_date", "ticker", qd.alias("qd"))
    win = (
        Window.partitionBy("ticker")
        .orderBy("trade_date")
        .rowsBetween(-(BOLL_WINDOW - 1), Window.currentRow)
    )
    n = F.count(F.lit(1)).over(win)
    s1 = F.sum("qd").over(win).cast("bigint")
    s2 = F.sum(F.col("qd") * F.col("qd")).over(win).cast("bigint")
    num = (
        n.cast("decimal(10,0)") * s2.cast("decimal(28,0)")
        - s1.cast("decimal(19,0)") * s1.cast("decimal(19,0)")
    )
    sd = F.when(
        n > 1, F.sqrt(num.cast("double") / (n * (n - 1))) / 10000.0
    )
    ma = (s1.cast("double") / n) / 10000.0
    return q.select(
        "trade_date",
        "ticker",
        (F.col("qd") / 10000.0).alias("closing_price"),
        ma.alias("ma"),
        sd.alias("sd"),
        F.when(n > 1, ma + 2.0 * sd).alias("upper_band"),
    )


@register(
    "forward_fill_values",
    oracle="""
WITH sparse AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'purchase'
              THEN CAST(value AS DECIMAL(18,4)) END AS pv
  FROM events
)
SELECT user_id, ts, event_id, event_type,
       CAST(last_value(pv IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS last_purchase_value,
       CAST(count(pv) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_purchases_so_far
FROM sparse
""",
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF — last observation carried forward): every event
    row carries the most recent purchase value of the same user (NULL until
    the first purchase). The sparse "observation" column is synthesized by
    nulling non-purchase rows, then ``last_value(..., ignorenulls=True)``
    over the running frame repairs the gaps — the canonical time-series
    sensor-gap / slowly-changing-attribute repair, one window pass on the
    user exchange (same shape as the SCD2 build). Values ride exact
    decimal; the fill chooses an existing value, so no arithmetic at all."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pv = F.when(
        F.col("event_type") == "purchase", F.col("value").cast("decimal(18,4)")
    )
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(pv, ignorenulls=True).over(w).cast("double").alias("last_purchase_value"),
        F.count(pv).over(w).alias("n_purchases_so_far"),
    )


@register(
    "events_hopping_counts",
    oracle="""
WITH slotted AS (
  SELECT epoch_us(ts) // 900000000 AS slot, event_type, value FROM events
),
expanded AS (
  SELECT make_timestamp((s.slot - k.k) * 900000000) AS window_start,
         s.event_type, s.value
  FROM slotted s
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM expanded GROUP BY 1, 2
""",
)
def events_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregate: 1-hour windows advancing every
    15 minutes, so each event contributes to exactly 4 overlapping windows.
    ``F.window(ts, "1 hour", "15 minutes")`` expands the row 4× *before*
    the shuffle — the write amplification is the slide ratio, which is why
    production rollups keep window/slide small (4× here) and derive longer
    horizons by re-aggregating stored 15-minute panes (see
    ``events_rollup_cascade``) instead of sliding a wide window directly.
    The oracle reconstructs Spark's epoch-aligned window semantics
    explicitly: an event in 15-minute slot s belongs to windows starting at
    slots s-3..s. Batch twin of the streaming hopping-window rollup."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.window("ts", "1 hour", "15 minutes").getField("start").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@register(
    "rolling_distinct_users",
    oracle="""
WITH pairs AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
days AS (SELECT DISTINCT day FROM pairs),
expanded AS (
  SELECT user_id, day AS active_day,
         CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY))
              AS DATE) AS window_day
  FROM pairs
)
SELECT e.window_day AS day,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users_7d,
       CAST(COUNT(DISTINCT CASE WHEN e.active_day = e.window_day
                                THEN e.user_id END) AS BIGINT) AS users_1d
FROM expanded e JOIN days d ON d.day = e.window_day
GROUP BY 1
""",
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling distinct active users (the DAU/WAU panel).

    Sliding distinct counts don't decompose into window frames (distinct is
    not subtractable), so the scalable exact form is bounded expansion:
    each (user, active day) pair — already deduplicated, so ∝ users×days,
    not events — is replicated onto the ≤7 window days it can serve, then
    one distinct-count aggregate per window day. The fan-out factor IS the
    window length, fixed and small; the trailing semi-join against observed
    days (broadcast — it's just the calendar) trims phantom windows past
    the series end. At 100 TB the alternative people reach for —
    ``approx_count_distinct`` over a RANGE frame — gives up exactness;
    this stays exact with one extra shuffle."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = pairs.select(F.col("day").alias("window_day")).distinct()
    expanded = pairs.select(
        "user_id",
        F.col("day").alias("active_day"),
        F.explode(
            F.sequence("day", F.date_add("day", 6), F.expr("INTERVAL 1 DAY"))
        ).alias("window_day"),
    )
    return (
        expanded.join(F.broadcast(days), "window_day")
        .groupBy(F.col("window_day").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("users_7d"),
            F.count_distinct(
                F.when(F.col("active_day") == F.col("window_day"), F.col("user_id"))
            ).alias("users_1d"),
        )
    )


BURST_FACTOR = 3  # rate > 3x trailing mean flags a burst


@register(
    "events_burst_detection",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
trail AS (
  SELECT hour, n,
         SUM(n) OVER (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
           AS trail_n,
         CAST(COUNT(*) OVER (ORDER BY hour
                             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS trail_hours
  FROM hourly
)
SELECT hour, n,
       CAST(trail_n AS BIGINT) AS trail_n, trail_hours,
       CAST(n AS DOUBLE) / (CAST(trail_n AS DOUBLE) / trail_hours) AS burst_ratio,
       n * trail_hours > {BURST_FACTOR} * trail_n AS exceeds_threshold
FROM (SELECT *, row_number() OVER (ORDER BY CAST(n AS DOUBLE) * trail_hours
                                            / trail_n DESC, hour) AS rn
      FROM trail WHERE trail_hours >= 6)
WHERE rn <= 10
""",
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection over the event stream: the 10 hours most elevated
    above their trailing-24h hourly mean (≥6 hours of history required),
    each flagged against the BURST_FACTOR (3×) alert threshold — the
    incident-detection / trending-topic primitive. Top-N (rather than
    threshold-only output) keeps the panel informative on calm corpora
    like the uniform test data, where nothing trips 3×.

    The threshold flag is cross-multiplied into pure integers
    (``n·trail_hours > k·trail_n``) so the alert decision never touches a
    float; the ranking ratio is the identical IEEE expression in both
    engines. Hourly pre-aggregate first (distributed, map-side combine),
    then one ordered pass over ~|hours| rows — the bounded
    single-partition tail again."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.orderBy("hour").rowsBetween(-24, -1)
    trail = hourly.select(
        "hour",
        "n",
        F.sum("n").over(wt).alias("trail_n"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("trail_hours"),
    )
    rank_key = (
        F.col("n").cast("double") * F.col("trail_hours") / F.col("trail_n")
    )
    pick = Window.orderBy(rank_key.desc(), "hour")
    return (
        trail.filter(F.col("trail_hours") >= 6)
        .withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") <= 10)
        .select(
            "hour",
            "n",
            F.col("trail_n").cast("bigint").alias("trail_n"),
            "trail_hours",
            (
                F.col("n").cast("double")
                / (F.col("trail_n").cast("double") / F.col("trail_hours"))
            ).alias("burst_ratio"),
            (
                F.col("n") * F.col("trail_hours")
                > BURST_FACTOR * F.col("trail_n")
            ).alias("exceeds_threshold"),
        )
    )


@register(
    "events_dow_hour_heatmap",
    oracle="""
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS weekday,
       CAST(hour(ts) AS INTEGER) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
""",
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap (events + distinct
    users per cell) — the load-shape panel behind capacity planning and
    send-time optimization. ≤168 cells, collapses map-side; the weekday
    key uses the same pinned 1=Sunday convention as
    ``weekday_seasonality`` (Spark is 1-based, DuckDB 0-based)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("weekday"),
        F.hour("ts").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "topk_with_ties_orders",
    oracle="""
SELECT c_mktsegment, o_totalprice, price_rank
FROM (
  SELECT c_mktsegment, o_totalprice,
         CAST(dense_rank() OVER (PARTITION BY c_mktsegment
                                 ORDER BY o_totalprice DESC) AS BIGINT)
           AS price_rank
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE price_rank <= 3
""",
)
def topk_with_ties_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 order prices per market segment WITH ties — ``dense_rank``
    keeps every order at a winning price, where ``row_number``
    (``window_topk_orders``) would arbitrarily cut tied rows. The pair of
    queries pins the tie-semantics choice users actually have to make;
    output is deterministic without a tiebreak column precisely because
    ties are kept. Same one-exchange rank shape."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc())
    return (
        joined.select(
            "c_mktsegment",
            "o_totalprice",
            F.dense_rank().over(w).cast("bigint").alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )
