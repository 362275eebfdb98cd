"""Ordered-sequence analytics: streaks, interval algebra, attribution.

The reference has no ordering anywhere (SURVEY.md §2.7); these are the
event-sequence operators its `events`-shaped workloads would need next.
All are single-window-pass shapes: the FACT table shuffles once on
`user_id`, then per-partition sorted scans compute every derived sequence
statistic (islands, merged intervals, carried-forward attribution state)
inside that partitioning — hashpartitioning(user_id) satisfies any
(user_id, ...) grouping, so windows and island aggregates stack
exchange-free. Where a final cross-entity rollup exists (channel totals,
duration buckets), it re-shuffles only the already-reduced rows; the
per-query budget is pinned in tests/test_plans.py
(`_SEQUENCE_SHUFFLE_BUDGET`). Window ordering is always `(ts, event_id)`
so ties cannot flap the result across runs/engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.operators import rankdist
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table


@register(
    "activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
islands AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS streak_days,
         min(day) AS streak_start, max(day) AS streak_end
  FROM islands GROUP BY user_id, anchor
)
SELECT user_id, streak_days, streak_start, streak_end
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY streak_days DESC, streak_start) AS rn
      FROM streaks)
WHERE rn = 1
""",
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-islands).

    The classic trick: within a user, consecutive days all share the same
    ``day - row_number()`` anchor, so one window pass + one aggregate finds
    every island — no self-join, no iteration. Plan: distinct is a partial
    aggregate pushed before the shuffle (days-per-user ≪ events-per-user),
    then everything stays inside the `user_id` partitioning. Earliest
    streak wins length ties, keeping the answer deterministic.
    """
    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn("anchor", F.date_sub("day", F.row_number().over(w)))
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), "streak_start"
    )
    return (
        streaks.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start", "streak_end")
    )


def merge_intervals(
    iv: DataFrame,
    user_col: str = "user_id",
    s_col: str = "s",
    e_col: str = "e",
    id_col: str = "event_id",
) -> DataFrame:
    """(entity, start, end, id) intervals → merged islands per entity:
    (entity, island, m_start, m_end, n_events). Running-max-end sweep; one
    shuffle on the entity key, two stacked windows over one sort."""
    sweep = (
        Window.partitionBy(user_col)
        .orderBy(s_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        user_col,
        s_col,
        e_col,
        id_col,
        F.when(F.max(e_col).over(sweep) >= F.col(s_col), F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_new"),
    )
    # the accumulator MUST replay the sweep's exact total order — ordering
    # by (s, e) instead diverges when a longer interval precedes a shorter
    # one at the same start (hypothesis found [(0,2),(0,1)]: the sweep
    # marks the e=2 row as the island opener, but (s,e) order visits the
    # e=1 row first and splits the island)
    acc = (
        Window.partitionBy(user_col)
        .orderBy(s_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(acc))
    return islands.groupBy(user_col, "island").agg(
        F.min(s_col).alias("m_start"),
        F.max(e_col).alias("m_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "merge_event_intervals",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
),
flagged AS (
  SELECT user_id, s, e, event_id,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   >= s
              THEN 0 ELSE 1 END AS is_new
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, min(s) AS m_start, max(e) AS m_end,
         CAST(count(*) AS BIGINT) AS n_events
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(SUM(date_diff('microsecond', m_start, m_end)) AS BIGINT) AS covered_us,
       CAST(max(n_events) AS BIGINT) AS busiest_interval_events
FROM merged GROUP BY user_id
""",
)
def merge_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping activity intervals (each event opens a 30-minute
    window) per user; report merged-interval count, exact covered
    microseconds, and the busiest merged interval. (Microsecond granularity
    because cross-engine second-diff semantics differ: DuckDB `date_diff`
    counts boundary crossings, Spark `timestampdiff` floors elapsed time —
    at the native precision both are the exact integer difference.)

    Interval union via the running-max-end sweep: an interval starts a new
    merged island iff its start exceeds the max end seen so far — one
    window pass, no self-join (the naive overlap join is O(n²) per user and
    unbounded at 100 TB). Coverage is integer microseconds (exact in both
    engines). Both stacked windows replay the identical
    `(user_id, s, event_id)` total order (correctness requires it — see
    merge_intervals — and it also lets Spark plan a single Sort + two
    Window nodes, one shuffle total).
    """
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    return merge_intervals(iv).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.expr("timestampdiff(MICROSECOND, m_start, m_end)")).alias(
            "covered_us"
        ),
        F.max("n_events").alias("busiest_interval_events"),
    )


@register(
    "attribution_last_touch",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_type, value, ts, event_id,
         last_value(CASE WHEN event_type IN ('click','view','signup')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS conversions,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS attributed_value
FROM tagged
WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    most recent prior click/view/signup by the same user ('direct' when
    none), with exact-decimal value sums per channel.

    Carried-forward state via ``last(..., ignorenulls=True)`` over the
    user's timeline — the declarative form of "remember the last marketing
    event"; no per-user loop, no as-of self-join. The purchase filter CANNOT
    be pushed below the window (earlier marketing rows feed the state), so
    the plan is scan → one user_id shuffle → window → filter → tiny
    channel aggregate; the final groupBy is over ≤5 channels and collapses
    map-side.
    """
    touch = F.when(
        F.col("event_type").isin("click", "view", "signup"), F.col("event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("channel"),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.sum(dec("value")).cast("double").alias("attributed_value"),
        )
    )


@register(
    "sessionized_conversion",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000000
              THEN 0 ELSE 1 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
  FROM gaps
),
ranked AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS rn
  FROM sessions
),
per_session AS (
  SELECT user_id, session_seq,
         max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         CAST(count(*) AS BIGINT) AS n_events
  FROM ranked GROUP BY 1, 2
)
SELECT entry_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS conversion_rate,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM per_session GROUP BY 1
""",
)
def sessionized_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level conversion funnel: gap-sessionize (30 min), credit each
    session to its entry event type, and measure what fraction of sessions
    reach a purchase — the product-analytics "which landing behavior
    converts" question.

    Builds on the shared ``sessionize`` window program: the session tag,
    the per-session entry pick (row_number = 1), and the converted flag all
    run inside the single ``user_id`` exchange (the per-session groupBy
    keys are a superset prefix-hash of the window partitioning at 100 TB —
    AQE keeps it local); the final channel aggregate is ≤ |event types|
    rows and collapses map-side. The conversion ratio is a single IEEE
    division of two exact counts, so it is bitwise identical cross-engine.
    """
    from deg04_local_data_lake_spark.operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev)
    w = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    per_session = (
        s.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id", "session_seq")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("entry_type"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return per_session.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (
            F.sum("converted").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
        F.sum("n_events").cast("bigint").alias("total_events"),
    )


@register(
    "interpolate_linear_gaps",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,4))) AS spend
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
j AS (
  SELECT g.user_id, g.day, d.spend
  FROM grid g LEFT JOIN daily d USING (user_id, day)
),
state AS (
  SELECT user_id, day, spend,
    last_value(spend IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING) AS pv,
    last_value(CASE WHEN spend IS NOT NULL THEN day END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd,
    first_value(spend IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY day
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN spend IS NOT NULL THEN day END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY day
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM j
)
SELECT user_id, day,
       CAST(date_diff('day', pd, nd) AS BIGINT) AS gap_days,
       CAST(pv AS DOUBLE)
         + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
           * (CAST(date_diff('day', pd, day) AS DOUBLE)
              / CAST(date_diff('day', pd, nd) AS DOUBLE)) AS interp_spend
FROM state WHERE spend IS NULL
""",
)
def interpolate_linear_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap repair: each user's daily purchase spend is
    densified to a full per-user calendar, and missing days get the
    straight-line value between the surrounding observations — the
    numeric-series complement of LOCF (``forward_fill_values``), e.g. for
    sensor series or balance curves.

    Shape: exact-decimal daily aggregate → per-user calendar via
    ``sequence``+``explode`` (rows ∝ user span, not events) → one
    ``user_id`` window pass carrying (prev value, prev day, next value,
    next day) via ignorenulls last/first over mirrored frames. At 100 TB
    the grid join and all four window columns share the same ``user_id``
    hash partitioning — one shuffle of the *daily* (already ~1000× reduced)
    series. Interpolation arithmetic is the identical IEEE expression tree
    in both engines over exact-decimal endpoints and integer day offsets,
    so results are bitwise reproducible.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(dec("value")).alias("spend"))
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    wp = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("spend").isNotNull(), F.col("day"))
    state = j.select(
        "user_id",
        "day",
        "spend",
        F.last("spend", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("spend", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
    )
    pvd = F.col("pv").cast("double")
    nvd = F.col("nv").cast("double")
    frac = F.datediff("day", "pd").cast("double") / F.datediff("nd", "pd").cast(
        "double"
    )
    return state.filter(F.col("spend").isNull()).select(
        "user_id",
        "day",
        F.datediff("nd", "pd").cast("bigint").alias("gap_days"),
        (pvd + (nvd - pvd) * frac).alias("interp_spend"),
    )


@register(
    "open_orders_per_day",
    oracle="""
WITH span AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
         max(CAST(l_shipdate AS DATE)) AS e
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
  HAVING max(CAST(l_shipdate AS DATE)) > CAST(o_orderdate AS DATE)
),
deltas AS (
  SELECT s AS day, CAST(1 AS BIGINT) AS delta FROM span
  UNION ALL
  SELECT e AS day, CAST(-1 AS BIGINT) AS delta FROM span
),
daily AS (SELECT day, SUM(delta) AS net FROM deltas GROUP BY 1)
SELECT day, CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS open_orders
FROM daily
""",
)
def open_orders_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-concurrency sweep: how many orders are open — placed but
    not yet fully shipped — on each day. The classic
    max-concurrent-intervals / work-in-progress query, over intervals
    derived from a fact join (order date → last lineitem ship date).

    Each interval becomes a +1 at its start and a −1 at its end; a
    pre-aggregate collapses the deltas to one net number per day (the step
    that makes the scan side distribute — billions of intervals reduce to
    ~|distinct days| rows before any ordered work), and a running sum over
    that tiny daily series yields the concurrency curve. Only the final
    window runs on a single partition, and it sees thousands of rows at
    any corpus size, by construction. Zero-length intervals are excluded
    up front so every +1 has a later −1."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("s"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("e"))
        .filter(F.col("e") > F.col("s"))
    )
    deltas = span.select(
        F.col("s").alias("day"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        span.select(F.col("e").alias("day"), F.lit(-1).cast("bigint").alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    acc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", F.sum("net").over(acc).cast("bigint").alias("open_orders")
    )


@register(
    "time_to_conversion",
    oracle="""
WITH fs AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id) AS first_signup
  FROM events
),
conv AS (
  SELECT user_id,
         min(first_signup) AS first_signup,
         min(ts) AS first_purchase
  FROM fs
  WHERE event_type = 'purchase' AND first_signup IS NOT NULL
        AND ts >= first_signup
  GROUP BY user_id
),
deltas AS (
  SELECT user_id,
         epoch_us(first_purchase) - epoch_us(first_signup) AS delta_us
  FROM conv
),
ranked AS (
  SELECT delta_us,
         row_number() OVER (ORDER BY delta_us, user_id) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM deltas
)
SELECT n AS n_converted,
       max(CASE WHEN rn = (n + 1) // 2 THEN delta_us END) AS median_us,
       max(CASE WHEN rn = greatest(1, CAST(ceil(0.90 * n) AS BIGINT))
                THEN delta_us END) AS p90_us
FROM ranked GROUP BY n
""",
)
def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup → first-purchase latency: for every user whose first purchase
    follows their first signup, the exact microsecond delta; reported as
    converted-user count with discrete median and p90 — the activation
    metric of product analytics.

    One ``user_id`` window pins each user's first signup on every row, the
    purchase filter + min-aggregate reuse that partitioning (no second
    exchange), and deltas are integer microseconds — no float time math.
    The final rank selection runs over one row per *converted user* —
    a ~10⁵× reduction from events — via the distributed bucketed rank
    pass (``rankdist``), so even a billion converted users never sort on
    one task."""
    ev = load_table(spark, sf_dir, "events")
    ws = Window.partitionBy("user_id")
    fs = ev.withColumn(
        "first_signup",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(ws),
    )
    conv = (
        fs.filter(
            (F.col("event_type") == "purchase")
            & F.col("first_signup").isNotNull()
            & (F.col("ts") >= F.col("first_signup"))
        )
        .groupBy("user_id")
        .agg(
            F.min("first_signup").alias("first_signup"),
            F.min("ts").alias("first_purchase"),
        )
    )
    deltas = conv.select(
        "user_id",
        (
            F.unix_micros(F.col("first_purchase").cast("timestamp"))
            - F.unix_micros(F.col("first_signup").cast("timestamp"))
        ).alias("delta_us"),
    )
    ranked = rankdist.with_global_ranks(
        deltas, ["delta_us", "user_id"]
    ).withColumnsRenamed({rankdist.RANK: "rn", rankdist.N: "n"})
    p90_rank = F.greatest(
        F.lit(1).cast("bigint"), F.ceil(F.lit(0.90) * F.col("n")).cast("bigint")
    )
    return ranked.groupBy(F.col("n").alias("n_converted")).agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("delta_us"))
        ).alias("median_us"),
        F.max(F.when(F.col("rn") == p90_rank, F.col("delta_us"))).alias("p90_us"),
    )


@register(
    "session_duration_histogram",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000000
              THEN 0 ELSE 1 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
  FROM gaps
),
durs AS (
  SELECT user_id, session_seq,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM sessions GROUP BY 1, 2
)
SELECT CASE WHEN dur_us = 0 THEN 'single_event'
            WHEN dur_us < 60000000 THEN 'lt_1m'
            WHEN dur_us < 300000000 THEN 'lt_5m'
            WHEN dur_us < 900000000 THEN 'lt_15m'
            WHEN dur_us < 3600000000 THEN 'lt_1h'
            ELSE 'ge_1h' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) AS mean_duration_us
FROM durs GROUP BY 1
""",
)
def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution over gap-sessionized events, in fixed
    integer-microsecond buckets — the engagement-shape panel.

    Composition proof for the shared ``sessionize`` program: session tag,
    per-session min/max, and bucketing all live inside the one ``user_id``
    exchange; the bucket aggregate is 6 rows. Durations are integer
    microseconds end-to-end; the mean is exact-integer sum over count, one
    IEEE division — bitwise cross-engine. (Bucket edges are closed-open,
    pinned by integer comparisons, so no value can straddle engines.)"""
    from deg04_local_data_lake_spark.operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    durs = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            ).alias("dur_us")
        )
    )
    bucket = (
        F.when(F.col("dur_us") == 0, "single_event")
        .when(F.col("dur_us") < 60_000_000, "lt_1m")
        .when(F.col("dur_us") < 300_000_000, "lt_5m")
        .when(F.col("dur_us") < 900_000_000, "lt_15m")
        .when(F.col("dur_us") < 3_600_000_000, "lt_1h")
        .otherwise("ge_1h")
    )
    return durs.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        (F.sum("dur_us").cast("double") / F.count(F.lit(1))).alias(
            "mean_duration_us"
        ),
    )


_SESSION_SQL = """
WITH gaps AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000000
              THEN 0 ELSE 1 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
  FROM gaps
)
"""


@register(
    "session_path_topk",
    oracle=f"""
{_SESSION_SQL},
ranked AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS rn
  FROM sessions
),
paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 12 GROUP BY 1, 2
),
counted AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM paths GROUP BY 1)
SELECT path, n_sessions
FROM (SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rn
      FROM counted)
WHERE rn <= 10
""",
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session paths: the ordered event-type sequence of each
    session (head-capped at 12 steps), counted corpus-wide — the
    clickstream-mining query behind "what do users actually do".

    The path string is an ordered aggregate (Spark 4 ``listagg WITHIN
    GROUP`` ≡ DuckDB ``string_agg ORDER BY``) over a total order
    (rank tie-broken on event_id), so identical across engines and runs.
    The 12-step cap bounds string size BEFORE aggregation — unbounded
    session concatenation is the memory hazard at scale, same reasoning
    as the inverted-index head. Path counting is an ordinary hash
    aggregate; only the 10-row final rank runs single-partition."""
    from deg04_local_data_lake_spark.operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    sessionize(ev).createOrReplaceTempView("_sp_sessions")
    return spark.sql(
        """
        WITH ranked AS (
          SELECT user_id, session_seq, event_type,
                 row_number() OVER (PARTITION BY user_id, session_seq
                                    ORDER BY ts, event_id) AS rn
          FROM _sp_sessions
        ),
        paths AS (
          SELECT user_id, session_seq,
                 listagg(event_type, '>') WITHIN GROUP (ORDER BY rn) AS path
          FROM ranked WHERE rn <= 12 GROUP BY 1, 2
        ),
        counted AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
                    FROM paths GROUP BY 1)
        SELECT path, n_sessions
        FROM (SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rn
              FROM counted)
        WHERE rn <= 10
        """
    )


@register(
    "attribution_linear_integer",
    oracle="""
WITH counted AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS units,
         count(CASE WHEN event_type = 'click' THEN 1 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_click,
         count(CASE WHEN event_type = 'view' THEN 1 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_view,
         count(CASE WHEN event_type = 'signup' THEN 1 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_signup
  FROM events
),
purchases AS (
  SELECT units, n_click, n_view, n_signup,
         n_click + n_view + n_signup AS k
  FROM counted WHERE event_type = 'purchase'
),
split AS (
  SELECT CASE WHEN k > 0 THEN (units * n_click) // k ELSE 0 END AS c_click,
         CASE WHEN k > 0 THEN (units * n_view) // k ELSE 0 END AS c_view,
         CASE WHEN k > 0 THEN (units * n_signup) // k ELSE 0 END AS c_signup,
         CASE WHEN k = 0 THEN units ELSE 0 END AS c_direct,
         units, k
  FROM purchases
)
SELECT CAST(SUM(c_click) AS BIGINT) AS click_units,
       CAST(SUM(c_view) AS BIGINT) AS view_units,
       CAST(SUM(c_signup) AS BIGINT) AS signup_units,
       CAST(SUM(c_direct) AS BIGINT) AS direct_units,
       CAST(SUM(units - c_click - c_view - c_signup - c_direct) AS BIGINT)
         AS residual_units,
       CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM split
""",
)
def attribution_linear_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (multi-touch) attribution with money-safe integer splitting:
    each purchase's value — in exact 0.1-milli units — is divided across
    all prior click/view/signup touches proportionally to their counts,
    using floor division; the sub-unit remainder is reported explicitly
    instead of leaking into float dust. Purchases with no prior touches
    credit 'direct'. Complements ``attribution_last_touch``.

    Per-channel touch counts are three conditional running counts over ONE
    user-timeline window (one shuffle, one sort — Spark plans a single
    Window node); the split is pure integer arithmetic, so the books
    balance to the unit: click+view+signup+direct+residual == total, and
    every engine agrees bitwise. The final aggregate is a 1-row global sum
    with map-side partials."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def prior(t: str):
        return F.count(F.when(F.col("event_type") == t, F.lit(1))).over(w)

    counted = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("units"),
        prior("click").alias("n_click"),
        prior("view").alias("n_view"),
        prior("signup").alias("n_signup"),
    )
    p = counted.filter(F.col("event_type") == "purchase").withColumn(
        "k", F.col("n_click") + F.col("n_view") + F.col("n_signup")
    )

    def share(c: str):
        # Floor-division semantics to match DuckDB's `//`: Spark's DIV
        # truncates toward zero, which diverges on negative units
        # (refunds) — floor(a/b) for b>0 is trunc(a/b) minus 1 when a<0
        # with a remainder. Keeps the cross-engine books balanced bitwise.
        q = F.expr(f"(units * {c}) DIV k")
        r = F.expr(f"(units * {c}) % k")
        floor_q = q - F.when((r != 0) & (F.col("units") < 0), 1).otherwise(0)
        return F.when(F.col("k") > 0, floor_q).otherwise(F.lit(0).cast("bigint"))

    split = p.select(
        share("n_click").alias("c_click"),
        share("n_view").alias("c_view"),
        share("n_signup").alias("c_signup"),
        F.when(F.col("k") == 0, F.col("units"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("c_direct"),
        "units",
    )
    return split.agg(
        F.sum("c_click").cast("bigint").alias("click_units"),
        F.sum("c_view").cast("bigint").alias("view_units"),
        F.sum("c_signup").cast("bigint").alias("signup_units"),
        F.sum("c_direct").cast("bigint").alias("direct_units"),
        F.sum(
            F.col("units")
            - F.col("c_click")
            - F.col("c_view")
            - F.col("c_signup")
            - F.col("c_direct")
        )
        .cast("bigint")
        .alias("residual_units"),
        F.count(F.lit(1)).alias("n_purchases"),
    )


THROTTLE_NS = 300_000_000_000  # 5 minutes


def _throttle_scan(pdf):
    """Per-user linear scan (runs inside an Arrow batch on the executor):
    keep an event iff it is ≥ THROTTLE time after the last KEPT event.
    Integer-nanosecond arithmetic — no float time."""
    import pandas as pd

    pdf = pdf.sort_values(["ts", "event_id"])
    ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
    eids = pdf["event_id"].to_numpy()
    uids = pdf["user_id"].to_numpy()
    keep_u, keep_e, last = [], [], None
    for u, e, t in zip(uids, eids, ns):
        if last is None or t - last >= THROTTLE_NS:
            keep_u.append(u)
            keep_e.append(e)
            last = t
    return pd.DataFrame({"user_id": keep_u, "event_id": keep_e})


def _throttle_scan_sorted(batches):
    """mapInPandas worker over a user-sorted partition: the same
    integer-ns throttle state machine as :func:`_throttle_scan`, but one
    Python call per ARROW BATCH instead of one per user. groupBy →
    applyInPandas paid a pandas-frame construction + per-group sort for
    every user (thousands of ~20-row frames at sf0.1 — measured 5.0 s of
    which the state machine itself is ~0.05 s); a partition sorted by
    (user_id, ts, event_id) runs the identical scan over whole batches
    at 0.54 s (guide §4.5: amortize per-call overhead across the
    partition). State (current user, last kept ns) carries across batch
    boundaries — Arrow batches of one partition arrive in order."""
    import pandas as pd

    cur_user, last = None, 0
    for pdf in batches:
        ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        uids = pdf["user_id"].to_numpy()
        eids = pdf["event_id"].to_numpy()
        keep_u, keep_e = [], []
        for i in range(len(uids)):
            u = uids[i]
            if u != cur_user:
                cur_user, last = u, ns[i]
                keep_u.append(u)
                keep_e.append(eids[i])
            elif ns[i] - last >= THROTTLE_NS:
                last = ns[i]
                keep_u.append(u)
                keep_e.append(eids[i])
        yield pd.DataFrame({"user_id": keep_u, "event_id": keep_e})


@register(
    "throttle_events",
    oracle="""
WITH RECURSIVE ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
walk AS (
  SELECT user_id, event_id, us, rn, TRUE AS kept, us AS last_kept
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.us, o.rn,
         o.us - w.last_kept >= 300000000 AS kept,
         CASE WHEN o.us - w.last_kept >= 300000000
              THEN o.us ELSE w.last_kept END
  FROM walk w JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
)
SELECT user_id, event_id FROM walk WHERE kept
""",
)
def throttle_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throttle / rate-limit: keep an event only if ≥5 minutes have passed
    since the last KEPT event of the same user — the alert-dedup /
    notification-cap primitive. This is a genuinely iterative recurrence
    (whether an event survives depends on which earlier events survived),
    NOT expressible as a window program — sessionize-and-take-first gives
    a different answer on chains (events at 0′, 4′, 8′: throttle keeps
    {0′, 8′}; a 5′-gap session keeps only {0′}).

    So this is the custom-operator tier (SURVEY §2 stance (b)): one
    shuffle onto ``user_id`` + an in-partition sort, then an
    Arrow-batched ``mapInPandas`` linear scan over the sorted partition
    — O(events) integer-ns state machine, the batch twin of the
    ``applyInPandasWithState`` streaming operator. The oracle is a
    DuckDB recursive CTE walking rank-successor rows, proving the
    Python state machine against pure SQL semantics.

    Round 11: restructured from groupBy → applyInPandas (one pandas
    frame + sort PER USER — per-group overhead was 99% of the 5.0 s
    wall-clock at sf0.1) to repartition(user_id) +
    sortWithinPartitions + mapInPandas over whole batches (0.54 s,
    identical output attested row-for-row). The shuffle shape is the
    SAME one hash exchange on user_id either way (FlatMapGroupsInPandas
    also sorts within partitions); only the Python-call granularity
    changed. Keep the payload to the 3 needed columns; memory-safe
    because Arrow streams bounded batches."""
    from deg04_local_data_lake_spark.operators.multimodal import (
        ensure_workers_can_import,
    )

    ensure_workers_can_import(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    part = ev.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    ).sortWithinPartitions("user_id", "ts", "event_id")
    return part.mapInPandas(
        _throttle_scan_sorted, "user_id bigint, event_id bigint"
    )


@register(
    "customer_order_gaps",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
           lag(CAST(o_orderdate AS DATE))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
)
SELECT o_custkey,
       CAST(count(gap_days) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_days) AS DOUBLE) / count(gap_days) AS mean_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days,
       CAST(min(gap_days) AS BIGINT) AS min_gap_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1 HAVING count(gap_days) >= 3
""",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per customer: the day gaps between
    consecutive orders (mean/min/max over customers with ≥3 gaps) — the
    replenishment-cycle feature behind churn prediction and
    next-order-date models.

    Standard one-shuffle timeline shape (lag over the customer ordering,
    tie-broken on orderkey); gaps are integer day diffs, the mean is one
    exact-sum division. The aggregate reuses the window's customer
    partitioning — no second exchange."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("gap_days").cast("bigint").alias("n_gaps"),
            (F.sum("gap_days").cast("double") / F.count("gap_days")).alias(
                "mean_gap_days"
            ),
            F.max("gap_days").cast("bigint").alias("max_gap_days"),
            F.min("gap_days").cast("bigint").alias("min_gap_days"),
        )
        .filter(F.col("n_gaps") >= 3)
    )


@register(
    "click_to_purchase_within_hour",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT CAST((SELECT count(*) FROM purchases) AS BIGINT) AS n_purchases,
       CAST((SELECT count(*) FROM purchases p
             WHERE EXISTS (SELECT 1 FROM clicks c
                           WHERE c.user_id = p.user_id
                             AND c.ts <= p.ts
                             AND c.ts > p.ts - INTERVAL 1 HOUR)) AS BIGINT)
         AS n_click_driven,
       CAST((SELECT count(*) FROM purchases p
             WHERE EXISTS (SELECT 1 FROM clicks c
                           WHERE c.user_id = p.user_id
                             AND c.ts <= p.ts
                             AND c.ts > p.ts - INTERVAL 1 HOUR)) AS DOUBLE)
         / (SELECT count(*) FROM purchases) AS click_driven_share
""",
)
def click_to_purchase_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Short-horizon conversion: the share of purchases preceded by a
    click from the same user within the previous hour — the bounded-window
    EXISTS shape (the batch twin of the watermarked stream-stream interval
    join in streaming/ingest.py, whose join condition is this predicate).

    Spark plans the EXISTS as a left-semi join on ``user_id`` with the
    time band as a residual predicate — both sides shuffle once on the
    user key and the band check runs inside the co-partitioned match, the
    same containment that makes the streaming version's state bounded.
    Counts only; one IEEE division at the end."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    driven = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("ts"))
        & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    )
    n_all = purchases.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    n_hit = driven.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_driven"))
    return n_all.crossJoin(F.broadcast(n_hit)).select(
        "n_purchases",
        "n_click_driven",
        (F.col("n_click_driven").cast("double") / F.col("n_purchases")).alias(
            "click_driven_share"
        ),
    )
