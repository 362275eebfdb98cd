"""As-of join and banded range join — temporal operators Spark lacks as
built-ins (SURVEY.md §2.7 note: the reference has none either; these are
north-star custom operators expressed relationally).

``asof_join``: for each left event, the most recent right event at-or-
before it, per key. Implemented as the *union + running last* program —
one shuffle on (key), one sort within partitions, no join at all. This is
the scalable formulation: a naive approach joins every left row to every
earlier right row and explodes quadratically; merge_asof-style
``applyInPandas`` needs the whole key group in memory. The union-window
form streams through each partition once.

``range_join_banded``: inequality joins (t in (t0, t0+Δ]) don't hash —
Spark would fall back to BroadcastNestedLoopJoin. Banding quantizes time
into Δ-width buckets and equi-joins on (key, bucket) ∪ (key, bucket+1),
turning the O(n·m) comparison into a keyed hash join with exactly 2×
fan-out, then applies the exact range as a residual filter.

The DuckDB oracles use genuinely different machinery (native ``ASOF JOIN``,
native inequality IEJoin) — a real cross-implementation check, not the
same plan twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "asof_",
) -> DataFrame:
    """Union + running-last as-of join (at-or-before semantics).

    ``right`` rows sort before ``left`` rows at equal timestamps, so an
    exact-tie right row IS matched. Both inputs must be unique per
    (key, ts) — pre-aggregate ties first or matching is ambiguous.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts)]
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{suffix}{c}") for c in right_cols],
        F.col(ts).alias(f"{suffix}{ts}"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(r.schema[f"{suffix}{c}"].dataType).alias(f"{suffix}{c}")
          for c in right_cols],
        F.lit(None).cast(r.schema[f"{suffix}{ts}"].dataType).alias(f"{suffix}{ts}"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{suffix}{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in [*right_cols, ts]
        ],
    )
    keep = [c for c in left.columns]
    return filled.filter(F.col("_side") == 1).select(
        *keep,
        *[F.col(f"_f_{c}").alias(f"{suffix}{c}") for c in [*right_cols, ts]],
    )


@register(
    "asof_purchase_click",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purch AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts,
       c.click_id AS asof_click_id, c.ts AS asof_ts
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: each purchase matched to the user's most recent click
    at-or-before it. Clicks are deduped per (user, ts) by max event_id so
    the as-of match is unambiguous; oracle uses DuckDB's native ASOF JOIN.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return asof_join(purch, clicks, key="user_id", ts="ts", right_cols=["click_id"])


@register(
    "range_join_error_burst",
    oracle="""
WITH err AS (SELECT event_id, user_id, epoch_us(ts) AS us
             FROM events WHERE event_type = 'error')
SELECT err.event_id AS error_id,
       COUNT(ev.event_id) AS n_following
FROM err LEFT JOIN (SELECT event_id, user_id, epoch_us(ts) AS us FROM events) ev
  ON ev.user_id = err.user_id
 AND ev.us > err.us AND ev.us <= err.us + 300000000
GROUP BY 1
""",
)
def range_join_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events within 5 minutes after each error, per user — banded range
    join: equi-join on (user, Δ-bucket)×2 + exact residual filter, instead
    of the nested-loop plan a raw inequality join would get."""
    delta_us = 300_000_000
    ev_typed = load_table(spark, sf_dir, "events")
    events = ev_typed.select(
        "event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    err = ev_typed.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("err_us"),
    )
    # band both sides into Δ-width buckets; an in-range pair differs by ≤ 1 bucket
    err_b = err.withColumn(
        "bucket", F.explode(F.array(F.expr(f"err_us DIV {delta_us}"), F.expr(f"err_us DIV {delta_us} + 1")))
    )
    ev_b = events.withColumn("bucket", F.expr(f"us DIV {delta_us}"))
    hits = (
        err_b.join(ev_b, ["user_id", "bucket"])
        .filter(
            (F.col("us") > F.col("err_us"))
            & (F.col("us") <= F.col("err_us") + delta_us)
        )
        .groupBy("error_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return err.select("error_id").join(hits, "error_id", "left").select(
        "error_id", F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_following")
    )
