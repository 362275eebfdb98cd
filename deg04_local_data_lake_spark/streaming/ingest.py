"""Structured Streaming ingest + stateful aggregation
(SURVEY.md §2.10: the reference declares a streaming stack —
confluent-kafka/quixstreams/fastavro, mage_demo/requirements.txt:3-7 — but
never builds it; this module is the idiomatic Spark realization of that
intent).

Batch twins of both aggregations are registered as oracle-checked queries
(operators/windows.py ``events_hourly_counts``, and ``events_session_agg``
here): Structured Streaming's incremental execution of the same logical
plan is what makes "correctness-checked in batch" meaningful.

Scale notes: watermarks bound state (late rows beyond 2h are dropped);
session windows use Spark's native session_window state merging. For a
Kafka source swap ``readStream.format("kafka")`` — the transform and sink
stages are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        # LTZ: Spark watermarks/event-time require TIMESTAMP (not NTZ) —
        # stream sources carry instants; the oracle-facing batch reader
        # (sources/readers.py) uses NTZ wall time instead
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source event stream (bronze ingest direction). ``maxFilesPerTrigger``
    bounds per-microbatch work; an explicit schema is mandatory for streams."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .format(fmt)
        .load(path)
    )


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h windowed counts with a late-data watermark — streaming
    twin of the oracle-checked batch query ``events_hourly_counts``."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.window("ts", "1 hour").getField("start").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


def hopping_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Hopping 1h/15m windowed counts — streaming twin of the
    oracle-checked batch query ``events_hopping_counts``. Same 4× pre-
    shuffle expansion as batch; state size is windows-per-slide × groups,
    bounded by the watermark horizon."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.window("ts", "1 hour", "15 minutes").getField("start").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Native session-window aggregation (gap-merged), usable in batch and
    streaming. Batch semantics are pinned by the ``events_session_agg``
    oracle below (sessionize CTE formulation)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id", F.session_window("ts", gap)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ).select("user_id", "n_events", "first_ts", "last_ts")


def write_stream_to_lake(
    df: DataFrame, path: str, checkpoint: str, fmt: str = "parquet"
):
    """Bronze streaming sink: append with exactly-once file-sink semantics
    via the checkpoint (the streaming analog of sources/writers.py)."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def stream_static_enrich(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a static (or
    slowly-refreshed) dimension. The static side is broadcast per
    microbatch — no stream state at all, so no watermark is needed. This
    is the streaming analog of the batch dimension joins in
    operators/analytics.py; at scale the dim refresh cadence is a reload
    of the static DataFrame, not a stream."""
    return events.join(F.broadcast(user_dim), "user_id", "left")


def stream_stream_purchase_click(
    events: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each purchase joins the clicks of the same
    user in the preceding ``max_gap``. Both sides carry watermarks and the
    join has an explicit event-time range — the two conditions Spark
    requires to bound join state (clicks older than watermark+gap are
    evicted). Batch twin: the identical join on the batch frame (tested
    equal); the oracle-checked as-of join (operators/asof.py) pins the
    1:1-nearest variant of the same semantics."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    if events.isStreaming:
        purchases = purchases.withWatermark("purchase_ts", watermark)
        clicks = clicks.withWatermark("click_ts", watermark)
    cond = (
        (purchases.user_id == clicks.click_user)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (clicks.click_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {max_gap}"))
    )
    return purchases.join(clicks, cond).select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running event count and max value across microbatches — the escape
    hatch for stateful logic the built-in windowed aggregates can't express
    (here deliberately simple so the batch equivalence is testable).

    State is one (count, max) pair per user — O(|users|) store entries;
    emits an updated row per user per microbatch (output mode ``update``).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            n, vmax = state.get
        else:
            n, vmax = 0, None
        for pdf in pdfs:
            n += len(pdf)
            batch_max = float(pdf["value"].max())
            vmax = batch_max if vmax is None else max(vmax, batch_max)
        state.update((n, vmax))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "max_value": [vmax]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="n long, vmax double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def throttle_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``throttle_events`` custom operator:
    keep an event iff ≥5 minutes have passed since the last KEPT event of
    the same user. State is a single last-kept-nanos per user — O(|users|)
    entries, the canonical rate-limit/alert-dedup state machine.

    Correctness contract: the recurrence consumes events in event-time
    order, so batches must arrive ordered (single-source replay, or an
    upstream watermark-sorted stage). Within a batch the scan sorts; the
    carried state links batches. The batch twin's recursive-CTE oracle is
    the semantic reference."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from deg04_local_data_lake_spark.operators.sequence import THROTTLE_NS

    def update_fn(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        keep_u, keep_e = [], []
        # A group's microbatch rows can span multiple Arrow chunks
        # (spark.sql.execution.arrow.maxRecordsPerBatch) and post-shuffle
        # order within the group is arbitrary — accumulate ALL chunks and
        # sort ONCE so the recurrence scans the whole batch in
        # (ts, event_id) order; per-chunk sorting would let a later chunk
        # carry earlier events and keep the wrong set.
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
            for u, e, t in zip(
                pdf["user_id"].to_numpy(), pdf["event_id"].to_numpy(), ns
            ):
                if last is None or t - last >= THROTTLE_NS:
                    keep_u.append(u)
                    keep_e.append(e)
                    last = int(t)
        if last is not None:
            state.update((int(last),))
        yield pd.DataFrame({"user_id": keep_u, "event_id": keep_e})

    return events.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType="user_id long, event_id long",
        stateStructType="last_ns long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "events_session_agg",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 1800000000
              THEN 0 ELSE 1 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM gaps
)
SELECT user_id,
       COUNT(*) AS n_events,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM sess GROUP BY user_id, session_seq
""",
)
def events_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch run of the native session_window plan; oracle derives the same
    sessions from the gap/running-sum formulation — two genuinely different
    mechanisms, one semantic."""
    return session_agg(load_table(spark, sf_dir, "events"))
