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


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source event stream (bronze ingest direction). ``maxFilesPerTrigger``
    bounds per-microbatch work; an explicit schema is mandatory for streams."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
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
    how: str = "inner",
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
    return purchases.join(clicks, cond, how).select(
        "purchase_id",
        # full outer pads the PURCHASE side for unmatched clicks, so the
        # row's user must come from whichever side is present (on
        # matches and for inner/left the two are equal by the join cond)
        F.coalesce("user_id", "click_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
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


# ---------------------------------------------------------------------------
# Driver-visible bounded-stream queries (SURVEY.md §2.10 as oracle rows)
#
# Everything above correctness-checks streaming by pytest equivalence
# (stream result == batch twin). These entries go further: they EXECUTE a
# real Structured Streaming job — file source, watermark, windowed state,
# availableNow trigger — inside a ``queries()`` callable, so the external
# driver hash-compares a genuinely streamed result against the DuckDB
# oracle. ``availableNow`` drains the source in bounded microbatches
# (maxFilesPerTrigger=8) and terminates; ``complete`` output mode emits the
# final state of every window, which for a drained bounded source equals
# the batch aggregation — that identity is Structured Streaming's
# correctness contract, and these rows make the driver attest it.
#
# The memory sink is the *verification* sink (it collects the small
# aggregate to the driver, exactly like the oracle harness does); the
# production sink is ``write_stream_to_lake`` (file sink, exactly-once via
# checkpoint), covered by tests/test_streaming.py.
# ---------------------------------------------------------------------------

_STREAM_SEQ = 0
_STREAM_SRC_CACHE: dict[tuple[str, str], str] = {}
_BUILT_TABLE_CACHE: dict[tuple[str, str], str] = {}


def _built_stream_table(spark: SparkSession, tag: str, sf_dir: str, build):
    """Build-once-per-process cache for the table-format stream SOURCES
    (the Delta log / Iceberg snapshot tables the incremental readers
    drain). The build — four commits plus a change commit — is
    deterministic given ``sf_dir``, so repeated invocations in one
    process (bench warm runs, repeated driver checks) pay the commit
    writes once and only re-measure the streaming DRAIN, which is the
    part under test. The directory is process-private (``mkdtemp``) and
    reclaimed at interpreter exit; a failed build never caches."""
    import atexit
    import os
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, f"{tag}:{sf_dir}")
    path = _BUILT_TABLE_CACHE.get(key)
    if path is None or not os.path.isdir(path):
        path = tempfile.mkdtemp(prefix=f"deg04_{tag}_")
        try:
            build(path)
        except BaseException:
            shutil.rmtree(path, ignore_errors=True)
            raise
        _BUILT_TABLE_CACHE[key] = path
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path

#: Watermark for the bounded VERIFICATION drains: wider than the
#: dataset's whole time span. The rewritten source files arrive in
#: arbitrary (repartitioned) order, and a production-sized lateness
#: bound would silently drop "late" rows that are merely unordered
#: arrival — session windows and stream-stream joins enforce the
#: watermark even under availableNow. Multi-batch STATE FOLDING is
#: still fully exercised; the late-data-drop semantics are pinned
#: separately by tests/test_streaming.py over time-ordered sources.
_VERIFY_WATERMARK = "365 days"


def _bounded_event_stream(
    spark: SparkSession, sf_dir: str, files_per_trigger: int = 8
) -> DataFrame:
    """Open the events table as a file-source stream (see
    ``_bounded_event_src`` for the rewrite contract)."""
    return read_event_stream(
        spark,
        _bounded_event_src(spark, sf_dir),
        max_files_per_trigger=files_per_trigger,
    )


def _bounded_event_src(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events table as a streamable file-source directory.

    Stream event time must be LTZ (watermarks reject NTZ), while the lake
    reader is NTZ wall time — so rewrite once into a temp dir as LTZ
    parquet (session tz is pinned UTC, so wall times are preserved
    exactly) and stream from there. The rewrite doubles as the "files
    arriving in a directory" ingest shape the file source is built for.
    The rewritten dir is cached per (app id, sf_dir): six stream queries
    over the same table share one rewrite instead of six.

    The rewrite always produces 32 files; ``files_per_trigger`` sets each
    query's microbatch granularity. The default 8 drains in ≥4 batches;
    every bounded drain must keep ≥4 microbatches so multi-batch state
    folding stays attested.
    """
    import hashlib
    import os
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    src = _STREAM_SRC_CACHE.get(key)
    if src is None:
        # Deterministic location keyed by the source table's identity:
        # repeated sessions (bench, driver, tests) REUSE one rewrite
        # instead of each leaking a fresh 32-file copy of events in /tmp.
        table = os.path.join(sf_dir, "events.parquet")
        st = os.stat(table)
        tag = hashlib.sha256(
            f"{table}:{st.st_size}:{st.st_mtime_ns}".encode()
        ).hexdigest()[:16]
        src = os.path.join(tempfile.gettempdir(), f"deg04_stream_src_{tag}")
        if not os.path.exists(os.path.join(src, "_SUCCESS")):
            # Publish-by-rename: build the rewrite in a process-unique
            # staging dir, then atomically rename it into the shared
            # deterministic path. Two concurrent processes that both miss
            # _SUCCESS each build their own copy; exactly one rename wins
            # and the loser discards its staging dir — no process ever
            # overwrites a directory another session is streaming from.
            stage = tempfile.mkdtemp(
                prefix=f"deg04_stream_stage_{tag}_",
                dir=tempfile.gettempdir(),
            )
            stage_out = os.path.join(stage, "out")
            (
                load_table(spark, sf_dir, "events")
                .withColumn("ts", F.col("ts").cast("timestamp"))
                # 32 files → ≥4 microbatches at maxFilesPerTrigger=8, so
                # every bounded-stream query exercises MULTI-batch state
                # folding even where the source table is one small file
                .repartition(32)
                .write.mode("overwrite")
                .parquet(stage_out)
            )
            import shutil

            try:
                os.rename(stage_out, src)
            except OSError:
                # Another process published first (rename onto an
                # existing non-empty dir fails) — use theirs. Any other
                # rename failure leaves no usable source: surface it.
                if not os.path.exists(os.path.join(src, "_SUCCESS")):
                    shutil.rmtree(stage, ignore_errors=True)
                    raise
            shutil.rmtree(stage, ignore_errors=True)
        _STREAM_SRC_CACHE[key] = src
    return src


def _drain_to_memory(
    df: DataFrame,
    prefix: str,
    mode: str = "complete",
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Run a bounded streaming query to a memory sink; return the result.

    ``complete`` for windowed aggregations (final state of every window);
    ``append`` for joins/projections (each result row emitted exactly
    once); ``update`` for custom stateful operators (one row per group per
    microbatch — callers reduce to final state, see
    ``stream_running_user_stats``).

    ``shuffle_partitions`` sizes the query's STATE STORE instance count
    (Structured Streaming pins it per query from the session conf at
    start). Each microbatch pays fixed per-instance maintenance, so a
    stateful drain over a small bounded source wants fewer, fuller
    instances (the stream-stream join measured 15.9 s at 32 → 6.1 s at
    8, same ≥4-batch drain; the whole family improves similarly) —
    hence the default of 8 for these VERIFICATION drains. At 100 TB
    this is precisely the knob you size to state volume (pass ``None``
    to inherit the session value); the session value is restored after
    the drain — no cross-query side effect."""
    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"{prefix}_{_STREAM_SEQ}"
    spark = df.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(600)
        if not finished:
            # A silent q.stop() here would return a PARTIALLY-drained
            # memory table as if it were the final state — wrong results
            # with no error. Fail loudly instead.
            q.stop()
            raise TimeoutError(
                f"streaming drain {name!r} did not finish within 600s"
            )
        q.stop()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(conf_key, prior)
    return spark.table(name)


def _ntz(col: str):
    # memory-sink window starts come back LTZ; oracle timestamps are naive
    # wall time — identical under the pinned UTC session tz
    return F.col(col).cast("timestamp_ntz").alias(col)


@register(
    "stream_hourly_counts",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
)
def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windowed counts, actually streamed: file source →
    watermark → windowed state → availableNow drain. Same oracle as the
    batch twin ``events_hourly_counts`` — the driver-checked identity
    batch == final streamed state."""
    out = _drain_to_memory(
        hourly_counts(_bounded_event_stream(spark, sf_dir), watermark=_VERIFY_WATERMARK),
        "stream_hourly"
    )
    return out.select(_ntz("window_start"), "event_type", "n_events", "total_value")


@register(
    "stream_hopping_counts",
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
def stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 1h/15m windowed counts, streamed (state = 4 open windows
    per group within the watermark horizon). Oracle reconstructs Spark's
    epoch-aligned window expansion — same as batch ``events_hopping_counts``."""
    out = _drain_to_memory(
        hopping_counts(_bounded_event_stream(spark, sf_dir), watermark=_VERIFY_WATERMARK),
        "stream_hopping"
    )
    return out.select(_ntz("window_start"), "event_type", "n_events", "total_value")


@register(
    "stream_session_agg",
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
def stream_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap), streamed: native session_window state
    merging across microbatches — the hardest streaming state shape
    (sessions MERGE as late-but-in-watermark rows bridge gaps). Drained
    final state must equal the batch gap/running-sum oracle."""
    out = _drain_to_memory(
        session_agg(_bounded_event_stream(spark, sf_dir), watermark=_VERIFY_WATERMARK),
        "stream_sessions"
    )
    return out.select("user_id", "n_events", _ntz("first_ts"), _ntz("last_ts"))


@register(
    "stream_enrich_segment",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type, e.value,
       c.c_mktsegment AS segment
FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
""",
)
def stream_enrich_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment, driver-attested: the event
    stream left-joins the (static) customer dimension per microbatch —
    zero stream state, no watermark, the bread-and-butter bronze→silver
    streaming enrichment. Append mode: each enriched row is emitted
    exactly once, so the drained sink equals the batch left join the
    oracle runs."""
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    out = _drain_to_memory(
        stream_static_enrich(
            _bounded_event_stream(spark, sf_dir), dim
        ).select("event_id", "user_id", "event_type", "value", "segment"),
        "stream_enrich",
        mode="append",
    )
    return out


@register(
    "stream_purchase_click_join",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts
FROM events p
JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL '30 minutes'
""",
)
def stream_purchase_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, driver-attested: purchases join the
    same user's clicks in the preceding 30 minutes, both sides
    watermarked, state bounded by watermark+gap eviction. Inner joins
    emit each matched pair the moment both sides have arrived (no
    held-back rows), so the availableNow drain yields the complete pair
    set — hash-equal to the batch interval join."""
    out = _drain_to_memory(
        stream_stream_purchase_click(
            _bounded_event_stream(spark, sf_dir), watermark=_VERIFY_WATERMARK
        ),
        "stream_ssjoin",
        mode="append",
    )
    return out.select(
        "purchase_id", "user_id", _ntz("purchase_ts"), "click_id", _ntz("click_ts")
    )


@register(
    "stream_running_user_stats",
    oracle="""
SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
FROM events GROUP BY user_id
""",
)
def stream_running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``),
    driver-attested. Update mode emits one (count, max) row per user per
    microbatch; both stats are MONOTONE in the row stream, so the final
    state per user is the register-wise max over the emitted updates —
    the same merge trick the HLL sketches use, applied to the update log.
    The reduced result must equal the plain batch aggregate: that
    equality is what proves the per-microbatch state transitions compose
    correctly across the whole drain."""
    out = _drain_to_memory(
        running_user_stats(_bounded_event_stream(spark, sf_dir)),
        "stream_ustats",
        mode="update",
        # applyInPandasWithState runs one Arrow/Python worker per state
        # partition — unlike the JVM state stores, MORE partitions means
        # more Python-side parallelism, so inherit the session's width
        shuffle_partitions=None,
    )
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )


@register(
    "stream_cdc_apply",
    oracle="""
SELECT user_id, ts AS last_ts, event_id AS last_event_id,
       event_type AS last_type, value AS last_value
FROM (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch CDC apply, driver-attested: the event stream upserts a
    keep-latest-per-user lake table one microbatch at a time — the
    reference's streaming-merge-into-lake loop
    (``mage_demo/custom/delta_table_write.py`` intent) on the parquet
    fallback. Each batch compacts to its per-user latest, merges with the
    prior state snapshot, and writes a NEW versioned snapshot dir
    (read-modify-write to a fresh path — never overwriting a path mid-
    read; with Delta jars this inner merge is one ``MERGE INTO``,
    ``operators/cdc.py:cdc_upsert_delta``).

    Correctness does not depend on how the drain splits batches:
    keep-latest by (ts, event_id) is ASSOCIATIVE, so folding it over any
    microbatch partitioning equals the batch row_number oracle — the
    exactly-once-apply identity the driver now checks. State size is
    |users|; each merge shuffles only state ∪ batch-latest."""
    import tempfile

    base = tempfile.mkdtemp(prefix="deg04_cdc_apply_")
    state_paths: list[str] = []

    def keep_latest(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("ts", "event_id", "event_type", "value"),
                    F.struct("ts", "event_id"),
                ).alias("m")
            )
            .select(
                "user_id",
                F.col("m.ts").alias("ts"),
                F.col("m.event_id").alias("event_id"),
                F.col("m.event_type").alias("event_type"),
                F.col("m.value").alias("value"),
            )
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = spark  # session from closure; batch_df.sparkSession in cluster code
        latest_new = keep_latest(
            batch_df.select("user_id", "ts", "event_id", "event_type", "value")
        )
        if state_paths:
            prev = s.read.parquet(state_paths[-1])
            merged = keep_latest(prev.unionByName(latest_new))
        else:
            merged = latest_new
        out = f"{base}/state_{batch_id}"
        merged.write.mode("overwrite").parquet(out)
        state_paths.append(out)

    q = (
        _bounded_event_stream(spark, sf_dir)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    q.stop()
    if not finished:
        raise TimeoutError("stream_cdc_apply drain did not finish within 600s")
    if not state_paths:
        # Zero microbatches (empty source): the merged state is an empty
        # frame with the state schema, not an IndexError.
        final = keep_latest(
            load_table(spark, sf_dir, "events")
            .select("user_id", "ts", "event_id", "event_type", "value")
            .limit(0)
        )
    else:
        import shutil

        # Pin the final state in memory, then reclaim the per-invocation
        # state directory — repeated bench/driver runs must not leak
        # full-table copies on disk.
        final = spark.read.parquet(state_paths[-1]).localCheckpoint(eager=True)
        shutil.rmtree(base, ignore_errors=True)
    return final.select(
        "user_id",
        _ntz("ts"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    ).withColumnRenamed("ts", "last_ts")


@register(
    "stream_delta_sink_exactly_once",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1
""",
)
def stream_delta_sink_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming sink into the jar-less Delta table,
    driver-attested: the bounded event stream drains through
    ``delta_log.delta_stream_writer`` (one Delta append commit per
    microbatch, each carrying the protocol's ``txn`` action), then the
    ENTIRE drain is re-run from a fresh checkpoint — every batch is
    re-delivered with the same epoch ids and must be skipped by the
    recorded txn versions. The final table aggregate hash-matching the
    plain events oracle proves the skip logic: without it the re-drain
    would double every row. This is the delta-spark streaming-sink
    idempotence contract reconstructed on the public log protocol."""
    import os
    import shutil
    import tempfile

    from deg04_local_data_lake_spark.sources.delta_log import (
        delta_history,
        delta_stream_writer,
        read_delta_log,
    )

    table = tempfile.mkdtemp(prefix="deg04_delta_sink_") + "/events"
    try:
        src = _bounded_event_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value"
        )
        for _attempt in range(2):  # second pass re-delivers every epoch
            q = (
                src.writeStream.foreachBatch(
                    delta_stream_writer(table, "deg04_sink")
                )
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("delta sink drain did not finish in 600s")
            q.stop()
        n_commits = len(delta_history(table))
        out = (
            read_delta_log(spark, table)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(dec("value")).cast("double").alias("total_value"),
            )
        )
        assert n_commits >= 4  # multi-batch drain, and ONLY the first one
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(os.path.dirname(table), ignore_errors=True)


@register(
    "stream_iceberg_sink_exactly_once",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1
""",
)
def stream_iceberg_sink_exactly_once(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exactly-once streaming sink into the jar-less Iceberg table,
    driver-attested — the Iceberg twin of
    ``stream_delta_sink_exactly_once``: each microbatch commits one
    append snapshot stamped with its streaming epoch in the snapshot
    summary (how the public Iceberg Spark/Flink sinks record progress),
    then the ENTIRE drain re-runs from a fresh checkpoint, re-delivering
    every epoch — all must be skipped from one metadata.json read. The
    final table aggregate hash-matching the plain events oracle proves
    the skip: without it the re-drain would double every row."""
    import os
    import shutil
    import tempfile

    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        _load_metadata,
        iceberg_stream_writer,
        read_iceberg,
    )

    table = tempfile.mkdtemp(prefix="deg04_ice_sink_") + "/events"
    try:
        src = _bounded_event_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value"
        )
        for _attempt in range(2):  # second pass re-delivers every epoch
            q = (
                src.writeStream.foreachBatch(
                    iceberg_stream_writer(table, "deg04_ice_sink")
                )
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError(
                    "iceberg sink drain did not finish in 600s"
                )
            q.stop()
        n_snaps = len(_load_metadata(table)["snapshots"])
        out = (
            read_iceberg(spark, table)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(dec("value")).cast("double").alias("total_value"),
            )
        )
        assert n_snaps >= 4  # multi-batch drain, and ONLY the first one
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(os.path.dirname(table), ignore_errors=True)


@register(
    "stream_dedup_union",
    oracle="""
SELECT event_id, user_id, event_type, value FROM events
""",
)
def stream_dedup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest under at-least-once delivery, driver-attested:
    the same source is fed TWICE (union of two independent file streams
    over one directory — every event arrives at least twice, split
    across microbatches) and ``dropDuplicatesWithinWatermark`` on
    event_id must emit each exactly once. Append mode emits on first
    sight; the drained sink must equal the plain distinct-events oracle.

    This is the idempotent-ingest half of the exactly-once story (the
    checkpointed-offset half is tests/test_streaming.py's restart
    tests). State is one key per event inside the watermark horizon —
    production bounds it with the real lateness window; the verification
    drain uses the wider-than-dataset watermark like the other bounded
    drains (see _VERIFY_WATERMARK)."""
    a = _bounded_event_stream(spark, sf_dir).withWatermark("ts", _VERIFY_WATERMARK)
    b = _bounded_event_stream(spark, sf_dir).withWatermark("ts", _VERIFY_WATERMARK)
    deduped = a.unionByName(b).dropDuplicatesWithinWatermark(["event_id"])
    return _drain_to_memory(
        deduped.select("event_id", "user_id", "event_type", "value"),
        "stream_dedup",
        mode="append",
    )


@register(
    "stream_delta_source_incremental",
    oracle="""
SELECT event_id, user_id, CAST(value AS DOUBLE) AS value, event_type
FROM events
""",
)
def stream_delta_source_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """readStream FROM the jar-less Delta table, driver-attested: events
    land in a Delta log as FOUR append commits plus one UPDATE (a
    change commit), and ``format("deg04_delta_stream")`` — the Python
    Data Source streaming reader over the transaction log
    (``sources/pyds.py``) — drains it with log versions as offsets, one
    commit per microbatch (``maxVersionsPerBatch=1``), one
    InputPartition per added file, Arrow batches executor-side. With
    ``skipChangeCommits=true`` the UPDATE commit is skipped WHOLE (a
    streaming reader must never re-emit rewritten rows), so the sink
    must equal exactly the four appends — the original events table —
    and the drain must take ≥4 non-empty microbatches (asserted
    in-query). This is delta-spark's streaming source contract:
    exactly-once via version offsets, append-only flow, loud failure on
    rewrites unless explicitly skipped. At 100 TB each microbatch fans
    out by file across the cluster; the log replay per trigger is
    O(new commits), never O(table)."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        update_delta,
        write_delta_commit,
    )
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"stream_delta_src_{_STREAM_SEQ}"

    def build(path: str) -> None:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.col("value").cast("double").alias("value"),
            "event_type",
        )
        for quarter in range(4):
            write_delta_commit(
                ev.filter(F.col("event_id") % 4 == quarter), path
            )
        # a change commit the stream must skip, not re-emit
        update_delta(
            spark, path, "event_type = 'click'", {"value": "value * 2"}
        )

    path = _built_stream_table(spark, "delta_src", sf_dir, build)
    try:
        # factory-built class: pickles BY VALUE, so the streaming
        # source runner process needs no package import at all
        spark.dataSource.register(make_delta_stream_source())
    except Exception:
        pass  # already registered in this session
    sdf = (
        spark.readStream.format("deg04_delta_stream")
        .option("path", path)
        .option("maxVersionsPerBatch", 1)
        .option("skipChangeCommits", "true")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
    finally:
        q.stop()
    assert n_batches >= 4, f"expected >=4 microbatches, got {n_batches}"
    return spark.table(name).localCheckpoint(eager=True)


@register(
    "stream_delta_source_restart",
    oracle="""
SELECT event_id, user_id, CAST(value AS DOUBLE) AS value, event_type
FROM events
""",
)
def stream_delta_source_restart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpointed RESTART of the jar-less Delta streaming source is
    exactly-once, driver-attested: two append commits drain into a
    parquet sink with a checkpoint, the query STOPS, two more commits
    land, and a brand-new query on the SAME checkpoint + sink resumes.
    The freshly-constructed reader knows nothing of the checkpoint —
    the Python streaming API's no-arg ``latestOffset()`` would let its
    cursor regress below the committed version and replay commits 0-1
    as duplicates (round-6 ADVICE); the reader's offset floor
    (``sources/pyds.py``) clamps engine-supplied offsets so the resumed
    stream emits ONLY commits 2-3. The sink must therefore equal the
    whole events table with every row exactly once — the oracle is the
    plain table, so any duplicate replay fails the row-count check."""
    import shutil
    import tempfile

    from deg04_local_data_lake_spark.sources.delta_log import (
        write_delta_commit,
    )
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    path = tempfile.mkdtemp(prefix="deg04_delta_restart_src_")
    ckpt = tempfile.mkdtemp(prefix="deg04_delta_restart_ckpt_")
    sink = tempfile.mkdtemp(prefix="deg04_delta_restart_sink_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.col("value").cast("double").alias("value"),
            "event_type",
        )
        try:
            spark.dataSource.register(make_delta_stream_source())
        except Exception:
            pass  # already registered in this session

        def drain_once() -> None:
            sdf = (
                spark.readStream.format("deg04_delta_stream")
                .option("path", path)
                .option("maxVersionsPerBatch", 1)
                .load()
            )
            q = (
                sdf.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        for quarter in range(2):
            write_delta_commit(
                ev.filter(F.col("event_id") % 4 == quarter), path
            )
        drain_once()
        for quarter in range(2, 4):
            write_delta_commit(
                ev.filter(F.col("event_id") % 4 == quarter), path
            )
        drain_once()  # restart from the checkpoint: commits 2-3 only
        return spark.read.parquet(sink).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)


@register(
    "stream_iceberg_source_incremental",
    oracle="""
SELECT event_id, user_id, CAST(value AS DOUBLE) AS value, event_type
FROM events
""",
)
def stream_iceberg_source_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """readStream FROM the jar-less Iceberg table, driver-attested:
    events commit as FOUR append snapshots plus one row-level DELETE
    (a non-append snapshot), and ``format("deg04_iceberg_stream")`` —
    the Python Data Source streaming reader over the snapshot log
    (``sources/pyds.py``) — drains it with SEQUENCE NUMBERS as offsets,
    one snapshot per microbatch, one InputPartition per added data
    file, Arrow batches executor-side. With
    ``skipNonAppendSnapshots=true`` the delete snapshot is skipped
    WHOLE (a streaming reader never re-emits or half-applies rewritten
    state), so the sink must equal exactly the four appends — the
    original events table — and the drain must take ≥4 non-empty
    microbatches (asserted in-query). This is the Iceberg runtime's
    incremental-append streaming read rebuilt offline: exactly-once via
    sequence offsets, per-trigger cost O(new snapshots) of Avro
    metadata plus a file-partitioned scan of exactly the new files."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
        write_iceberg_commit,
    )
    from deg04_local_data_lake_spark.sources.pyds import (
        make_iceberg_stream_source,
    )

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"stream_ice_src_{_STREAM_SEQ}"

    def build(path: str) -> None:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.col("value").cast("double").alias("value"),
            "event_type",
        )
        for quarter in range(4):
            write_iceberg_commit(
                ev.filter(F.col("event_id") % 4 == quarter), path,
                mode="append",
            )
        # a non-append snapshot the stream must skip, not re-emit
        delete_iceberg(spark, path, "event_type = 'click'")

    path = _built_stream_table(spark, "ice_src", sf_dir, build)
    try:
        spark.dataSource.register(make_iceberg_stream_source())
    except Exception:
        pass  # already registered in this session
    sdf = (
        spark.readStream.format("deg04_iceberg_stream")
        .option("path", path)
        .option("maxSnapshotsPerBatch", 1)
        .option("skipNonAppendSnapshots", "true")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
    finally:
        q.stop()
    assert n_batches >= 4, f"expected >=4 microbatches, got {n_batches}"
    return spark.table(name).localCheckpoint(eager=True)


@register(
    "stream_iceberg_source_restart",
    oracle="""
SELECT event_id, user_id, CAST(value AS DOUBLE) AS value, event_type
FROM events
""",
)
def stream_iceberg_source_restart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpointed RESTART of the jar-less Iceberg streaming source is
    exactly-once — the Iceberg twin of ``stream_delta_source_restart``:
    two append snapshots drain into a parquet sink with a checkpoint,
    the query STOPS, two more snapshots land, and a brand-new query on
    the SAME checkpoint + sink resumes. The fresh reader's sequence
    cursor starts at 0; without the offset floor in ``sources/pyds.py``
    the engine-supplied restart offsets would be ignored and snapshots
    1-2 replayed as duplicates. The sink must equal the whole events
    table with every row exactly once — the oracle is the plain table,
    so any replay fails the row-count check."""
    import shutil
    import tempfile

    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        write_iceberg_commit,
    )
    from deg04_local_data_lake_spark.sources.pyds import (
        make_iceberg_stream_source,
    )

    path = tempfile.mkdtemp(prefix="deg04_ice_restart_src_")
    ckpt = tempfile.mkdtemp(prefix="deg04_ice_restart_ckpt_")
    sink = tempfile.mkdtemp(prefix="deg04_ice_restart_sink_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.col("value").cast("double").alias("value"),
            "event_type",
        )
        try:
            spark.dataSource.register(make_iceberg_stream_source())
        except Exception:
            pass  # already registered in this session

        def drain_once() -> None:
            sdf = (
                spark.readStream.format("deg04_iceberg_stream")
                .option("path", path)
                .option("maxSnapshotsPerBatch", 1)
                .load()
            )
            q = (
                sdf.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        for quarter in range(2):
            write_iceberg_commit(
                ev.filter(F.col("event_id") % 4 == quarter), path,
                mode="append",
            )
        drain_once()
        for quarter in range(2, 4):
            write_iceberg_commit(
                ev.filter(F.col("event_id") % 4 == quarter), path,
                mode="append",
            )
        drain_once()  # restart from the checkpoint: snapshots 3-4 only
        return spark.read.parquet(sink).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)


# ------------------------------- transformWithState (Spark 4 state API)


def first_touch_per_user(events: DataFrame) -> DataFrame:
    """Custom stateful operator on Spark 4's ``transformWithStateInPandas``
    — the successor API to ``applyInPandasWithState`` (typed state
    variables on the new state-store backend, timers, TTL): per-user
    FIRST TOUCH, i.e. the event minimizing ``(ts, event_id)`` across the
    whole stream, whatever order microbatches deliver it in.

    State is one typed ValueState row per user (O(|users|) store
    entries). Update mode emits the user's current best once per
    microbatch it improves or first appears in; the reduction to final
    state is a plain min over the emitted updates — the same monotone
    merge trick ``running_user_stats`` uses."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FirstTouch(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._best = handle.getValueState(
                "best", "ts timestamp, event_id long, value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            cur = self._best.get() if self._best.exists() else None
            best = None if cur is None else (cur[0], int(cur[1]), float(cur[2]))
            improved = best is None
            for pdf in rows:
                idx = pdf[["ts", "event_id"]].sort_values(
                    ["ts", "event_id"]
                ).index[0]
                cand = (
                    pdf["ts"][idx].to_pydatetime(),
                    int(pdf["event_id"][idx]),
                    float(pdf["value"][idx]),
                )
                if best is None or (cand[0], cand[1]) < (best[0], best[1]):
                    best = cand
                    improved = True
            if improved:
                self._best.update(best)
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "first_ts": [best[0]],
                        "first_event_id": [best[1]],
                        "first_value": [best[2]],
                    }
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FirstTouch(),
        outputStructType=(
            "user_id long, first_ts timestamp, "
            "first_event_id long, first_value double"
        ),
        outputMode="update",
        timeMode="none",
    )


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas`` runs a protobuf-based state-server
    protocol between the JVM and a long-lived Python driver worker; this
    container ships a broken ``google.protobuf`` (no compiled
    descriptors), so the operator is ENVIRONMENT-GATED exactly like the
    multimodal codecs: the implementation is real and tested where the
    dependency exists (tests/test_streaming.py skips cleanly here), and
    ``stream_running_user_stats`` attests the same stateful semantics
    through the dependency-free ``applyInPandasWithState`` API."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution as a streaming stateful operator on the
    Spark 4 ``transformWithStateInPandas`` API: the per-user minimum of
    ``(ts, event_id)`` folded across a ≥4-microbatch drain must equal
    the batch window-rank answer. State updates are monotone, so
    reducing the update-mode emissions with a struct-min recovers
    exactly the final state. NOT in the registry: gated on
    :func:`transform_with_state_available` (see its docstring); the
    batch-equality contract is pinned by the env-gated test."""
    out = _drain_to_memory(
        first_touch_per_user(_bounded_event_stream(spark, sf_dir)),
        "stream_first_touch",
        mode="update",
        # like applyInPandasWithState: one Arrow/Python worker per state
        # partition — inherit the session's width for parallelism
        shuffle_partitions=None,
    )
    best = F.min(
        F.struct("first_ts", "first_event_id", "first_value")
    ).alias("b")
    return (
        out.groupBy("user_id")
        .agg(best)
        .select(
            "user_id",
            F.col("b.first_ts").cast("timestamp_ntz").alias("first_ts"),
            F.col("b.first_event_id").alias("first_event_id"),
            F.col("b.first_value").alias("first_value"),
        )
    )


DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


_DOCS_SRC_CACHE: dict[tuple[str, str], str] = {}


def _docs_stream_source(spark: SparkSession, sf_dir: str) -> str:
    """Rewrite the single-file documents table into a cached multi-file
    directory (the file stream source requires a directory, and ≥4
    microbatches at maxFilesPerTrigger=4 keeps the drain genuinely
    incremental) — same publish-by-rename pattern as the events stream
    source: concurrent sessions race to one deterministic path, exactly
    one rename wins, nobody overwrites a directory in use."""
    import hashlib
    import os
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    src = _DOCS_SRC_CACHE.get(key)
    if src is None:
        table = os.path.join(sf_dir, "documents.parquet")
        st = os.stat(table)
        tag = hashlib.sha256(
            f"{table}:{st.st_size}:{st.st_mtime_ns}".encode()
        ).hexdigest()[:16]
        src = os.path.join(tempfile.gettempdir(), f"deg04_docs_src_{tag}")
        if not os.path.exists(os.path.join(src, "_SUCCESS")):
            stage = tempfile.mkdtemp(
                prefix=f"deg04_docs_stage_{tag}_", dir=tempfile.gettempdir()
            )
            stage_out = os.path.join(stage, "out")
            load_table(spark, sf_dir, "documents").repartition(
                16
            ).write.mode("overwrite").parquet(stage_out)
            try:
                os.rename(stage_out, src)
            except OSError:
                if not os.path.exists(os.path.join(src, "_SUCCESS")):
                    shutil.rmtree(stage, ignore_errors=True)
                    raise
            shutil.rmtree(stage, ignore_errors=True)
        _DOCS_SRC_CACHE[key] = src
    return src


@register("stream_pii_scrub")  # oracle assigned below: the batch twin's
def stream_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII curation gate as a STREAMING stage (round 8): the same
    seed→detect→redact projections as the batch ``text_pii_scrub``, run
    through ``readStream`` over the documents table and drained
    append-mode — stateless per-row curation gates lift to Structured
    Streaming unchanged (zero state stores, one emitted row per doc),
    which is how a continuously-arriving corpus runs compliance scrubs
    at ingest instead of in a nightly batch. The oracle is the BATCH
    twin's SQL: stream and batch must agree row-for-row, md5-for-md5."""
    from deg04_local_data_lake_spark.operators.text import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        pii_scrub_column,
        pii_seeded,
    )

    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .format("parquet")
        .load(_docs_stream_source(spark, sf_dir))
    )
    seeded = pii_seeded(docs)
    out = seeded.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL_RE))
        .cast("bigint")
        .alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE_RE))
        .cast("bigint")
        .alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(PII_IPV4_RE))
        .cast("bigint")
        .alias("n_ips"),
        F.md5(pii_scrub_column(F.col("text"))).alias("scrubbed_md5"),
    )
    return _drain_to_memory(out, "pii_scrub", mode="append")


# share the batch twin's oracle verbatim: stream == batch == DuckDB.
# Import the text module explicitly — a direct `import streaming.ingest`
# (tests) must not depend on registry.load_all's import order.
import deg04_local_data_lake_spark.operators.text  # noqa: E402,F401
from deg04_local_data_lake_spark import registry as _registry  # noqa: E402

_registry.ORACLES["stream_pii_scrub"] = _registry.ORACLES["text_pii_scrub"]


@register("stream_text_quality")  # oracle assigned below: the batch twin's
def stream_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-score gate as a STREAMING stage: the batch
    ``text_quality`` projections (length saturation, lexical diversity,
    stopword density, composite score) over ``readStream`` of the
    documents table, drained append-mode — with ``stream_pii_scrub``
    this completes the stateless half of the curation stack at ingest
    (the corpus-dependent gates — window frequencies, LSH, SemDeDup —
    stay batch by nature: they need the whole corpus). The oracle is
    the batch twin's SQL: stream == batch == DuckDB, score-for-score."""
    from deg04_local_data_lake_spark.operators.text import quality_metrics

    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .format("parquet")
        .load(_docs_stream_source(spark, sf_dir))
    )
    return _drain_to_memory(quality_metrics(docs), "text_quality", mode="append")


_registry.ORACLES["stream_text_quality"] = _registry.ORACLES["text_quality"]


def _sentinel_event_src(spark: SparkSession, sf_dir: str) -> str:
    """The bounded event source plus one WATERMARK SENTINEL file,
    guaranteed by mtime ordering to arrive in its own FINAL microbatch.

    Stream-stream OUTER joins only emit their null-padded rows when the
    watermark passes a row's join window — under the verification
    watermark (365 days, chosen so the unordered 32-file replay drops
    nothing as late) that never happens, so a bounded drain of an outer
    join would return the inner rows only. Production streams don't have
    this problem (data keeps arriving; the watermark keeps moving); a
    BOUNDED replay needs an explicit end-of-stream event. The sentinel
    file carries one purchase and one click at max(ts) + 366 days with
    negative user ids: processed last (FileStreamSource selects files
    oldest-mtime-first, and every data file is stamped older), it pushes
    the final watermark past every real join window, and the no-data
    microbatch that follows flushes every held-back unmatched row. The
    query filters the sentinel's own rows out by user id.

    Data files are COPIED, not hardlinked: the mtime restamp must not
    touch the shared rewrite other stream queries list concurrently.
    """
    import glob
    import shutil

    key = (spark.sparkContext.applicationId, sf_dir, "sentinel")
    cached = _STREAM_SRC_CACHE.get(key)
    if cached is not None:
        return cached
    base = _bounded_event_src(spark, sf_dir)
    import datetime
    import os
    import tempfile

    tag = os.path.basename(base).rsplit("_", 1)[-1]
    dst = os.path.join(tempfile.gettempdir(), f"deg04_stream_sent_{tag}")
    if not os.path.exists(os.path.join(dst, "_DONE")):
        stage = tempfile.mkdtemp(prefix=f"deg04_stream_sent_stage_{tag}_")
        stage_out = os.path.join(stage, "out")
        os.makedirs(stage_out)
        t0 = 1_000_000_000  # fixed epoch; only the RELATIVE order matters
        for f in sorted(glob.glob(os.path.join(base, "*.parquet"))):
            out = os.path.join(stage_out, os.path.basename(f))
            shutil.copy2(f, out)
            os.utime(out, (t0, t0))
        max_ts = (
            load_table(spark, sf_dir, "events")
            .agg(F.max("ts").alias("m"))
            .collect()[0]["m"]
        )
        sent_ts = max_ts + datetime.timedelta(days=366)
        sent = spark.createDataFrame(
            [
                (-1, sent_ts, -1, "purchase", 0.0, "{}"),
                (-2, sent_ts, -2, "click", 0.0, "{}"),
            ],
            EVENTS_SCHEMA,
        )
        sent_tmp = os.path.join(stage, "sent")
        sent.coalesce(1).write.parquet(sent_tmp)
        (sent_file,) = glob.glob(os.path.join(sent_tmp, "*.parquet"))
        sent_out = os.path.join(stage_out, "zzz-sentinel.parquet")
        shutil.copy2(sent_file, sent_out)
        os.utime(sent_out, (t0 + 1000, t0 + 1000))
        with open(os.path.join(stage_out, "_DONE"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(stage_out, dst)
        except OSError:
            if not os.path.exists(os.path.join(dst, "_DONE")):
                shutil.rmtree(stage, ignore_errors=True)
                raise
        shutil.rmtree(stage, ignore_errors=True)
    _STREAM_SRC_CACHE[key] = dst
    return dst


@register(
    "stream_left_outer_purchase_click",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts
FROM events p
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL '30 minutes'
WHERE p.event_type = 'purchase'
""",
)
def stream_left_outer_purchase_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantics Spark's
    docs flag as the hard case, because the unmatched side is emitted by
    WATERMARK PROGRESS, not by data arrival: a purchase with no click in
    its preceding 30 minutes surfaces (null-padded) only once the
    watermark proves no qualifying click can still arrive.

    The drain is made exact by the end-of-stream sentinel
    (``_sentinel_event_src``): matched pairs emit as they meet, exactly
    as in ``stream_purchase_click_join``; unmatched purchases are held in
    the join state until the sentinel batch pushes the watermark past
    their windows and the trailing no-data microbatch
    (``spark.sql.streaming.noDataMicroBatches.enabled``, on by default)
    flushes them. Hash-equality with the batch LEFT JOIN oracle therefore
    attests all three legs at once: no pair missed, no false unmatched
    (a row emitted null-padded AND matched would duplicate), and state
    eviction aligned exactly with the join window."""
    src = _sentinel_event_src(spark, sf_dir)
    events = read_event_stream(spark, src, max_files_per_trigger=8)
    out = _drain_to_memory(
        stream_stream_purchase_click(
            events, watermark=_VERIFY_WATERMARK, how="left_outer"
        ),
        "stream_ssjoin_outer",
        mode="append",
    )
    return out.filter(F.col("user_id") >= 0).select(
        "purchase_id", "user_id", _ntz("purchase_ts"), "click_id", _ntz("click_ts")
    )


@register(
    "stream_full_outer_purchase_click",
    oracle="""
SELECT p.event_id AS purchase_id,
       COALESCE(p.user_id, c.user_id) AS user_id,
       p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL '30 minutes'
""",
)
def stream_full_outer_purchase_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream FULL OUTER interval join (round-10, VERDICT r9 task
    #6): unmatched rows are flushed on BOTH sides by watermark progress —
    a purchase with no click in its preceding 30 minutes AND a click
    that no purchase ever claims each surface null-padded once the
    watermark proves their windows closed. State on both sides is
    bounded by the same watermark+interval condition as the inner join.

    The drain uses the same end-of-stream sentinel machinery as the
    left-outer query (``_sentinel_event_src``): the sentinel batch
    pushes the final watermark past every join window and the trailing
    no-data microbatch flushes the held rows of BOTH sides. Hash
    equality with the batch FULL JOIN oracle attests all four legs —
    matched pairs, click-less purchases, purchase-less clicks, and state
    eviction aligned exactly with the window (a row emitted both
    null-padded and matched would duplicate and break the hash)."""
    src = _sentinel_event_src(spark, sf_dir)
    events = read_event_stream(spark, src, max_files_per_trigger=8)
    out = _drain_to_memory(
        stream_stream_purchase_click(
            events, watermark=_VERIFY_WATERMARK, how="full_outer"
        ),
        "stream_ssjoin_full",
        mode="append",
    )
    return out.filter(F.col("user_id") >= 0).select(
        "purchase_id", "user_id", _ntz("purchase_ts"), "click_id", _ntz("click_ts")
    )


@register(
    "stream_dedup_exact_docs",
    oracle="""
SELECT DISTINCT MD5(text) AS content_hash, n_chars FROM documents
""",
)
def stream_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` as the STREAMING twin of exact
    corpus dedup (round-10, VERDICT r9 task #6): the documents table is
    replayed as a file stream — fed TWICE (union of two independent
    readers over one directory, so every doc arrives at least twice,
    split across microbatches) — keyed by content hash, and each
    distinct text must be emitted exactly once. This is the ingest-time
    half of ``dedup_exact``: dedup-at-arrival inside the lateness
    horizon, with the corpus-wide batch pass (canonical-id assignment)
    remaining the batch job's business.

    Determinism: WHICH duplicate survives depends on arrival order, so
    the output projects only columns functionally determined by the
    dedup key (the hash and the text length) — exact under any file
    split or partition order, hence the DISTINCT oracle. State is one
    key per distinct doc inside the watermark window; production bounds
    it with the real lateness budget exactly as the event-stream dedup
    (``stream_dedup_union``) does."""
    src = _docs_stream_source(spark, sf_dir)

    def reader() -> DataFrame:
        docs = (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .format("parquet")
            .load(src)
        )
        # synthetic-but-deterministic event time (docs carry none):
        # doc_id seconds from a fixed epoch keeps every row comfortably
        # inside the verification watermark
        return docs.select(
            F.md5("text").alias("content_hash"),
            "n_chars",
            F.timestamp_seconds(F.lit(1_000_000_000) + F.col("doc_id")).alias(
                "arrival_ts"
            ),
        ).withWatermark("arrival_ts", _VERIFY_WATERMARK)

    deduped = (
        reader()
        .unionByName(reader())
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    return _drain_to_memory(
        deduped.select("content_hash", "n_chars"),
        "stream_dedup_docs",
        mode="append",
    )


@register(
    "stream_cdf_incremental_gold",
    oracle="""
WITH final AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS price
  FROM orders
  WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderpriority, o_totalprice * 2 AS price
  FROM orders
  WHERE o_orderkey % 11 = 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM final
GROUP BY o_orderpriority
""",
)
def stream_cdf_incremental_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental gold maintenance from the commit-time
    change feed, driver-attested end-to-end (round 11; the streaming
    third of the incremental-gold trio in operators/lakehouse.py):
    orders lands as v0 and its gold aggregate materializes from that
    snapshot; ``enable_delta_cdf`` (v1) turns on commit-time cdc files;
    then a DV UPDATE (v2, doubles price where key%7=0), a DV DELETE
    (v3, key%13=0), and an append (v4, doubled key%11=0) mutate the
    table. ``readStream.format("deg04_delta_stream")`` with
    ``readChangeFeed=true`` — delta-spark's CDF stream contract rebuilt
    on the Python Data Source API — drains versions 2-4 with log
    versions as exactly-once offsets: cdc-file commits fan out one
    InputPartition per change file (rows pre-tagged), the pure append
    emits its add files tagged 'insert', and a STREAMING aggregation
    folds the signed rows (insert/postimage +, delete/preimage −) into
    per-group deltas in complete output mode. The final memory-sink
    state merges into the materialized gold and must hash-match the
    full-recompute oracle.

    This is the production always-on refresh loop: at 100 TB the stream
    reads O(changed rows) per trigger (never the fact table), the
    running aggregate state is |groups| rows, and the gold merge is a
    |groups|-row union — refresh latency tracks the mutation rate. The
    drain is asserted to take ≥3 non-empty microbatches
    (maxVersionsPerBatch=1: one commit per trigger, exactly-once)."""
    from deg04_local_data_lake_spark.operators.lakehouse import (
        _gold_partial,
    )
    from deg04_local_data_lake_spark.sources.delta_log import (
        delete_delta,
        enable_delta_cdf,
        read_delta_log,
        update_delta,
        write_delta_commit,
    )
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"stream_cdf_gold_{_STREAM_SEQ}"

    def build(path: str) -> None:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        write_delta_commit(orders, path)
        assert enable_delta_cdf(path) == 1
        update_delta(
            spark, path, "o_orderkey % 7 = 0",
            {"o_totalprice": "o_totalprice * 2"},
        )
        delete_delta(spark, path, "o_orderkey % 13 = 0")
        write_delta_commit(
            orders.filter(F.col("o_orderkey") % 11 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") * 2
            ),
            path,
        )

    path = _built_stream_table(spark, "cdf_gold", sf_dir, build)
    gold = _gold_partial(
        read_delta_log(spark, path, version=0)
    ).localCheckpoint(eager=True)
    try:
        spark.dataSource.register(make_delta_stream_source())
    except Exception:
        pass  # already registered in this session
    sdf = (
        spark.readStream.format("deg04_delta_stream")
        .option("path", path)
        .option("maxVersionsPerBatch", 1)
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)  # (0, …]: skip the base snapshot
        .load()
    )
    plus = F.col("_change_type").isin("insert", "update_postimage")
    deltas = sdf.groupBy("o_orderpriority").agg(
        F.sum(F.when(plus, F.lit(1)).otherwise(F.lit(-1)))
        .cast("bigint")
        .alias("n_orders"),
        F.sum(
            F.when(plus, dec("o_totalprice")).otherwise(-dec("o_totalprice"))
        )
        .cast("decimal(28,4)")
        .alias("revenue_dec"),
    )
    q = (
        deltas.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
    finally:
        q.stop()
    assert n_batches >= 3, f"expected >=3 microbatches, got {n_batches}"
    out = (
        gold.unionByName(spark.table(name))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("revenue_dec").cast("double").alias("revenue"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return out.localCheckpoint(eager=True)


@register(
    "stream_cdf_whole_file_reconstruction",
    oracle="""
WITH base AS (
  SELECT o_orderkey AS k, o_totalprice AS p FROM orders
),
v2state AS (
  SELECT k, CASE WHEN k % 7 = 0 THEN p * 2 ELSE p END AS p FROM base
)
SELECT * FROM (
  SELECT CAST(2 AS BIGINT) AS commit_version,
         'update_preimage' AS change_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
  FROM base WHERE k % 7 = 0
  UNION ALL
  SELECT 2, 'update_postimage', COUNT(*),
         CAST(SUM(CAST(p * 2 AS DECIMAL(18,4))) AS DOUBLE)
  FROM base WHERE k % 7 = 0
  UNION ALL
  SELECT 3, 'delete', COUNT(*),
         CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE)
  FROM v2state
  UNION ALL
  SELECT 3, 'insert', COUNT(*),
         CAST(SUM(CAST(p * 4 AS DECIMAL(18,4))) AS DOUBLE)
  FROM base WHERE k % 5 = 0
  UNION ALL
  SELECT 4, 'delete', COUNT(*),
         CAST(SUM(CAST(p * 4 AS DECIMAL(18,4))) AS DOUBLE)
  FROM base WHERE k % 5 = 0
  UNION ALL
  SELECT 4, 'insert', COUNT(*),
         CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE)
  FROM v2state
  UNION ALL
  SELECT 5, 'delete', COUNT(*),
         CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE)
  FROM v2state WHERE k % 13 = 0
  UNION ALL
  SELECT 6, 'insert', COUNT(*),
         CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE)
  FROM v2state WHERE k % 13 = 0
  UNION ALL
  SELECT 7, 'insert', COUNT(*),
         CAST(SUM(CAST(p * 2 AS DECIMAL(18,4))) AS DOUBLE)
  FROM base WHERE k % 11 = 0
) t
""",
)
def stream_cdf_whole_file_reconstruction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round 11: the CDF stream's WHOLE-FILE + DV-DIFF reconstruction,
    driver-attested end-to-end. With change-data-feed enabled, the only
    commits that rewrite data without persisting cdc files are
    whole-file operations (overwrite, RESTORE); through round 10 the
    stream REFUSED them (batch/stream divergence — the batch reader
    serves them via snapshot diff). The stream source now reconstructs
    them exactly at the file level, the add/remove derivation
    delta-spark's CDCReader runs: added file → its live rows as inserts
    (deletion-vector rows EXCLUDED), removed file → its previously-live
    rows as deletes, and a re-added path whose DV shrank → the DV set
    difference as resurrected inserts (sources/pyds.py
    ``_reconstruct_changes``).

    The workload walks every reconstruction leg: a DV UPDATE (v2,
    cdc-served), an OVERWRITE (v3: delete-all + insert-new, whole
    files), a RESTORE across the overwrite (v4: the re-added original
    files carry the update's DVs — the insert legs must EXCLUDE those
    dead rows or the %7 keys double-count at both prices), a DV DELETE
    (v5, cdc-served), a RESTORE across it (v6: add-only resurrection
    via the DV set difference — also the round-11 BATCH hole: the
    pure-append branch used to re-emit those files whole), and a plain
    append (v7). The result is the per-(version, change_type) row count
    and exact decimal price sum of the drained stream, hash-matched
    against DuckDB computing the same feed from first principles.

    100 TB posture: reconstruction stays one InputPartition per changed
    file with the DV row sets resolved driver-side from kilobyte
    bitmaps — O(changed files) planning, O(changed rows) data movement,
    never a snapshot-wide diff."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        delete_delta,
        enable_delta_cdf,
        restore_delta,
        update_delta,
        write_delta_commit,
    )
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"stream_cdf_recon_{_STREAM_SEQ}"

    def build(path: str) -> None:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        write_delta_commit(orders, path)                          # v0
        assert enable_delta_cdf(path) == 1                        # v1
        v = update_delta(
            spark, path, "o_orderkey % 7 = 0",
            {"o_totalprice": "o_totalprice * 2"},
        )                                                         # v2
        v = write_delta_commit(
            orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") * 4
            ),
            path,
            mode="overwrite",
        )                                                         # v3
        v = restore_delta(spark, path, 2)                         # v4
        v = delete_delta(spark, path, "o_orderkey % 13 = 0")      # v5
        v = restore_delta(spark, path, 4)                         # v6
        v = write_delta_commit(
            orders.filter(F.col("o_orderkey") % 11 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") * 2
            ),
            path,
            mode="append",
        )                                                         # v7
        assert v == 7, f"unexpected final version {v}"

    path = _built_stream_table(spark, "cdf_recon", sf_dir, build)
    try:
        spark.dataSource.register(make_delta_stream_source())
    except Exception:
        pass  # already registered in this session
    sdf = (
        spark.readStream.format("deg04_delta_stream")
        .option("path", path)
        .option("maxVersionsPerBatch", 1)
        .option("readChangeFeed", "true")
        .option("startingVersion", 2)  # (1, …]: the mutation feed
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
    finally:
        q.stop()
    # one commit per trigger, exactly-once offsets: six emitting versions
    assert n_batches >= 6, f"expected >=6 microbatches, got {n_batches}"
    out = (
        spark.table(name)
        .groupBy("_commit_version", "_change_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
        )
        .select(
            F.col("_commit_version").cast("bigint").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
            "n_rows",
            "sum_price",
        )
    )
    return out.localCheckpoint(eager=True)
