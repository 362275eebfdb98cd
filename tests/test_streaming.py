"""Structured Streaming tests: the streaming plans must produce exactly the
batch results the oracle checked (that equivalence is the point of
correctness-checking streams in batch mode)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from deg04_local_data_lake_spark.sources.readers import load_table
from deg04_local_data_lake_spark.streaming import ingest


def _run_stream_to_memory(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _events_as_stream(spark, smoke_dir, tmp_path):
    # stream sources need LTZ event time (watermark requirement); write an
    # LTZ copy and read the batch twin from the SAME source so stream and
    # batch results are comparable under any timezone
    from pyspark.sql import functions as F

    src = str(tmp_path / "events_stream_src")
    load_table(spark, smoke_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(src)
    batch = spark.read.schema(ingest.EVENTS_SCHEMA).parquet(src)
    return batch, ingest.read_event_stream(spark, src)


def test_stream_hourly_counts_equals_batch(spark, smoke_dir, tmp_path):
    batch, stream = _events_as_stream(spark, smoke_dir, tmp_path)
    assert stream.isStreaming
    _run_stream_to_memory(ingest.hourly_counts(stream), "hourly")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("hourly").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ingest.hourly_counts(batch).collect()
    }
    assert got == want


def test_stream_session_agg_equals_batch(spark, smoke_dir, tmp_path):
    batch, stream = _events_as_stream(spark, smoke_dir, tmp_path)
    _run_stream_to_memory(ingest.session_agg(stream), "sessions")
    got = sorted(
        tuple(r) for r in spark.table("sessions").collect()
    )
    want = sorted(tuple(r) for r in ingest.session_agg(batch).collect())
    assert got == want


def test_stateful_running_stats_converges_to_batch(spark, smoke_dir, tmp_path):
    """applyInPandasWithState: after draining all input, the latest emitted
    row per user must equal the plain batch aggregate."""
    from pyspark.sql import functions as F

    batch, stream = _events_as_stream(spark, smoke_dir, tmp_path)
    q = (
        ingest.running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per user per microbatch; the final state
    # is the row with the highest n_events per user
    final = {
        r["user_id"]: (r["n_events"], r["max_value"])
        for r in spark.table("running_stats")
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "max_value")).alias("s"))
        .select("user_id", "s.n_events", "s.max_value")
        .collect()
    }
    want = {
        r["user_id"]: (r["n"], r["mx"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert final == want


def test_stream_dedup_within_watermark(spark, smoke_dir, tmp_path):
    """Exactly-once ingestion semantics: duplicate event_ids across
    microbatches are dropped by dropDuplicatesWithinWatermark."""
    from pyspark.sql import functions as F

    # stage a fixed batch first: LIMIT without ORDER BY is nondeterministic
    # across executions, so re-running `base.write` twice could deliver two
    # DIFFERENT subsets instead of a true duplicate
    staged = str(tmp_path / "staged")
    load_table(spark, smoke_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).limit(200).write.parquet(staged)
    base = spark.read.parquet(staged)

    src = str(tmp_path / "dup_src")
    base.write.parquet(src)
    base.write.mode("append").parquet(src)  # a full duplicate delivery

    stream = ingest.read_event_stream(spark, src)
    deduped = stream.withWatermark("ts", "10 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream").count()
    assert got == base.count()  # each event exactly once despite redelivery


def test_foreach_batch_cdc_upsert(spark, tmp_path):
    """Streaming CDC: microbatches of changes merged onto a parquet
    snapshot via foreachBatch."""
    from deg04_local_data_lake_spark.operators.cdc import cdc_upsert_foreach_batch

    snap = str(tmp_path / "snapshot")
    spark.createDataFrame(
        [(1, "Alice", 50000), (2, "Bob", 60000)], "id int, name string, salary int"
    ).write.parquet(snap)

    src = str(tmp_path / "inc_src")
    spark.createDataFrame(
        [(1, "Alice", 70000), (3, "Carol", 55000)], "id int, name string, salary int"
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("id int, name string, salary int")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _id: cdc_upsert_foreach_batch(
                batch, snap, "id", ["name", "salary"]
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = {r["id"]: (r["name"], r["salary"]) for r in spark.read.parquet(snap).collect()}
    assert final == {1: ("Alice", 70000), 2: ("Bob", 60000), 3: ("Carol", 55000)}


def test_stream_bronze_file_sink(spark, smoke_dir, tmp_path):
    batch, stream = _events_as_stream(spark, smoke_dir, tmp_path)
    out = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    q = ingest.write_stream_to_lake(
        stream.withWatermark("ts", "1 hour"), out, ckpt
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == batch.count()


def test_stream_static_enrich_equals_batch(spark, smoke_dir, tmp_path):
    """Stream-static broadcast join: per-microbatch enrichment must equal
    the batch join."""
    batch, stream = _events_as_stream(spark, smoke_dir, tmp_path)
    dim = (
        batch.select("user_id").distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("string"))
    )
    q = (
        ingest.stream_static_enrich(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["tier"]) for r in spark.table("enriched").collect()
    )
    want = sorted(
        (r["event_id"], r["tier"])
        for r in ingest.stream_static_enrich(batch, dim).collect()
    )
    assert got == want


def test_stream_stream_join_equals_batch(spark, smoke_dir, tmp_path):
    """Stream-stream interval join (watermarked both sides) must produce
    exactly the batch join's pairs once all input is drained."""
    batch, stream = _events_as_stream(spark, smoke_dir, tmp_path)
    q = (
        ingest.stream_stream_purchase_click(stream)
        .writeStream.format("memory")
        .queryName("pc_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["purchase_id"], r["click_id"]) for r in spark.table("pc_pairs").collect()
    )
    want = sorted(
        (r["purchase_id"], r["click_id"])
        for r in ingest.stream_stream_purchase_click(batch).collect()
    )
    assert len(want) > 0 and got == want


def test_stream_restart_resumes_from_checkpoint(spark, smoke_dir, tmp_path):
    """Fault-tolerance contract: a second query started on the SAME
    checkpoint must process only files that arrived after the first run —
    every input row lands in the sink exactly once across the restart
    (checkpointed file-source offsets + idempotent file sink)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, smoke_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    def run_once():
        q = (
            ingest.read_event_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    first.write.mode("append").parquet(src)
    run_once()
    assert spark.read.parquet(out).count() == first.count()

    second.write.mode("append").parquet(src)
    run_once()  # same checkpoint: resumes, reprocesses nothing
    sunk = spark.read.parquet(out)
    assert sunk.count() == events.count()
    assert sunk.select("event_id").distinct().count() == events.count()


def test_python_datasource_stream_equals_batch(spark, tmp_path):
    """Custom Python STREAMING source: each drain advances the
    checkpointed day offset; across successive runs on the SAME
    checkpoint the union of microbatches must equal the batch read of the
    same source, each row exactly once (offsets are plain dicts,
    generation is a pure function of them = exactly-once replay)."""
    from deg04_local_data_lake_spark.sources.pyds import TicksDataSource

    spark.dataSource.register(TicksDataSource)
    opts = {"days": "4", "tickers": "AA,BB", "rowsPerDay": "3",
            "daysPerBatch": "2"}
    out = str(tmp_path / "ticks_out")
    for _ in range(2):  # each availableNow run drains one read() window
        q = (
            spark.readStream.format("deg04_ticks").options(**opts).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    batch = spark.read.format("deg04_ticks").options(**opts).load()
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(got) == 4 * 2 * 3


def test_stream_hopping_counts_equals_batch(spark, smoke_dir, tmp_path):
    """The sliding-window rollup must agree with its batch twin (which the
    DuckDB oracle pins via explicit slot arithmetic) — including events
    that fall into 4 overlapping windows each."""
    batch, stream = _events_as_stream(spark, smoke_dir, tmp_path)
    _run_stream_to_memory(ingest.hopping_counts(stream), "hopping")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("hopping").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ingest.hopping_counts(batch).collect()
    }
    assert got == want


def test_stream_throttle_equals_batch(spark, smoke_dir, tmp_path):
    """The stateful streaming throttle must keep exactly the events the
    batch applyInPandas scan keeps (whose recursive-CTE oracle pins the
    semantics). Source written as ONE file so event-time order survives
    the microbatch boundary — the operator's documented arrival contract."""
    from deg04_local_data_lake_spark import registry
    from deg04_local_data_lake_spark.operators.multimodal import (
        ensure_workers_can_import,
    )

    ensure_workers_can_import(spark)
    src = str(tmp_path / "events_ordered_src")
    load_table(spark, smoke_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).sort("ts", "event_id").coalesce(1).write.parquet(src)

    # Force each user's rows to span MANY Arrow chunks (default ~10k rows
    # per chunk would hand the whole group to one chunk at test scale and
    # mask chunk-boundary ordering bugs in the state scan).
    prev_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = ingest.read_event_stream(spark, src)
        q = (
            ingest.throttle_stream(stream)
            .writeStream.format("memory")
            .queryName("throttled")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev_batch)
    got = {
        (r["user_id"], r["event_id"]) for r in spark.table("throttled").collect()
    }

    batch = spark.read.parquet(src)
    from deg04_local_data_lake_spark.operators.sequence import _throttle_scan

    want = {
        (r["user_id"], r["event_id"])
        for r in batch.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(_throttle_scan, "user_id bigint, event_id bigint")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_hll_registers_equal_batch(spark, smoke_dir, tmp_path):
    """Incremental sketch maintenance: HLL registers aggregated over a
    stream (complete mode — max is an unordered, idempotent combiner, so
    no watermark is needed) must equal the batch-computed registers after
    the stream drains. This is the streaming half of the persisted-sketch
    pattern: per-microbatch register maxima fold into exactly the batch
    sketch, regardless of arrival order or batch boundaries."""
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.operators.sketches import _hll_registers

    batch, stream = _events_as_stream(spark, smoke_dir, tmp_path)
    want = {tuple(r) for r in _hll_registers(batch, "event_type", "user_id").collect()}

    regs = _hll_registers(stream, "event_type", "user_id")
    _run_stream_to_memory(regs, "hll_regs")
    got = {tuple(r) for r in spark.table("hll_regs").collect()}
    assert got == want


def test_transform_with_state_first_touch(spark, sf_dir):
    """Spark 4 transformWithStateInPandas operator (typed ValueState):
    per-user first touch across a multi-microbatch drain must equal the
    batch window-rank answer. Skips where google.protobuf is broken
    (the API's state-server protocol needs it; this container's copy
    has no compiled descriptors) — the same semantics are attested
    dependency-free by stream_running_user_stats."""
    from deg04_local_data_lake_spark.streaming.ingest import (
        stream_first_touch,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf unusable: transformWithState gated")
    got = {
        (r.user_id, r.first_ts, r.first_event_id, r.first_value)
        for r in stream_first_touch(spark, sf_dir).collect()
    }
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r.user_id, r.ts, r.event_id, r.value)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("files_per_trigger", [4, 16])
def test_outer_join_drain_split_independent(spark, smoke_dir, files_per_trigger):
    """The LEFT OUTER drain must be exact under ANY microbatch split: the
    unmatched flush depends only on the sentinel batch being LAST (mtime
    ordering), not on how many batches precede it. 4 and 16 files per
    trigger bracket the registered query's 8."""
    src = ingest._sentinel_event_src(spark, smoke_dir)
    events = ingest.read_event_stream(
        spark, src, max_files_per_trigger=files_per_trigger
    )
    out = ingest._drain_to_memory(
        ingest.stream_stream_purchase_click(
            events, watermark=ingest._VERIFY_WATERMARK, how="left_outer"
        ),
        f"ssjoin_outer_split{files_per_trigger}",
        mode="append",
    )
    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in out.filter(F.col("user_id") >= 0).collect()
    )
    batch = load_table(spark, smoke_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = sorted(
        (r["purchase_id"], r["click_id"])
        for r in ingest.stream_stream_purchase_click(
            batch, how="left_outer"
        ).collect()
    )
    n_unmatched = sum(1 for _, c in want if c is None)
    assert n_unmatched > 0  # the flush path must actually be exercised
    assert got == want


@pytest.mark.parametrize("files_per_trigger", [4, 16])
def test_full_outer_join_drain_split_independent(
    spark, smoke_dir, files_per_trigger
):
    """Round-10 twin of the left-outer attestation for the FULL OUTER
    drain: unmatched rows must flush on BOTH sides under any microbatch
    split (4 and 16 files per trigger bracket the registered query's 8),
    exactly matching the batch full join."""
    src = ingest._sentinel_event_src(spark, smoke_dir)
    events = ingest.read_event_stream(
        spark, src, max_files_per_trigger=files_per_trigger
    )
    out = ingest._drain_to_memory(
        ingest.stream_stream_purchase_click(
            events, watermark=ingest._VERIFY_WATERMARK, how="full_outer"
        ),
        f"ssjoin_full_split{files_per_trigger}",
        mode="append",
    )
    # repr-sort: unmatched legs carry None, which Python cannot order
    got = sorted(
        repr((r["purchase_id"], r["click_id"]))
        for r in out.filter(F.col("user_id") >= 0).collect()
    )
    batch = load_table(spark, smoke_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want_pairs = [
        (r["purchase_id"], r["click_id"])
        for r in ingest.stream_stream_purchase_click(
            batch, how="full_outer"
        ).collect()
    ]
    want = sorted(repr(t) for t in want_pairs)
    # both null-padded legs must actually be exercised
    assert sum(1 for p, c in want_pairs if c is None) > 0
    assert sum(1 for p, c in want_pairs if p is None) > 0
    assert got == want


@pytest.mark.parametrize("files_per_trigger", [2, 8])
def test_stream_dedup_docs_split_independent(
    spark, smoke_dir, files_per_trigger
):
    """The dropDuplicatesWithinWatermark doc-dedup stage must emit each
    distinct text exactly once under any split of the doubled stream
    (2 and 8 files per trigger bracket the registered query's 4)."""
    src = ingest._docs_stream_source(spark, smoke_dir)

    def reader():
        docs = (
            spark.readStream.schema(ingest.DOCS_SCHEMA)
            .option("maxFilesPerTrigger", files_per_trigger)
            .format("parquet")
            .load(src)
        )
        return docs.select(
            F.md5("text").alias("content_hash"),
            "n_chars",
            F.timestamp_seconds(
                F.lit(1_000_000_000) + F.col("doc_id")
            ).alias("arrival_ts"),
        ).withWatermark("arrival_ts", ingest._VERIFY_WATERMARK)

    out = ingest._drain_to_memory(
        reader()
        .unionByName(reader())
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select("content_hash", "n_chars"),
        f"dedup_docs_split{files_per_trigger}",
        mode="append",
    )
    got = sorted((r.content_hash, r.n_chars) for r in out.collect())
    assert len(got) == len({h for h, _ in got})  # exactly once per hash
    want = sorted(
        (r.content_hash, r.n_chars)
        for r in load_table(spark, smoke_dir, "documents")
        .select(F.md5("text").alias("content_hash"), "n_chars")
        .distinct()
        .collect()
    )
    assert got == want
