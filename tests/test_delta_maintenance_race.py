"""Round-10 live Delta maintenance race (VERDICT r9 task #4) — the r9
Iceberg expiry-race playbook run against the other log: ``vacuum_delta``
+ ``write_delta_checkpoint`` + ``cleanup_delta_log`` racing a live
appender, a CDF reader, a time-travel reader, and a streaming drain over
one table. Invariant: every reader call either succeeds with EXACTLY the
rows its endpoints imply, or refuses loudly with a documented
truncation/retention error — never a silently wrong, partial, or torn
result.

Holes this suite found in the pre-race code (now fixed in
sources/delta_log.py + sources/pyds.py, each with a deterministic
regression test below):

1. ``vacuum_delta`` had NO grace window: a distributed writer's part
   files land in the table directory BEFORE its commit JSON publishes,
   so a vacuum racing a live writer deleted the in-flight files and the
   commit then referenced vanished data — silent corruption for every
   later reader. Fix: mtime-based ``grace_ms`` (default
   ``VACUUM_GRACE_MS``), the exact twin of the r9 Iceberg
   ``remove_orphan`` hole and of delta-spark's retention check.
2. ``_replay`` read the ``_last_checkpoint`` pointer once; a concurrent
   checkpoint+cleanup pair could delete the named checkpoint parquet
   before the reader opened it, leaking a raw pyarrow ENOENT on a
   PERFECTLY READABLE table. Fix: re-read the pointer and retry (the
   replacement checkpoint covers ≥ the same versions); refuse with a
   documented message only when the requested version is truly
   truncated.
3. ``read_delta_changes`` and the ``deg04_delta_stream`` source opened
   commit JSONs directly and leaked raw FileNotFoundError when log
   cleanup truncated a version inside the requested range mid-read.
   Fix: both now refuse with documented truncation messages (the stream
   must STOP rather than skip — its offset range would otherwise
   advance past the truncated commit and drop its rows forever).
4. ``cleanup_delta_log`` / ``vacuum_delta`` crashed with raw ENOENT when
   two maintenance runs raced each other's ``os.remove``. Fix: a file
   already gone is the outcome both wanted.
"""

from __future__ import annotations

import os
import time

import pytest

from deg04_local_data_lake_spark.sources.delta_log import (
    cleanup_delta_log,
    delta_versions,
    read_delta_changes,
    read_delta_log,
    vacuum_delta,
    write_delta_checkpoint,
    write_delta_commit,
)

REFUSALS = (
    "truncated",
    "missing commit",
    "was removed by log cleanup",
    "no data-changing commits",
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v"
    )


# ------------------------------------------------ deterministic holes


def test_vacuum_grace_protects_inflight_files(spark, table):
    """Hole #1: a fresh unreferenced parquet is indistinguishable from a
    writer's staged-but-not-yet-committed file — default vacuum must
    spare it; grace 0 (quiesced writers) reclaims it."""
    write_delta_commit(_df(spark, 0, 10), table)
    stage = os.path.join(table, "_stage_deadbeef")
    os.makedirs(stage)
    staged = os.path.join(stage, "part-inflight.snappy.parquet")
    open(staged, "wb").write(b"not yet committed")
    loose = os.path.join(table, "part-torn.snappy.parquet")
    open(loose, "wb").write(b"mid-rename leftover")

    assert vacuum_delta(table) == []  # grace window: both spared
    assert os.path.exists(staged) and os.path.exists(loose)

    doomed = vacuum_delta(table, grace_ms=0)
    assert sorted(doomed) == [
        "_stage_deadbeef/part-inflight.snappy.parquet",
        "part-torn.snappy.parquet",
    ]
    # the committed snapshot's own files were never candidates
    assert sorted(r.id for r in read_delta_log(spark, table).collect()) == list(
        range(10)
    )


def test_cdf_refuses_truncated_range(spark, table):
    """Hole #3 (CDF side): a change-feed range reaching below the log
    cleanup horizon refuses with the documented message, never a raw
    ENOENT and never a partial diff."""
    for k in range(3):
        write_delta_commit(_df(spark, 10 * k, 10 * (k + 1)), table)
    write_delta_checkpoint(table)  # checkpoint at v2
    write_delta_commit(_df(spark, 30, 40), table)  # v3
    cleanup_delta_log(table)  # truncates v0, v1

    with pytest.raises(ValueError, match="truncated"):
        read_delta_changes(spark, table, 0, 3)
    # ranges fully above the checkpoint still work exactly
    rows = read_delta_changes(spark, table, 2, 3).collect()
    assert sorted(r.id for r in rows) == list(range(30, 40))
    assert {r["_change_type"] for r in rows} == {"insert"}


def test_stream_refuses_truncated_commit(spark, table):
    """Hole #3 (stream side): a drain whose next batch includes a
    truncated commit must STOP with the documented refusal — silently
    skipping would drop those rows from the stream forever."""
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    for k in range(3):
        write_delta_commit(_df(spark, 10 * k, 10 * (k + 1)), table)
    write_delta_checkpoint(table)
    write_delta_commit(_df(spark, 30, 40), table)
    cleanup_delta_log(table)

    try:
        spark.dataSource.register(make_delta_stream_source())
    except Exception:
        pass
    q = (
        spark.readStream.format("deg04_delta_stream")
        .option("path", table)
        .option("maxVersionsPerBatch", 10)
        .load()
        .writeStream.format("memory")
        .queryName("truncated_drain")
        .outputMode("append")
        .start()
    )
    try:
        with pytest.raises(Exception, match="truncated"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_replay_retries_when_checkpoint_moves(spark, table, monkeypatch):
    """Hole #2: a reader holding a stale ``_last_checkpoint`` value whose
    checkpoint parquet was cleaned must retry with the fresh pointer and
    SUCCEED (the newer checkpoint covers the same versions) — and refuse
    with the documented message when the version truly is truncated."""
    import deg04_local_data_lake_spark.sources.delta_log as dl

    for k in range(3):
        write_delta_commit(_df(spark, 10 * k, 10 * (k + 1)), table)
    write_delta_checkpoint(table)  # checkpoint at v2
    write_delta_commit(_df(spark, 30, 40), table)
    write_delta_checkpoint(table)  # checkpoint at v3
    # simulate the race: the v2 checkpoint file was cleaned AFTER a
    # reader loaded pointer=2 (first call lies, then reality)
    os.remove(os.path.join(table, "_delta_log", f"{2:020d}.checkpoint.parquet"))
    real = dl._read_last_checkpoint
    calls = {"n": 0}

    def stale_then_real(t):
        calls["n"] += 1
        return 2 if calls["n"] == 1 else real(t)

    monkeypatch.setattr(dl, "_read_last_checkpoint", stale_then_real)
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(40))  # retried onto checkpoint 3, exact
    assert calls["n"] >= 2

    # truly-truncated version: documented refusal, not an ENOENT leak
    monkeypatch.setattr(dl, "_read_last_checkpoint", real)
    cleanup_delta_log(table)
    with pytest.raises(FileNotFoundError, match="missing commit|truncated"):
        read_delta_log(spark, table, 1)


def test_concurrent_maintenance_is_idempotent(spark, table):
    """Hole #4: two maintenance runs racing each other's os.remove must
    both succeed; a file already deleted is the outcome both wanted."""
    from concurrent.futures import ThreadPoolExecutor

    for k in range(4):
        write_delta_commit(_df(spark, 10 * k, 10 * (k + 1)), table)
    write_delta_checkpoint(table)
    write_delta_commit(_df(spark, 40, 50), table)
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [ex.submit(cleanup_delta_log, table) for _ in range(2)]
        futs += [ex.submit(vacuum_delta, table, 0) for _ in range(2)]
        results = [f.result(timeout=60) for f in futs]
    # checkpoint sits at v3; cleanup removed v0..v2 exactly once
    # across the racers (no double-reporting, no crash)
    cleaned = sorted(v for r in results[:2] for v in r)
    assert cleaned == [0, 1, 2]
    assert delta_versions(table) == [3, 4]
    assert read_delta_log(spark, table).count() == 50


# ------------------------------------------------------- the live race


def test_live_maintenance_race(spark, table):
    """Appender vs (checkpoint + cleanup + vacuum) vs CDF reader vs
    time-travel reader vs streaming drain, all concurrently. Phase A
    runs the default vacuum grace under the live writer and must delete
    NOTHING; phase B quiesces the writer and races grace-0 reclamation
    against the readers — files and commits genuinely disappear
    mid-read, and every reader call must still resolve to exact-or-
    refused."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    frames = {
        k: _df(spark, 10 * k, 10 * (k + 1)).localCheckpoint(eager=True)
        for k in range(8)
    }
    write_delta_commit(frames[0], table)
    done = threading.Event()

    def writer():
        try:
            for k in range(1, 8):
                write_delta_commit(frames[k], table)
                time.sleep(0.02)
        finally:
            done.set()  # readers key off this even if a commit raises
        return ("writer", 8)

    def maintainer(stop_event):
        cleaned, vacuumed = 0, 0
        while not stop_event.is_set():
            write_delta_checkpoint(table)
            cleaned += len(cleanup_delta_log(table))
            # DEFAULT grace under a live writer — must reclaim nothing
            vacuumed += len(vacuum_delta(table))
            time.sleep(0.01)
        return ("maint", cleaned, vacuumed)

    def check_cdf_once() -> str:
        head = delta_versions(table)[-1]
        if head == 0:
            return "skip"
        try:
            rows = read_delta_changes(spark, table, 0, head).collect()
        except ValueError as exc:
            msg = str(exc)
            assert any(r in msg for r in REFUSALS), f"undocumented: {msg}"
            return "refused"
        except Exception as exc:  # Spark-side failure must be loud+ours
            assert any(r in str(exc) for r in REFUSALS), (
                f"leaked internal error: {exc}"
            )
            return "refused"
        # success must be EXACT for the head it read: pure appends ⇒
        # all inserts, ids (10, 10*(head+1)], nothing merged or missing
        assert {r["_change_type"] for r in rows} == {"insert"}
        got = sorted(r["id"] for r in rows)
        assert got == list(range(10, 10 * (head + 1))), (
            f"merged/partial CDF at head {head}"
        )
        return "ok"

    def check_time_travel_once(v: int) -> str:
        try:
            got = sorted(
                r.id for r in read_delta_log(spark, table, v).collect()
            )
        except (FileNotFoundError, ValueError, RuntimeError) as exc:
            msg = str(exc)
            assert any(r in msg for r in REFUSALS), f"undocumented: {msg}"
            return "refused"
        assert got == list(range(10 * (v + 1))), f"wrong snapshot at v{v}"
        return "ok"

    def cdf_reader():
        ok = refused = 0
        while not done.is_set() or (ok + refused) == 0:
            outcome = check_cdf_once()
            ok += outcome == "ok"
            refused += outcome == "refused"
            time.sleep(0.005)
        return ("cdf", ok, refused)

    def tt_reader():
        ok = refused = 0
        i = 0
        while not done.is_set() or (ok + refused) == 0:
            versions = delta_versions(table)
            v = versions[i % len(versions)]
            outcome = check_time_travel_once(v)
            ok += outcome == "ok"
            refused += outcome == "refused"
            i += 1
            time.sleep(0.005)
        return ("tt", ok, refused)

    def drain_once(name: str) -> str:
        q = (
            spark.readStream.format("deg04_delta_stream")
            .option("path", table)
            .option("maxVersionsPerBatch", 1)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        except Exception as exc:
            assert "truncated" in str(exc), f"leaked internal error: {exc}"
            return "refused"
        finally:
            q.stop()
        got = sorted(r["id"] for r in spark.table(name).collect())
        # success = whole commits from 0: contiguous ids on a batch
        # boundary — a skipped truncated commit or torn batch breaks this
        assert got == list(range(len(got))), "drain skipped/merged rows"
        assert len(got) % 10 == 0 and len(got) >= 10
        return "ok"

    def stream_drainer():
        try:
            spark.dataSource.register(make_delta_stream_source())
        except Exception:
            pass
        ok = refused = 0
        for attempt in range(2):
            outcome = drain_once(f"delta_race_a{attempt}")
            ok += outcome == "ok"
            refused += outcome == "refused"
        return ("drain", ok, refused)

    stop_a = threading.Event()
    with ThreadPoolExecutor(max_workers=5) as ex:
        futs = {
            "writer": ex.submit(writer),
            "maint": ex.submit(maintainer, stop_a),
            "cdf": ex.submit(cdf_reader),
            "tt": ex.submit(tt_reader),
            "drain": ex.submit(stream_drainer),
        }
        try:
            results = {}
            for k in ("writer", "cdf", "tt", "drain"):
                results[k] = futs[k].result(timeout=240)
        finally:
            # MUST fire even when a reader assertion raises, or the
            # with-block joins the maintainer/reader loops forever
            done.set()
            stop_a.set()
        results["maint"] = futs["maint"].result(timeout=60)

    # default-grace vacuum under a LIVE writer must reclaim NOTHING —
    # every unreferenced file it sees is seconds old (hole #1's guard)
    assert results["maint"][2] == 0, "vacuum deleted inside grace window"
    assert results["maint"][1] > 0, "cleanup never truncated anything"
    assert results["cdf"][1] + results["cdf"][2] >= 1
    assert results["tt"][1] + results["tt"][2] >= 1
    assert results["drain"][1] + results["drain"][2] == 2

    # phase B: writer quiesced ⇒ grace 0 is safe; files and commits
    # genuinely disappear under the racing readers
    done2 = threading.Event()

    def deleter():
        vacuumed = 0
        while not done2.is_set():
            write_delta_checkpoint(table)
            cleanup_delta_log(table)
            vacuumed += len(vacuum_delta(table, grace_ms=0))
            time.sleep(0.002)
        return vacuumed

    def racing_readers():
        outcomes = []
        for i in range(5):
            outcomes.append(check_cdf_once())
            versions = delta_versions(table)
            outcomes.append(check_time_travel_once(versions[0]))
            if i % 2 == 0:  # drains are the slow reader — every other
                outcomes.append(drain_once(f"delta_race_b{i}"))
        done2.set()
        return outcomes

    with ThreadPoolExecutor(max_workers=2) as ex:
        fut_del = ex.submit(deleter)
        fut_read = ex.submit(racing_readers)
        outcomes = fut_read.result(timeout=240)
        fut_del.result(timeout=30)

    assert all(o in ("ok", "refused", "skip") for o in outcomes)
    # the LATEST snapshot must stay exactly readable throughout — its
    # files are referenced, so no maintenance setting may touch them
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(80))


def test_checkpoint_pointer_never_heals_backwards(spark, table, monkeypatch):
    """Round-11 (ADVICE r10): write_delta_checkpoint's pointer guard was
    check-then-act — a concurrent checkpointer could publish a newer
    pointer between the loser's guard read and its os.replace, after
    which the replace moved ``_last_checkpoint`` BACKWARDS and
    un-shielded the newer checkpoint's truncated commits from readers.
    The function now heals after publishing: re-read and restore the
    max of pointer vs newest on-disk checkpoint until stable.

    Simulated here by letting the loser see a stale pointer for its
    exists-check and guard reads (checkpoint@3 + pointer=3 already
    published by the winner), while the heal loop reads reality."""
    import deg04_local_data_lake_spark.sources.delta_log as dl

    for k in range(3):
        write_delta_commit(_df(spark, 10 * k, 10 * (k + 1)), table)
    assert write_delta_checkpoint(table) == 2  # the loser's target
    write_delta_commit(_df(spark, 30, 40), table)
    assert write_delta_checkpoint(table) == 3  # the winner published
    assert dl._read_last_checkpoint(table) == 3

    real_read = dl._read_last_checkpoint
    real_latest = dl._latest_version
    calls = {"n": 0}

    def stale_for_guards(t):
        calls["n"] += 1
        # the loser's exists-check and pre-replace guard both read the
        # world as it was before the winner published; the heal loop
        # afterwards reads reality
        return 1 if calls["n"] <= 2 else real_read(t)

    monkeypatch.setattr(dl, "_read_last_checkpoint", stale_for_guards)
    monkeypatch.setattr(dl, "_latest_version", lambda t: 2)
    assert dl.write_delta_checkpoint(table) == 2  # the loser finishes
    monkeypatch.setattr(dl, "_read_last_checkpoint", real_read)
    monkeypatch.setattr(dl, "_latest_version", real_latest)
    # the loser's replace rolled the pointer to 2; the heal loop must
    # have restored it to the newest on-disk checkpoint
    assert dl._read_last_checkpoint(table) == 3
    assert read_delta_log(spark, table).count() == 40


def test_stream_schema_survives_pointed_checkpoint_deletion(spark, table):
    """Round-11 (ADVICE r10): the stream source's _checkpoint_meta
    silently returned None when racing maintenance deleted the
    checkpoint its pointer named — schema resolution then failed on a
    healthy table. It now retries via the fresh pointer and falls back
    to the newest ON-DISK checkpoint (the pointer is a hint)."""
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    for k in range(2):
        write_delta_commit(_df(spark, 10 * k, 10 * (k + 1)), table)
    assert write_delta_checkpoint(table) == 1
    cleanup_delta_log(table)  # v0 (the only JSON metaData) is gone
    write_delta_commit(_df(spark, 20, 30), table)
    assert write_delta_checkpoint(table) == 2
    # racing maintenance deletes the POINTED checkpoint; checkpoint@1
    # is still on disk (no cleanup ran after) and carries the metaData
    os.remove(
        os.path.join(table, "_delta_log", f"{2:020d}.checkpoint.parquet")
    )
    ds = make_delta_stream_source()(options={"path": table})
    assert set(ds.schema().fieldNames()) == {"id", "v"}
