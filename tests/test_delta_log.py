"""Tests for the from-scratch Delta transaction-log protocol
(sources/delta_log.py): multi-version replay, overwrite tombstones,
checkpoint resolution + log truncation, time travel, history."""

from __future__ import annotations

import os
import shutil

import pytest

from deg04_local_data_lake_spark.sources.delta_log import (
    delta_history,
    delta_versions,
    merge_delta,
    optimize_delta,
    read_delta_log,
    vacuum_delta,
    write_delta_checkpoint,
    write_delta_commit,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v"
    )


def test_append_overwrite_append_versions(spark, table):
    assert write_delta_commit(_df(spark, 0, 100), table) == 0
    assert write_delta_commit(_df(spark, 100, 150), table) == 1
    assert write_delta_commit(_df(spark, 0, 30), table, mode="overwrite") == 2
    assert write_delta_commit(_df(spark, 30, 40), table) == 3
    assert delta_versions(table) == [0, 1, 2, 3]
    # time travel to every version
    assert read_delta_log(spark, table, 0).count() == 100
    assert read_delta_log(spark, table, 1).count() == 150
    assert read_delta_log(spark, table, 2).count() == 30
    assert read_delta_log(spark, table).count() == 40
    # values, not just counts: latest = exactly ids 0..39
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(40))


def test_overwrite_emits_remove_tombstones(spark, table):
    write_delta_commit(_df(spark, 0, 50), table)
    write_delta_commit(_df(spark, 0, 10), table, mode="overwrite")
    hist = delta_history(table)
    assert hist[0]["operation"] == "WRITE"
    assert hist[1]["n_remove"] >= 1  # every v0 file tombstoned
    assert read_delta_log(spark, table).count() == 10


def test_checkpoint_allows_log_truncation(spark, table):
    write_delta_commit(_df(spark, 0, 20), table)
    write_delta_commit(_df(spark, 20, 40), table)
    assert write_delta_checkpoint(table) == 1
    write_delta_commit(_df(spark, 40, 50), table)
    # Truncate the pre-checkpoint JSON commits — the protocol allows it.
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    assert read_delta_log(spark, table).count() == 50
    assert read_delta_log(spark, table, 1).count() == 40  # from checkpoint
    # …but versions BEFORE the checkpoint are gone, and say so.
    with pytest.raises(FileNotFoundError):
        read_delta_log(spark, table, 0).count()


def test_schema_from_metadata_and_empty_snapshot(spark, table):
    write_delta_commit(_df(spark, 0, 5), table)
    df = read_delta_log(spark, table)
    assert [f.name for f in df.schema.fields] == ["id", "v"]
    # overwrite with an empty frame → zero live files, schema still served
    write_delta_commit(_df(spark, 0, 0), table, mode="overwrite")
    empty = read_delta_log(spark, table)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "v"]


def test_schema_evolution_on_overwrite(spark, table):
    write_delta_commit(_df(spark, 0, 5), table)
    evolved = spark.range(0, 5).selectExpr("id", "'x' AS tag")
    write_delta_commit(evolved, table, mode="overwrite")
    cur = read_delta_log(spark, table)
    assert [f.name for f in cur.schema.fields] == ["id", "tag"]
    old = read_delta_log(spark, table, 0)
    assert [f.name for f in old.schema.fields] == ["id", "v"]


def test_data_files_live_in_table_root(spark, table):
    write_delta_commit(_df(spark, 0, 5), table)
    names = os.listdir(table)
    assert "_delta_log" in names
    parts = [n for n in names if n.endswith(".snappy.parquet")]
    assert parts and all(n.startswith("part-00000-") for n in parts)
    shutil.rmtree(table)


def test_merge_upsert_and_cdc_delete(spark, table):
    write_delta_commit(_df(spark, 0, 10), table)
    # plain upsert: update ids 0-4 (v -> 99.0), insert ids 10-12
    src = spark.range(0, 5).selectExpr("id", "CAST(99 AS DOUBLE) AS v").union(
        spark.range(10, 13).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS v")
    )
    merge_delta(spark, table, src, "id")
    cur = {r.id: r.v for r in read_delta_log(spark, table).collect()}
    assert len(cur) == 13
    assert all(cur[i] == 99.0 for i in range(5))
    assert all(cur[i] == i * 2.0 for i in range(5, 13))
    # CDC feed with op column: delete ids 0-1, update id 5 -> 7.0
    feed = spark.createDataFrame(
        [(0, None, "D"), (1, None, "D"), (5, 7.0, "U")], "id long, v double, op string"
    )
    merge_delta(spark, table, feed, "id", op_col="op")
    cur = {r.id: r.v for r in read_delta_log(spark, table).collect()}
    assert 0 not in cur and 1 not in cur
    assert cur[5] == 7.0 and len(cur) == 11
    # every MERGE is a normal commit: time travel to v0 still exact
    assert read_delta_log(spark, table, 0).count() == 10


def test_optimize_compacts_without_data_change(spark, table):
    write_delta_commit(_df(spark, 0, 50).repartition(8), table)
    write_delta_commit(_df(spark, 50, 80).repartition(8), table)
    files_before = len([f for f in os.listdir(table) if f.endswith(".parquet")])
    v = optimize_delta(spark, table)
    hist = delta_history(table)
    assert hist[-1]["operation"] == "OPTIMIZE" and hist[-1]["version"] == v
    cur = read_delta_log(spark, table)
    assert cur.count() == 80
    live_files = len(cur.inputFiles())
    assert live_files < 16
    # old versions still read their ORIGINAL (pre-optimize) file lists
    assert read_delta_log(spark, table, 1).count() == 80
    assert read_delta_log(spark, table, 0).count() == 50
    assert files_before == 16


def test_vacuum_removes_only_unreachable_files(spark, table):
    write_delta_commit(_df(spark, 0, 20), table)
    write_delta_commit(_df(spark, 0, 5), table, mode="overwrite")
    # all versions replayable -> nothing is unreachable yet
    assert vacuum_delta(table) == []
    assert read_delta_log(spark, table, 0).count() == 20
    # checkpoint + truncate v0/v1 commits -> v0 files become unreachable
    write_delta_checkpoint(table)
    write_delta_commit(_df(spark, 5, 8), table)
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    doomed = vacuum_delta(table, grace_ms=0)  # writers quiesced
    assert doomed  # v0's files were deleted
    assert read_delta_log(spark, table).count() == 8
    assert read_delta_log(spark, table, 1).count() == 5  # checkpointed version


def test_change_feed_appends_overwrites_and_optimize(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        optimize_delta,
        read_delta_changes,
    )

    write_delta_commit(_df(spark, 0, 10), table)           # v0
    write_delta_commit(_df(spark, 10, 15), table)          # v1 append
    write_delta_commit(_df(spark, 0, 3), table, "overwrite")  # v2
    optimize_delta(spark, table)                           # v3: no change
    # v1 alone: pure-append commit feeds its files straight through
    ch1 = read_delta_changes(spark, table, 0, 1)
    assert {(r.id, r._change_type) for r in ch1.collect()} == {
        (i, "insert") for i in range(10, 15)
    }
    # v2 overwrite: rows 0..2 keep identical (id, v) values so the
    # multiset diff cancels them — the feed is exactly the dropped rows
    ch2 = read_delta_changes(spark, table, 1, 2)
    got = {(r.id, r._change_type) for r in ch2.collect()}
    assert got == {(i, "delete") for i in range(3, 15)}
    # v3 (OPTIMIZE) emits nothing; a range of only-OPTIMIZE raises
    with pytest.raises(ValueError):
        read_delta_changes(spark, table, 2, 3)
    # whole range tags each change with its committing version
    all_ch = read_delta_changes(spark, table, 0, 3)
    versions = {r._commit_version for r in all_ch.collect()}
    assert versions == {1, 2}


def test_add_actions_carry_file_stats(spark, table):
    import json

    from deg04_local_data_lake_spark.sources.delta_log import _replay

    write_delta_commit(_df(spark, 0, 100), table)
    live, _m = _replay(table, 0)
    stats = [json.loads(a["stats"]) for a in live.values() if a.get("stats")]
    assert stats
    assert sum(s["numRecords"] for s in stats) == 100
    all_mins = min(s["minValues"]["id"] for s in stats)
    all_maxs = max(s["maxValues"]["id"] for s in stats)
    assert (all_mins, all_maxs) == (0, 99)


def test_data_skipping_is_conservative_and_exact(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import optimize_delta

    write_delta_commit(_df(spark, 0, 1000).repartition(8), table)
    # random layout: ranges overlap, little to skip — but results exact
    r = read_delta_log(spark, table, column_ranges={"id": (100, 199)})
    assert sorted(
        x.id for x in r.filter("id BETWEEN 100 AND 199").collect()
    ) == list(range(100, 200))
    # clustered OPTIMIZE → narrow per-file ranges → real skipping
    optimize_delta(spark, table, target_file_bytes=1, cluster_by=["id"])
    full = read_delta_log(spark, table)
    pruned = read_delta_log(spark, table, column_ranges={"id": (100, 199)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert sorted(
        x.id for x in pruned.filter("id BETWEEN 100 AND 199").collect()
    ) == list(range(100, 200))
    # open-ended ranges work too
    hi = read_delta_log(spark, table, column_ranges={"id": (900, None)})
    assert len(hi.inputFiles()) < len(full.inputFiles())
    assert hi.filter("id >= 900").count() == 100


def test_automatic_checkpoint_every_interval(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        _read_last_checkpoint,
    )

    for i in range(12):
        write_delta_commit(_df(spark, i, i + 1), table)
    assert _read_last_checkpoint(table) == 10  # auto at the interval
    # reader resolves through the auto checkpoint transparently
    assert read_delta_log(spark, table).count() == 12


def test_concurrent_appends_serialize_without_loss(spark, table):
    """Optimistic concurrency: N writers committing appends at once must
    all land, each at a distinct contiguous version — the put-if-absent
    publish forbids two writers sharing a version (os.replace would
    silently drop one)."""
    from concurrent.futures import ThreadPoolExecutor

    write_delta_commit(_df(spark, 0, 10), table)
    batches = [(100 + 10 * i, 110 + 10 * i) for i in range(6)]
    frames = [_df(spark, lo, hi).localCheckpoint(eager=True) for lo, hi in batches]
    with ThreadPoolExecutor(max_workers=6) as ex:
        versions = list(
            ex.map(lambda fr: write_delta_commit(fr, table), frames)
        )
    assert sorted(versions) == [1, 2, 3, 4, 5, 6]  # contiguous, no clobber
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    expect = sorted(
        list(range(10)) + [i for lo, hi in batches for i in range(lo, hi)]
    )
    assert got == expect  # every append landed exactly once


def test_read_lake_table_front_door_falls_back_without_jars(spark, table, tmp_path):
    """`read_lake_table(fmt="delta"|"iceberg")` must serve jar-less
    environments through the from-scratch spec readers."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        write_iceberg_commit,
    )
    from deg04_local_data_lake_spark.sources.readers import read_lake_table

    write_delta_commit(_df(spark, 0, 7), table)
    assert read_lake_table(spark, table, fmt="delta").count() == 7
    ice = str(tmp_path / "ice")
    write_iceberg_commit(_df(spark, 0, 9), ice)
    assert read_lake_table(spark, ice, fmt="iceberg").count() == 9


def test_txn_versions_survive_checkpoint_truncation(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        last_txn_version,
    )

    assert last_txn_version(table, "app") == -1
    write_delta_commit(_df(spark, 0, 5), table, txn=("app", 0))
    write_delta_commit(_df(spark, 5, 9), table, txn=("app", 1))
    assert last_txn_version(table, "app") == 1
    assert last_txn_version(table, "other") == -1
    write_delta_checkpoint(table)
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    # the idempotence state must come back from the CHECKPOINT
    assert last_txn_version(table, "app") == 1
    write_delta_commit(_df(spark, 9, 10), table, txn=("app", 2))
    assert last_txn_version(table, "app") == 2


def test_partitioned_write_and_log_pruning(spark, table):
    df = spark.range(0, 100).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS par"
    )
    write_delta_commit(df, table, partition_by=["par"])
    full = read_delta_log(spark, table)
    assert full.count() == 100
    assert set(full.columns) == {"id", "par"}
    pruned = read_delta_log(spark, table, partition_filter={"par": "even"})
    assert pruned.count() == 50
    assert all(r.par == "even" for r in pruned.collect())
    # pruning happened in the log: strictly fewer files scheduled
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # filters on non-partition columns are rejected loudly
    with pytest.raises(ValueError):
        read_delta_log(spark, table, partition_filter={"id": "1"})


# ---------------------------------------------------- deletion vectors


def _dv_imports():
    from deg04_local_data_lake_spark.sources.delta_log import (
        delete_delta,
        read_delta_changes,
    )

    return delete_delta, read_delta_changes


def test_delete_with_dv_rewrites_no_data_file(spark, table):
    delete_delta, _ = _dv_imports()
    write_delta_commit(_df(spark, 0, 1000).repartition(4), table)
    from deg04_local_data_lake_spark.sources.delta_log import _replay

    before, _m = _replay(table, 0)
    v = delete_delta(spark, table, "id % 10 = 3")
    assert v == 1
    after, _m = _replay(table, v)
    # same data file paths, now carrying deletionVector descriptors
    assert set(after) == set(before)
    assert all(a.get("deletionVector") for a in after.values())
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == [i for i in range(1000) if i % 10 != 3]


def test_delete_time_travel_sees_pre_delete_rows(spark, table):
    delete_delta, _ = _dv_imports()
    write_delta_commit(_df(spark, 0, 500), table)
    delete_delta(spark, table, "id < 100")
    assert read_delta_log(spark, table, 0).count() == 500
    assert read_delta_log(spark, table).count() == 400


def test_repeated_deletes_merge_bitmaps(spark, table):
    delete_delta, _ = _dv_imports()
    write_delta_commit(_df(spark, 0, 300).coalesce(1), table)
    delete_delta(spark, table, "id < 50")
    delete_delta(spark, table, "id >= 250")
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(50, 250))
    # one live file, one merged DV with both delete sets
    from deg04_local_data_lake_spark.sources.delta_log import (
        _dv_load,
        _replay,
    )

    live, _m = _replay(table, 2)
    assert len(live) == 1
    (add,) = live.values()
    arr = _dv_load(table, add["deletionVector"])
    assert sorted(arr.tolist()) == list(range(50)) + list(range(250, 300))
    assert add["deletionVector"]["cardinality"] == 100


def test_fully_deleted_file_becomes_plain_remove(spark, table):
    delete_delta, _ = _dv_imports()
    # two files with disjoint ranges: deleting one range must DROP that
    # file, not keep it behind an all-rows DV
    write_delta_commit(_df(spark, 0, 100).coalesce(1), table)
    write_delta_commit(_df(spark, 100, 200).coalesce(1), table)
    v = delete_delta(spark, table, "id < 100")
    from deg04_local_data_lake_spark.sources.delta_log import _replay

    live, _m = _replay(table, v)
    assert len(live) == 1
    assert not any(a.get("deletionVector") for a in live.values())
    assert read_delta_log(spark, table).count() == 100


def test_delete_nothing_is_a_noop(spark, table):
    delete_delta, _ = _dv_imports()
    write_delta_commit(_df(spark, 0, 50), table)
    assert delete_delta(spark, table, "id > 1000000") == 0
    assert delta_versions(table) == [0]


def test_dv_survives_checkpoint(spark, table):
    delete_delta, _ = _dv_imports()
    write_delta_commit(_df(spark, 0, 400).coalesce(2), table)
    delete_delta(spark, table, "id % 7 = 0")
    write_delta_checkpoint(table)
    # truncate the JSON commits the checkpoint covers: replay must
    # restore the DV descriptors from the checkpoint parquet alone
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    write_delta_commit(_df(spark, 400, 410), table)
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == [i for i in range(410) if i % 7 != 0 or i >= 400]


def test_optimize_materializes_dvs(spark, table):
    delete_delta, _ = _dv_imports()
    write_delta_commit(_df(spark, 0, 600).repartition(6), table)
    delete_delta(spark, table, "id % 2 = 1")
    v = optimize_delta(spark, table)
    from deg04_local_data_lake_spark.sources.delta_log import _replay

    live, _m = _replay(table, v)
    assert not any(a.get("deletionVector") for a in live.values())
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(0, 600, 2))


def test_vacuum_keeps_referenced_dv_files(spark, table):
    delete_delta, _ = _dv_imports()
    # force on-disk DV storage with a large-cardinality delete
    write_delta_commit(_df(spark, 0, 60000).coalesce(1), table)
    delete_delta(spark, table, "id % 2 = 0")
    dv_dir = os.path.join(table, "deletion_vectors")
    assert os.path.isdir(dv_dir) and os.listdir(dv_dir)
    deleted = vacuum_delta(table, grace_ms=0)  # writers quiesced
    assert not any(p.endswith(".bin") for p in deleted)
    assert read_delta_log(spark, table).count() == 30000
    # after OPTIMIZE drops every version that referenced the DV... the
    # bitmap file stays only while some replayable snapshot needs it
    optimize_delta(spark, table)
    # truncate history before the optimize so earlier snapshots (and the
    # DV they reference) become unreachable
    write_delta_checkpoint(table)
    for v in (0, 1, 2):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    deleted = vacuum_delta(table, grace_ms=0)
    assert any(p.endswith(".bin") for p in deleted)
    assert read_delta_log(spark, table).count() == 30000


def test_change_feed_sees_dv_delete(spark, table):
    delete_delta, read_delta_changes = _dv_imports()
    write_delta_commit(_df(spark, 0, 100), table)
    delete_delta(spark, table, "id < 10")
    ch = read_delta_changes(spark, table, 0, 1)
    rows = ch.collect()
    assert all(r._change_type == "delete" for r in rows)
    assert sorted(r.id for r in rows) == list(range(10))


def test_inline_dv_round_trip(spark, table):
    delete_delta, _ = _dv_imports()
    write_delta_commit(_df(spark, 0, 100).coalesce(1), table)
    delete_delta(spark, table, "id = 42")
    from deg04_local_data_lake_spark.sources.delta_log import _replay

    live, _m = _replay(table, 1)
    (add,) = live.values()
    # a 1-row bitmap is far under the inline threshold
    assert add["deletionVector"]["storageType"] == "i"
    assert add["deletionVector"]["cardinality"] == 1
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == [i for i in range(100) if i != 42]


# ------------------------------------------------------------- RESTORE


def test_restore_rolls_back_overwrite(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import restore_delta

    write_delta_commit(_df(spark, 0, 100), table)
    write_delta_commit(_df(spark, 0, 10), table, mode="overwrite")
    v = restore_delta(spark, table, 0)
    assert v == 2
    assert read_delta_log(spark, table).count() == 100
    # history intact: the pre-restore state is still reachable
    assert read_delta_log(spark, table, 1).count() == 10
    assert delta_history(table)[-1]["operation"] == "RESTORE"


def test_restore_restores_deletion_vector_state(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        delete_delta,
        restore_delta,
    )

    write_delta_commit(_df(spark, 0, 200).coalesce(1), table)
    delete_delta(spark, table, "id < 50")       # v1: DV on the file
    delete_delta(spark, table, "id >= 150")     # v2: merged DV
    v = restore_delta(spark, table, 1)
    assert v == 3
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(50, 200))
    # restore to pre-delete state drops the DV entirely
    restore_delta(spark, table, 0)
    assert read_delta_log(spark, table).count() == 200


def test_restore_after_vacuum_raises(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import restore_delta

    write_delta_commit(_df(spark, 0, 100).coalesce(1), table)
    from deg04_local_data_lake_spark.sources.delta_log import _replay

    (v0_path,) = _replay(table, 0)[0]
    write_delta_commit(_df(spark, 0, 10), table, mode="overwrite")
    # simulate a retention-expired vacuum reclaiming version 0's file
    os.remove(os.path.join(table, v0_path))
    with pytest.raises(FileNotFoundError, match="VACUUMed"):
        restore_delta(spark, table, 0)


def test_restore_to_current_is_noop(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import restore_delta

    write_delta_commit(_df(spark, 0, 10), table)
    assert restore_delta(spark, table, 0) == 0
    assert delta_versions(table) == [0]


# -------------------------------------------------------------- UPDATE


def test_update_rewrites_only_matched_rows(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import update_delta

    write_delta_commit(_df(spark, 0, 1000).repartition(4), table)
    v = update_delta(
        spark, table, "id % 100 = 7", {"v": "v + 0.5"}
    )
    assert v == 1
    rows = {r.id: r.v for r in read_delta_log(spark, table).collect()}
    assert len(rows) == 1000
    for i in range(1000):
        assert rows[i] == i * 2 + (0.5 if i % 100 == 7 else 0.0)
    # single atomic commit: DELETE-side DV adds + UPDATE-side new adds
    assert delta_history(table)[-1]["operation"] == "UPDATE"
    # time travel unaffected
    assert read_delta_log(spark, table, 0).count() == 1000


def test_update_nothing_is_noop(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import update_delta

    write_delta_commit(_df(spark, 0, 10), table)
    assert update_delta(spark, table, "id > 100", {"v": "0.0"}) == 0
    assert delta_versions(table) == [0]


def test_update_unknown_column_raises(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import update_delta

    write_delta_commit(_df(spark, 0, 10), table)
    with pytest.raises(ValueError, match="unknown columns"):
        update_delta(spark, table, "id = 1", {"nope": "1"})


def test_update_composes_with_prior_deletes(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        delete_delta,
        update_delta,
    )

    write_delta_commit(_df(spark, 0, 100).coalesce(1), table)
    delete_delta(spark, table, "id < 20")
    update_delta(spark, table, "id < 40", {"v": "-1.0"})
    rows = {r.id: r.v for r in read_delta_log(spark, table).collect()}
    # deleted rows stay deleted; only surviving matches update
    assert sorted(rows) == list(range(20, 100))
    assert all(rows[i] == -1.0 for i in range(20, 40))
    assert all(rows[i] == i * 2.0 for i in range(40, 100))


def test_dv_commits_upgrade_protocol(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import delete_delta

    write_delta_commit(_df(spark, 0, 50), table)
    delete_delta(spark, table, "id = 1")
    actions = []
    import json as _json

    with open(os.path.join(table, "_delta_log", f"{1:020d}.json")) as f:
        actions = [_json.loads(line) for line in f if line.strip()]
    protos = [a["protocol"] for a in actions if "protocol" in a]
    assert protos and protos[0]["minReaderVersion"] == 3
    assert "deletionVectors" in protos[0]["readerFeatures"]


# --------------------------------------------- plan-shape guarantees


def test_dv_read_filter_is_map_only(spark, table):
    """The deletion-vector read filter must add NO shuffle: bitmaps are
    broadcast and applied in a mapInPandas stage fused onto the scan.
    At 100 TB a DV'd table must scan exactly like an unDV'd one plus a
    vectorized per-batch mask."""
    from deg04_local_data_lake_spark.sources.delta_log import delete_delta

    write_delta_commit(_df(spark, 0, 2000).repartition(4), table)
    delete_delta(spark, table, "id % 3 = 0")
    df = read_delta_log(spark, table)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    assert df.count() == 2000 - 667


# ------------------------------------------- streaming source over log


def _start_stream(spark, table, name, **opts):
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    try:
        spark.dataSource.register(make_delta_stream_source())
    except Exception:
        pass
    r = spark.readStream.format("deg04_delta_stream").option("path", table)
    for k, v in opts.items():
        r = r.option(k, v)
    return (
        r.load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def test_delta_stream_source_one_batch_per_commit(spark, table):
    write_delta_commit(_df(spark, 0, 30), table)
    write_delta_commit(_df(spark, 30, 60), table)
    write_delta_commit(_df(spark, 60, 90), table)
    q = _start_stream(spark, table, "dls_batches", maxVersionsPerBatch=1)
    try:
        q.processAllAvailable()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
    assert len(batches) == 3
    got = sorted(r.id for r in spark.table("dls_batches").collect())
    assert got == list(range(90))


def test_delta_stream_source_sees_new_commits(spark, table):
    write_delta_commit(_df(spark, 0, 10), table)
    q = _start_stream(spark, table, "dls_incr")
    try:
        q.processAllAvailable()
        assert spark.table("dls_incr").count() == 10
        # a commit made WHILE the stream runs is picked up incrementally
        write_delta_commit(_df(spark, 10, 25), table)
        q.processAllAvailable()
        assert spark.table("dls_incr").count() == 25
    finally:
        q.stop()


def test_delta_stream_source_fails_on_change_commit(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import delete_delta
    from pyspark.errors.exceptions.captured import StreamingQueryException

    write_delta_commit(_df(spark, 0, 20), table)
    delete_delta(spark, table, "id < 5")
    q = _start_stream(spark, table, "dls_fail")
    try:
        with pytest.raises(StreamingQueryException):
            q.processAllAvailable()
    finally:
        q.stop()


def test_delta_stream_source_skip_change_commits(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import update_delta

    write_delta_commit(_df(spark, 0, 20), table)
    update_delta(spark, table, "id < 5", {"v": "0.0"})
    write_delta_commit(_df(spark, 20, 30), table)
    q = _start_stream(
        spark, table, "dls_skip", skipChangeCommits="true"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the UPDATE commit is skipped whole: original values, plus the
    # post-update append
    rows = {r.id: r.v for r in spark.table("dls_skip").collect()}
    assert sorted(rows) == list(range(30))
    assert all(rows[i] == i * 2.0 for i in range(30))


# ------------------------------------------------------ column mapping


def test_rename_column_is_metadata_only(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        rename_delta_column,
    )

    write_delta_commit(_df(spark, 0, 100), table)
    files_before = sorted(read_delta_log(spark, table).inputFiles())
    v = rename_delta_column(spark, table, {"v": "price"})
    assert v == 1
    cur = read_delta_log(spark, table)
    assert cur.columns == ["id", "price"]
    assert sorted(cur.inputFiles()) == files_before  # zero data rewritten
    rows = {r.id: r.price for r in cur.collect()}
    assert rows[7] == 14.0 and len(rows) == 100
    # time travel reads the OLD logical names
    assert read_delta_log(spark, table, 0).columns == ["id", "v"]


def test_append_and_update_after_rename(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        rename_delta_column,
        update_delta,
    )

    write_delta_commit(_df(spark, 0, 50), table)
    rename_delta_column(spark, table, {"v": "price"})
    # appends speak the NEW logical names; files store physical names
    more = spark.range(50, 60).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS price"
    )
    write_delta_commit(more, table)
    assert read_delta_log(spark, table).count() == 60
    update_delta(spark, table, "price > 100.0", {"price": "price + 1"})
    rows = {r.id: r.price for r in read_delta_log(spark, table).collect()}
    assert rows[55] == 111.0 and rows[10] == 20.0


def test_optimize_and_skipping_after_rename(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        rename_delta_column,
    )

    write_delta_commit(_df(spark, 0, 400).repartition(8), table)
    rename_delta_column(spark, table, {"v": "price"})
    v = optimize_delta(
        spark, table, target_file_bytes=1200, cluster_by=["price"]
    )
    cur = read_delta_log(spark, table)
    assert cur.columns == ["id", "price"]
    assert cur.count() == 400
    # data skipping under the LOGICAL name
    pruned = read_delta_log(
        spark, table, version=v, column_ranges={"price": (0.0, 10.0)}
    )
    assert len(pruned.inputFiles()) < len(cur.inputFiles())


def test_rename_partition_column_raises(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        rename_delta_column,
    )

    df = spark.range(0, 20).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS part"
    )
    write_delta_commit(df, table, partition_by=["part"])
    with pytest.raises(ValueError, match="partition column"):
        rename_delta_column(spark, table, {"part": "bucket"})
    with pytest.raises(ValueError, match="no such column"):
        rename_delta_column(spark, table, {"nope": "x"})


def test_overwrite_after_rename_preserves_mapping(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        rename_delta_column,
    )

    write_delta_commit(_df(spark, 0, 30), table)
    rename_delta_column(spark, table, {"v": "price"})
    # overwrite keeps 'price' plus adds a new column
    newdf = spark.range(0, 10).selectExpr(
        "id", "CAST(id AS DOUBLE) AS price", "CAST(id AS STRING) AS tag"
    )
    write_delta_commit(newdf, table, mode="overwrite")
    cur = read_delta_log(spark, table)
    assert cur.columns == ["id", "price", "tag"]
    assert {r.id: r.price for r in cur.collect()}[3] == 3.0
    # a second rename still works (mapping metadata survived overwrite)
    rename_delta_column(spark, table, {"tag": "label"})
    assert read_delta_log(spark, table).columns == ["id", "price", "label"]


def test_optimize_preserves_partitioning(spark, table):
    df = spark.range(0, 60).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS part"
    )
    write_delta_commit(df.repartition(6), table, partition_by=["part"])
    optimize_delta(spark, table)
    pruned = read_delta_log(spark, table, partition_filter={"part": "1"})
    got = sorted(r.id for r in pruned.collect())
    assert got == [i for i in range(60) if i % 3 == 1]


def test_checkpoint_persists_protocol(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        _replay_protocol,
        delete_delta,
    )

    write_delta_commit(_df(spark, 0, 50), table)
    delete_delta(spark, table, "id = 1")  # upgrades protocol for DVs
    write_delta_checkpoint(table)
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    # protocol survives truncation via the checkpoint parquet
    proto = _replay_protocol(table, 1)
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    assert read_delta_log(spark, table).count() == 49


# ---------------------------------------------------- CHECK constraints


def test_constraint_rejects_bad_writes(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        add_delta_constraint,
        drop_delta_constraint,
        update_delta,
    )

    write_delta_commit(_df(spark, 0, 50), table)
    v = add_delta_constraint(spark, table, "v_nonneg", "v >= 0")
    assert v == 1
    # good append passes; bad append fails LOUDLY and commits nothing
    write_delta_commit(_df(spark, 50, 60), table)
    bad = spark.range(0, 3).selectExpr("id", "CAST(-5 AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="v_nonneg"):
        write_delta_commit(bad, table)
    assert read_delta_log(spark, table).count() == 60
    # UPDATE is bound by the same constraint
    with pytest.raises(ValueError, match="v_nonneg"):
        update_delta(spark, table, "id < 5", {"v": "-1.0"})
    # constraints survive an overwrite (table property, not content)
    write_delta_commit(_df(spark, 0, 10), table, mode="overwrite")
    with pytest.raises(ValueError, match="v_nonneg"):
        write_delta_commit(bad, table)
    # dropped -> the same write is accepted
    drop_delta_constraint(spark, table, "v_nonneg")
    write_delta_commit(bad, table)
    assert read_delta_log(spark, table).count() == 13


def test_add_constraint_validates_existing_rows(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        add_delta_constraint,
    )

    write_delta_commit(_df(spark, 0, 20), table)
    with pytest.raises(ValueError, match="existing rows violate"):
        add_delta_constraint(spark, table, "small", "v < 10")
    assert delta_versions(table) == [0]
    add_delta_constraint(spark, table, "ok", "v >= 0")
    with pytest.raises(ValueError, match="already exists"):
        add_delta_constraint(spark, table, "ok", "v >= 0")


def test_constraint_null_is_violation(spark, table):
    # NULL predicate results are treated as violations (null-safe
    # comparison to TRUE), the conservative direction for data quality
    from deg04_local_data_lake_spark.sources.delta_log import (
        add_delta_constraint,
    )

    write_delta_commit(_df(spark, 0, 5), table)
    add_delta_constraint(spark, table, "v_known", "v >= 0")
    nulls = spark.createDataFrame(
        [(100, None)], "id long, v double"
    )
    with pytest.raises(ValueError, match="v_known"):
        write_delta_commit(nulls, table)


def test_delta_stream_source_column_mapped_table(spark, table):
    """Streaming a column-mapped table must bind parquet's PHYSICAL
    column names back to the declared logical schema (round-6 ADVICE —
    raw batches previously misbound after RENAME COLUMN)."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        rename_delta_column,
    )

    write_delta_commit(_df(spark, 0, 40), table)
    rename_delta_column(spark, table, {"v": "price"})
    write_delta_commit(
        spark.range(40, 50).selectExpr(
            "id", "CAST(id * 2 AS DOUBLE) AS price"
        ),
        table,
    )
    q = _start_stream(spark, table, "dls_colmap")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("dls_colmap")
    assert out.columns == ["id", "price"]
    rows = {r.id: r.price for r in out.collect()}
    assert sorted(rows) == list(range(50))
    assert rows[7] == 14.0 and rows[45] == 90.0


def test_delta_stream_source_checkpoint_restart_no_duplicates(
    spark, table, tmp_path
):
    """A fresh query resuming the SAME checkpoint must emit only the
    commits made after the stop — never replay committed versions
    (round-6 ADVICE: the reconstructed reader's cursor could regress
    below the checkpointed offset and duplicate earlier commits)."""
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    try:
        spark.dataSource.register(make_delta_stream_source())
    except Exception:
        pass
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def drain():
        q = (
            spark.readStream.format("deg04_delta_stream")
            .option("path", table)
            .option("maxVersionsPerBatch", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_delta_commit(_df(spark, 0, 20), table)
    write_delta_commit(_df(spark, 20, 40), table)
    drain()
    write_delta_commit(_df(spark, 40, 60), table)
    write_delta_commit(_df(spark, 60, 80), table)
    drain()
    got = sorted(r.id for r in spark.read.parquet(sink).collect())
    assert got == list(range(80))  # each row exactly once


# ------------------------------------------------- generated columns


def test_generated_column_materialized_and_validated(spark, table):
    import json as _json

    from deg04_local_data_lake_spark.sources.delta_log import (
        _commit_file,
    )

    # creation declares the generated column; df omits it → materialized
    write_delta_commit(
        _df(spark, 0, 20),
        table,
        generated_columns={"v_half": "v / 2"},
    )
    got = read_delta_log(spark, table)
    assert sorted(got.columns) == ["id", "v", "v_half"]
    assert all(r.v_half == r.v / 2 for r in got.collect())
    # the expression is in the schemaString metadata; protocol is writer 4
    actions = [
        _json.loads(line)
        for line in open(_commit_file(table, 0))
        if line.strip()
    ]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    doc = _json.loads(meta["schemaString"])
    gen_field = next(f for f in doc["fields"] if f["name"] == "v_half")
    assert gen_field["metadata"]["delta.generationExpression"] == "v / 2"
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minWriterVersion"] == 4

    # append omitting the column materializes it too
    write_delta_commit(_df(spark, 20, 30), table)
    got = read_delta_log(spark, table)
    assert got.count() == 30
    assert all(r.v_half == r.v / 2 for r in got.collect())

    # append supplying CORRECT values passes
    ok = spark.range(30, 35).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v", "CAST(id AS DOUBLE) AS v_half"
    )
    write_delta_commit(ok, table)
    assert read_delta_log(spark, table).count() == 35

    # append supplying WRONG values is rejected
    bad = spark.range(35, 40).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v", "CAST(0.0 AS DOUBLE) AS v_half"
    )
    with pytest.raises(ValueError, match="generated column 'v_half'"):
        write_delta_commit(bad, table)
    # declaring on append is an error
    with pytest.raises(ValueError, match="creation or overwrite"):
        write_delta_commit(
            _df(spark, 40, 45), table, generated_columns={"x": "id"}
        )


def test_generated_column_survives_overwrite_and_update(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import update_delta

    write_delta_commit(
        _df(spark, 0, 10), table, generated_columns={"v_half": "v / 2"}
    )
    # plain overwrite carries the declaration forward and materializes
    write_delta_commit(_df(spark, 0, 50), table, mode="overwrite")
    got = read_delta_log(spark, table)
    assert got.count() == 50 and all(
        r.v_half == r.v / 2 for r in got.collect()
    )
    # UPDATE on the base column recomputes the generated one
    update_delta(spark, table, "id < 5", {"v": "v + 100"})
    got = {r.id: r for r in read_delta_log(spark, table).collect()}
    assert got[2].v == 104.0 and got[2].v_half == 52.0
    assert got[40].v == 80.0 and got[40].v_half == 40.0


# ------------------------------------------------- identity columns


def test_identity_column_assigns_contiguous_blocks(spark, table):
    import json as _json

    from deg04_local_data_lake_spark.sources.delta_log import (
        _commit_file,
    )

    write_delta_commit(
        _df(spark, 0, 20),
        table,
        identity_columns={"row_sk": {"start": 100, "step": 10}},
    )
    got = read_delta_log(spark, table)
    sks = sorted(r.row_sk for r in got.collect())
    # contiguous block from start, step-aligned, unique
    assert sks == [100 + 10 * i for i in range(20)]
    # protocol is writer 6; spec + high water mark in field metadata
    actions = [
        _json.loads(line)
        for line in open(_commit_file(table, 0))
        if line.strip()
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minWriterVersion"] == 6
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    fld = next(
        f
        for f in _json.loads(meta["schemaString"])["fields"]
        if f["name"] == "row_sk"
    )
    md = fld["metadata"]
    assert md["delta.identity.start"] == 100
    assert md["delta.identity.step"] == 10
    assert md["delta.identity.highWaterMark"] == 100 + 10 * 19

    # append omits the column: fresh block past the mark, and the
    # append commit carries a metaData action advancing the mark
    write_delta_commit(_df(spark, 20, 35), table)
    sks = sorted(r.row_sk for r in read_delta_log(spark, table).collect())
    assert sks == [100 + 10 * i for i in range(35)]
    actions1 = [
        _json.loads(line)
        for line in open(_commit_file(table, 1))
        if line.strip()
    ]
    meta1 = next(a["metaData"] for a in actions1 if "metaData" in a)
    fld1 = next(
        f
        for f in _json.loads(meta1["schemaString"])["fields"]
        if f["name"] == "row_sk"
    )
    assert fld1["metadata"]["delta.identity.highWaterMark"] == 100 + 10 * 34

    # GENERATED ALWAYS: supplying the column is rejected
    bad = spark.range(50, 55).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v", "id AS row_sk"
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta_commit(bad, table)
    # declaring on append is an error
    with pytest.raises(ValueError, match="creation or overwrite"):
        write_delta_commit(
            _df(spark, 40, 45), table, identity_columns={"x": {}}
        )


def test_identity_by_default_and_update_guard(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import update_delta

    write_delta_commit(
        _df(spark, 0, 10),
        table,
        identity_columns={
            "sk": {"start": 1, "step": 1, "allow_explicit": True}
        },
    )
    # explicit insert allowed; mark advances past the supplied max
    explicit = spark.range(10, 15).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v", "id * 100 AS sk"
    )
    write_delta_commit(explicit, table)
    write_delta_commit(_df(spark, 15, 18), table)  # generated again
    rows = {r.id: r.sk for r in read_delta_log(spark, table).collect()}
    assert rows[14] == 1400
    # generated values resume beyond the explicit ones — no collision
    assert min(rows[i] for i in (15, 16, 17)) > 1400
    assert len(set(rows.values())) == 18  # all unique
    # identity is immutable under UPDATE
    with pytest.raises(ValueError, match="identity column"):
        update_delta(spark, table, "id = 1", {"sk": "999"})


def test_identity_survives_overwrite_monotonically(spark, table):
    write_delta_commit(
        _df(spark, 0, 12), table, identity_columns={"sk": {}}
    )
    first = {r.sk for r in read_delta_log(spark, table).collect()}
    # an overwrite rewrites content but never reuses identity values
    write_delta_commit(_df(spark, 0, 6), table, mode="overwrite")
    second = {r.sk for r in read_delta_log(spark, table).collect()}
    assert first & second == set()
    assert min(second) > max(first)


# ------------------------------------------------- OPTIMIZE ZORDER


def test_zorder_prunes_on_every_dimension(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        _replay,
        _stats_skip,
        optimize_delta,
    )

    # a 100x100 grid, shuffled: neither dimension is naturally clustered
    grid = spark.range(10000).selectExpr(
        "CAST(id % 100 AS LONG) AS x",
        "CAST(id DIV 100 AS LONG) AS y",
        "id AS payload",
    ).repartition(8)
    write_delta_commit(grid, table)
    # ~24 output files regardless of compression variance: each file
    # covers ~10 of 256 z-cells, so its constant top z-bits pin x (and
    # y) to a narrow rank window — the margin the skip assert needs
    pre_live, _m0 = _replay(table, 0)
    total = sum(a.get("size", 0) for a in pre_live.values())
    v = optimize_delta(
        spark, table, target_file_bytes=max(1, total // 24),
        zorder_by=["x", "y"],
    )
    live, _meta = _replay(table, v)
    assert len(live) >= 16  # the rewrite actually split files

    def n_skipped(ranges):
        return sum(1 for a in live.values() if _stats_skip(a, ranges))

    # a narrow predicate on EITHER dimension proves most files out
    assert n_skipped({"x": (10, 15)}) > len(live) // 2
    assert n_skipped({"y": (80, 85)}) > len(live) // 2
    # content unchanged, dataChange=false commit
    got = read_delta_log(spark, table)
    assert got.count() == 10000
    assert got.agg({"payload": "sum"}).first()[0] == sum(range(10000))
    # both-clustering flavors refuse to combine
    with pytest.raises(ValueError, match="not both"):
        optimize_delta(spark, table, cluster_by=["x"], zorder_by=["y"])
    write_delta_commit(
        spark.range(5).selectExpr("CAST(id AS STRING) AS s"), table,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="numeric"):
        optimize_delta(spark, table, zorder_by=["s"])


# --------------------------------------------------- SHALLOW CLONE


def test_shallow_clone_zero_copy_reads_equal(spark, tmp_path):
    from deg04_local_data_lake_spark.sources.delta_log import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta_commit(_df(spark, 0, 100), src)
    write_delta_commit(_df(spark, 100, 150), src)
    assert clone_delta(spark, src, dst) == 0
    # zero data files under the clone — only the log exists
    data_files = [
        f for root, _d, fs in os.walk(dst) for f in fs
        if f.endswith(".parquet") and "_delta_log" not in root
    ]
    assert data_files == []
    assert sorted(r.id for r in read_delta_log(spark, dst).collect()) == list(
        range(150)
    )


def test_shallow_clone_evolves_independently(spark, tmp_path):
    from deg04_local_data_lake_spark.sources.delta_log import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta_commit(_df(spark, 0, 50), src)
    clone_delta(spark, src, dst)
    # append to the clone: mixes relative files with absolute references
    write_delta_commit(_df(spark, 50, 60), dst)
    assert read_delta_log(spark, dst).count() == 60
    assert read_delta_log(spark, src).count() == 50
    # append to the source AFTER the clone: clone must not see it
    write_delta_commit(_df(spark, 1000, 1100), src)
    assert read_delta_log(spark, dst).count() == 60


def test_shallow_clone_partitioned_prunes_and_appends(spark, tmp_path):
    from deg04_local_data_lake_spark.sources.delta_log import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(100).selectExpr("id", "CAST(id % 4 AS LONG) AS p")
    write_delta_commit(df, src, partition_by=["p"])
    clone_delta(spark, src, dst)
    got = read_delta_log(spark, dst, partition_filter={"p": 2})
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(100) if i % 4 == 2
    ]
    # partition columns derive correctly from the SOURCE's hive layout
    assert {r.p for r in got.collect()} == {2}
    write_delta_commit(
        spark.range(100, 120).selectExpr("id", "CAST(id % 4 AS LONG) AS p"),
        dst,
        partition_by=["p"],
    )
    both = read_delta_log(spark, dst, partition_filter={"p": 2})
    assert sorted(r.id for r in both.collect()) == [
        i for i in range(120) if i % 4 == 2
    ]


def test_shallow_clone_carries_deletion_vectors(spark, tmp_path):
    from deg04_local_data_lake_spark.sources.delta_log import (
        clone_delta,
        delete_delta,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta_commit(_df(spark, 0, 1000).repartition(2), src)
    from pyspark.sql import functions as F

    delete_delta(spark, src, F.col("id") < 300)
    clone_delta(spark, src, dst)
    assert sorted(r.id for r in read_delta_log(spark, dst).collect()) == list(
        range(300, 1000)
    )
    # deleting MORE rows on the clone must not affect the source
    delete_delta(spark, dst, F.col("id") >= 900)
    assert read_delta_log(spark, dst).count() == 600
    assert read_delta_log(spark, src).count() == 700


def test_vacuum_on_clone_never_reclaims_source_files(spark, tmp_path):
    from deg04_local_data_lake_spark.sources.delta_log import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta_commit(_df(spark, 0, 100), src)
    clone_delta(spark, src, dst)
    # overwrite the clone so every absolute reference becomes dead there
    write_delta_commit(_df(spark, 0, 5), dst, mode="overwrite")
    assert vacuum_delta(dst, grace_ms=0) == []  # nothing of its own to reclaim
    assert read_delta_log(spark, src).count() == 100  # source intact


def test_shallow_clone_version_as_of_and_target_guard(spark, tmp_path):
    from deg04_local_data_lake_spark.sources.delta_log import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta_commit(_df(spark, 0, 10), src)
    write_delta_commit(_df(spark, 10, 30), src)
    clone_delta(spark, src, dst, version=0)
    assert read_delta_log(spark, dst).count() == 10
    with pytest.raises(FileExistsError, match="already has a Delta log"):
        clone_delta(spark, src, dst)


# ---------------------------------------------------------------- races


class _Race:
    """Interleave a competitor commit at the version the writer under
    test is about to claim — the deterministic simulation of two
    processes racing the log store's put-if-absent."""

    def __init__(self, competitor_actions, times=1):
        import deg04_local_data_lake_spark.sources.delta_log as dl

        self.dl = dl
        self.orig = dl._try_publish_commit
        self.actions = competitor_actions
        self.times = times
        self.won = []

    def __enter__(self):
        def racing(table, version, actions):
            if self.times > 0:
                self.times -= 1
                assert self.orig(table, version, self.actions)
                self.won.append(version)
            return self.orig(table, version, actions)

        self.dl._try_publish_commit = racing
        return self

    def __exit__(self, *exc):
        self.dl._try_publish_commit = self.orig


def _blind_append_actions(spark, table, lo, hi):
    import deg04_local_data_lake_spark.sources.delta_log as dl

    adds = dl._stage_files(_df(spark, lo, hi), table, 999, None)
    return adds + [
        {"commitInfo": {"operation": "WRITE", "operationParameters": {"mode": "append"}}}
    ]


def test_append_racing_blind_append_rebases(spark, table):
    write_delta_commit(_df(spark, 0, 10), table)
    comp = _blind_append_actions(spark, table, 100, 120)
    with _Race(comp) as race:
        v = write_delta_commit(_df(spark, 10, 20), table)
    assert race.won == [1]  # competitor claimed v1 under us
    assert v == 2  # we rebased and committed after it
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(20)) + list(range(100, 120))


def test_append_racing_metadata_change_conflicts(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        ConcurrentModificationError,
        _replay,
    )

    write_delta_commit(_df(spark, 0, 10), table)
    _live, meta = _replay(table, 0)
    new_meta = dict(meta)
    new_meta["configuration"] = {
        "delta.constraints.positive": "v >= 0.0"
    }
    comp = [
        {"metaData": new_meta},
        {"commitInfo": {"operation": "ADD CONSTRAINT"}},
    ]
    with _Race(comp):
        with pytest.raises(ConcurrentModificationError, match="metadata"):
            write_delta_commit(_df(spark, 10, 20), table)
    # the competitor's commit stands; ours never landed
    assert delta_versions(table) == [0, 1]
    assert read_delta_log(spark, table).count() == 10


def test_delete_racing_append_conflicts(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        ConcurrentModificationError,
        delete_delta,
    )
    from pyspark.sql import functions as F

    write_delta_commit(_df(spark, 0, 10), table)
    comp = _blind_append_actions(spark, table, 100, 110)
    with _Race(comp):
        with pytest.raises(ConcurrentModificationError, match="concurrent append"):
            delete_delta(spark, table, F.col("id") < 5)
    # nothing deleted; competitor rows present
    assert read_delta_log(spark, table).count() == 20


def test_optimize_racing_blind_append_rebases(spark, table):
    write_delta_commit(_df(spark, 0, 10), table)
    write_delta_commit(_df(spark, 10, 20), table)
    comp = _blind_append_actions(spark, table, 100, 110)
    with _Race(comp) as race:
        v = optimize_delta(spark, table)
    assert race.won == [2] and v == 3
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(20)) + list(range(100, 110))


def test_optimize_racing_remove_of_input_conflicts(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        ConcurrentModificationError,
        _replay,
    )

    write_delta_commit(_df(spark, 0, 10), table)
    live, _meta = _replay(table, 0)
    victim = sorted(live)[0]
    comp = [
        {"remove": {"path": victim, "deletionTimestamp": 0, "dataChange": True}},
        {"commitInfo": {"operation": "DELETE"}},
    ]
    with _Race(comp):
        with pytest.raises(ConcurrentModificationError, match="concurrently removed"):
            optimize_delta(spark, table)


def test_merge_racing_append_conflicts(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        ConcurrentModificationError,
    )

    write_delta_commit(_df(spark, 0, 10), table)
    comp = _blind_append_actions(spark, table, 100, 110)
    with _Race(comp):
        with pytest.raises(ConcurrentModificationError, match="stale snapshot"):
            merge_delta(spark, table, _df(spark, 5, 15), key="id")
    assert read_delta_log(spark, table).count() == 20


def test_drop_constraint_racing_append_rebases(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        add_delta_constraint,
        drop_delta_constraint,
    )

    write_delta_commit(_df(spark, 0, 10), table)
    add_delta_constraint(spark, table, "nonneg", "v >= 0.0")
    comp = _blind_append_actions(spark, table, 100, 110)
    with _Race(comp) as race:
        v = drop_delta_constraint(spark, table, "nonneg")
    assert race.won == [2] and v == 3
    assert read_delta_log(spark, table).count() == 20


def test_cleanup_delta_log_retention(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        cleanup_delta_log,
        vacuum_delta,
    )

    # no checkpoint yet: cleanup must refuse to touch anything
    write_delta_commit(_df(spark, 0, 10), table)
    assert cleanup_delta_log(table) == []

    write_delta_commit(_df(spark, 10, 20), table)
    write_delta_commit(_df(spark, 0, 5), table, mode="overwrite")
    write_delta_checkpoint(table)  # checkpoint at version 2
    write_delta_commit(_df(spark, 5, 8), table)

    assert cleanup_delta_log(table) == [0, 1]
    assert delta_versions(table) == [2, 3]
    # everything >= the checkpoint still reconstructs, values exact
    assert read_delta_log(spark, table, 2).count() == 5
    got = sorted(r.id for r in read_delta_log(spark, table).collect())
    assert got == list(range(8))
    # below the checkpoint: gone, loudly
    with pytest.raises(Exception):
        read_delta_log(spark, table, 1).count()
    # vacuum still computes its referenced set from the checkpoint floor
    doomed = vacuum_delta(table, grace_ms=0)
    assert all("part-" in p or p.endswith(".parquet") for p in doomed)
    assert read_delta_log(spark, table).count() == 8
    # idempotent
    assert cleanup_delta_log(table) == []


def test_append_schema_enforcement_and_merge(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        cleanup_delta_log as _unused,  # noqa: F401
    )

    write_delta_commit(_df(spark, 0, 5), table)
    # extra column without mergeSchema: loud failure, nothing committed
    drifted = spark.range(5, 8).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v", "'x' AS tag"
    )
    with pytest.raises(ValueError, match="merge_schema"):
        write_delta_commit(drifted, table)
    # type change on an existing column: loud failure
    retyped = spark.range(5, 8).selectExpr("id", "'oops' AS v")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta_commit(retyped, table)
    assert delta_versions(table) == [0]
    # mergeSchema: new column lands, old files read it as NULL
    write_delta_commit(drifted, table, merge_schema=True)
    cur = read_delta_log(spark, table)
    assert [f.name for f in cur.schema.fields] == ["id", "v", "tag"]
    rows = {r.id: (r.v, r.tag) for r in cur.collect()}
    assert rows[0] == (0.0, None) and rows[5] == (10.0, "x")
    # a later subset append (missing the nullable new column) still works
    write_delta_commit(_df(spark, 8, 10), table)
    cur = read_delta_log(spark, table)
    assert cur.count() == 10
    assert cur.filter("tag IS NULL").count() == 7


def test_add_delta_columns_metadata_only(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import add_delta_columns

    write_delta_commit(_df(spark, 0, 5), table)
    with pytest.raises(ValueError, match="already exist"):
        add_delta_columns(table, {"v": "double"})
    with pytest.raises(ValueError, match="unsupported type"):
        add_delta_columns(table, {"x": "struct<a:int>"})
    v = add_delta_columns(table, {"tag": "string", "score": "long"})
    assert v == 1
    cur = read_delta_log(spark, table)
    assert [f.name for f in cur.schema.fields] == ["id", "v", "tag", "score"]
    assert cur.filter("tag IS NULL AND score IS NULL").count() == 5
    # append supplying the new columns passes the schema guard
    widened = spark.range(5, 8).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v", "'x' AS tag", "id AS score"
    )
    write_delta_commit(widened, table)
    assert read_delta_log(spark, table).filter("tag = 'x'").count() == 3
    # time travel below the ALTER keeps the old schema
    old = read_delta_log(spark, table, 0)
    assert [f.name for f in old.schema.fields] == ["id", "v"]


def test_drop_delta_columns_metadata_only(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        add_delta_constraint,
        drop_delta_columns,
    )

    tagged = spark.range(0, 6).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v", "CAST(id % 2 AS LONG) AS flag"
    )
    write_delta_commit(tagged, table)
    add_delta_constraint(spark, table, "nonneg", "v >= 0.0")
    with pytest.raises(ValueError, match="referenced by a CHECK"):
        drop_delta_columns(table, ["v"])
    with pytest.raises(ValueError, match="no such columns"):
        drop_delta_columns(table, ["nope"])
    v = drop_delta_columns(table, ["flag"])
    cur = read_delta_log(spark, table)
    assert [f.name for f in cur.schema.fields] == ["id", "v"]
    assert cur.count() == 6
    # time travel below the DROP still serves the column
    old = read_delta_log(spark, table, v - 1)
    assert "flag" in [f.name for f in old.schema.fields]
    assert old.filter("flag = 1").count() == 3
    # appends now reject the dropped column, accept the new shape
    with pytest.raises(ValueError, match="not in the table"):
        write_delta_commit(tagged, table)
    write_delta_commit(
        spark.range(6, 9).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS v"),
        table,
    )
    assert read_delta_log(spark, table).count() == 9


def test_add_column_with_default_materializes_on_writes(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import add_delta_columns

    write_delta_commit(_df(spark, 0, 4), table)
    with pytest.raises(ValueError, match="not being added"):
        add_delta_columns(table, {"s": "string"}, defaults={"other": "'x'"})
    add_delta_columns(
        table, {"status": "string", "rank": "long"},
        defaults={"status": "'new'"},
    )
    # subset append omitting both: default materializes, no-default is null
    write_delta_commit(_df(spark, 4, 6), table)
    # append supplying the column explicitly: the supplied value wins
    write_delta_commit(
        spark.range(6, 7).selectExpr(
            "id", "CAST(id*2 AS DOUBLE) AS v", "'old' AS status",
            "CAST(1 AS LONG) AS rank",
        ),
        table,
    )
    rows = {r.id: (r.status, r.rank) for r in read_delta_log(spark, table).collect()}
    assert all(rows[i] == (None, None) for i in range(4))   # history untouched
    assert all(rows[i] == ("new", None) for i in (4, 5))    # default applied
    assert rows[6] == ("old", 1)                            # explicit wins
    # the protocol commit carries the writer feature
    from deg04_local_data_lake_spark.sources.delta_log import _replay_protocol

    proto = _replay_protocol(table, 3)
    assert "allowColumnDefaults" in (proto.get("writerFeatures") or [])
    assert proto["minWriterVersion"] == 7


def test_timestamp_as_of_resolution(spark, table):
    write_delta_commit(_df(spark, 0, 10), table, commit_timestamp=1000)
    write_delta_commit(_df(spark, 10, 20), table, commit_timestamp=2000)
    write_delta_commit(_df(spark, 20, 30), table, commit_timestamp=3000)
    assert read_delta_log(spark, table, timestamp_as_of=2500).count() == 20
    assert read_delta_log(spark, table, timestamp_as_of=2000).count() == 20
    assert read_delta_log(spark, table, timestamp_as_of=99999).count() == 30
    with pytest.raises(ValueError, match="no commit at or before"):
        read_delta_log(spark, table, timestamp_as_of=500)
    with pytest.raises(ValueError, match="not both"):
        read_delta_log(spark, table, version=1, timestamp_as_of=2500)


def test_read_lake_table_timestamp_as_of(spark, table, tmp_path):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        write_iceberg_commit,
    )
    from deg04_local_data_lake_spark.sources.readers import read_lake_table

    write_delta_commit(_df(spark, 0, 10), table, commit_timestamp=1000)
    write_delta_commit(_df(spark, 10, 20), table, commit_timestamp=2000)
    assert read_lake_table(
        spark, table, fmt="delta", timestamp_as_of=1500
    ).count() == 10
    ice = str(tmp_path / "ice")
    write_iceberg_commit(_df(spark, 0, 10), ice, timestamp_ms=1000)
    write_iceberg_commit(_df(spark, 10, 20), ice, timestamp_ms=2000)
    assert read_lake_table(
        spark, ice, fmt="iceberg", timestamp_as_of=1500
    ).count() == 10


def test_untimestamped_mutation_resolves_after_timestamped_append(
    spark, table
):
    """An untimestamped DELETE after a timestamped append must resolve
    strictly AFTER it: asof=<append instant> returns the pre-delete
    state (delta-spark's monotonization rule; a 0-default would make
    the DELETE qualify for EVERY instant)."""
    from deg04_local_data_lake_spark.sources.delta_log import delete_delta

    write_delta_commit(_df(spark, 0, 10), table, commit_timestamp=1000)
    delete_delta(spark, table, "id < 5")  # untimestamped mutation
    assert read_delta_log(spark, table).count() == 5
    # asof the append instant: the full pre-delete state
    assert read_delta_log(spark, table, timestamp_as_of=1000).count() == 10
    # asof any later instant: the deleted state (carry-forward + 1)
    assert read_delta_log(spark, table, timestamp_as_of=1001).count() == 5


def test_rmw_ops_thread_commit_timestamp(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import (
        delete_delta,
        optimize_delta,
    )

    write_delta_commit(_df(spark, 0, 10), table, commit_timestamp=1000)
    delete_delta(spark, table, "id < 5", commit_timestamp=2000)
    optimize_delta(spark, table, commit_timestamp=3000)
    assert read_delta_log(spark, table, timestamp_as_of=1500).count() == 10
    assert read_delta_log(spark, table, timestamp_as_of=2500).count() == 5
    assert read_delta_log(spark, table, timestamp_as_of=9999).count() == 5


def test_nonmonotone_commit_timestamp_rejected(spark, table):
    from deg04_local_data_lake_spark.sources.delta_log import delete_delta

    write_delta_commit(_df(spark, 0, 10), table, commit_timestamp=2000)
    with pytest.raises(ValueError, match="strictly increasing"):
        write_delta_commit(_df(spark, 10, 20), table, commit_timestamp=2000)
    with pytest.raises(ValueError, match="strictly increasing"):
        delete_delta(spark, table, "id < 5", commit_timestamp=1500)
    # still exactly one version: the rejected commits published nothing
    assert delta_versions(table) == [0]


def test_drop_column_preserves_declared_protocol_features(spark, table):
    """DROP COLUMN emits a protocol action; it must MERGE into the
    declared feature set, not overwrite it — allowColumnDefaults
    declared by an earlier ADD COLUMN survives and its default still
    binds writers afterwards."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        _replay_protocol,
        add_delta_columns,
        drop_delta_columns,
    )

    write_delta_commit(_df(spark, 0, 5), table)
    add_delta_columns(table, {"tag": "string"}, defaults={"tag": "'x'"})
    drop_delta_columns(table, ["v"])
    proto = _replay_protocol(table, 2)
    assert "allowColumnDefaults" in (proto.get("writerFeatures") or [])
    assert "columnMapping" in (proto.get("readerFeatures") or [])
    assert "deletionVectors" in (proto.get("writerFeatures") or [])
    # the default is still LIVE: a write omitting `tag` materializes it
    write_delta_commit(spark.range(5, 7).selectExpr("id"), table)
    got = read_delta_log(spark, table).filter("id >= 5").collect()
    assert {r.tag for r in got} == {"x"}


def test_dv_commit_preserves_declared_protocol_features(spark, table):
    """A DV DELETE re-asserts the protocol; a static action here would
    wipe columnMapping activated by an earlier RENAME."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        _latest_version,
        _replay_protocol,
        delete_delta,
        rename_delta_column,
    )

    write_delta_commit(_df(spark, 0, 10), table)
    rename_delta_column(spark, table, {"v": "val"})
    delete_delta(spark, table, "id < 3")
    proto = _replay_protocol(table, _latest_version(table))
    assert "columnMapping" in (proto.get("readerFeatures") or [])
    assert "deletionVectors" in (proto.get("readerFeatures") or [])
    got = read_delta_log(spark, table)
    assert got.columns == ["id", "val"]
    assert got.count() == 7


def test_optimize_where_partition_scoped(spark, table):
    """OPTIMIZE ... WHERE: only the scoped partition's files are
    rewritten/tombstoned; the other partition's live set is untouched."""
    from deg04_local_data_lake_spark.sources.delta_log import _replay

    def pdf(lo, hi, p):
        return spark.range(lo, hi).selectExpr("id", f"'{p}' AS part")

    for i in range(3):  # 3 small appends per partition
        write_delta_commit(pdf(i * 10, i * 10 + 10, "a"), table,
                           partition_by=["part"])
        write_delta_commit(pdf(i * 10, i * 10 + 10, "b"), table,
                           partition_by=["part"])
    live_before, _ = _replay(table, 5)
    b_files_before = {
        p for p in live_before if "part=b" in p
    }
    v = optimize_delta(spark, table, partition_filter={"part": "a"})
    live_after, _ = _replay(table, v)
    b_files_after = {p for p in live_after if "part=b" in p}
    a_files_after = {p for p in live_after if "part=a" in p}
    assert b_files_after == b_files_before  # untouched out of scope
    assert len(a_files_after) < len(
        {p for p in live_before if "part=a" in p}
    )
    got = read_delta_log(spark, table)
    assert got.count() == 60
    assert got.filter("part = 'a'").count() == 30
    # filter on a non-partition column fails loudly
    with pytest.raises(ValueError, match="non-partition"):
        optimize_delta(spark, table, partition_filter={"id": "1"})
    # empty scope: no new commit
    assert optimize_delta(
        spark, table, partition_filter={"part": "zzz"}
    ) == v


def test_change_feed_update_pre_post_images(spark, table):
    """An UPDATE commit's CDF rows carry delta-spark's pre/post-image
    flavor, not anonymous delete/insert pairs."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        read_delta_changes,
        update_delta,
    )

    write_delta_commit(_df(spark, 0, 10), table)
    update_delta(spark, table, "id < 3", {"v": "v + 100.0"})
    ch = read_delta_changes(spark, table, 0, 1)
    got = {(r.id, r.v, r._change_type) for r in ch.collect()}
    expect = {(i, i * 2.0, "update_preimage") for i in range(3)} | {
        (i, i * 2.0 + 100.0, "update_postimage") for i in range(3)
    }
    assert got == expect


def test_checkpoint_preserves_metadata_configuration(spark, table):
    """Round-8 fix: pyarrow returns the checkpoint's map<string,string>
    columns as LISTS of (k, v) pairs — metaData.configuration must be
    normalized back to a dict or every configuration-gated feature
    (column mapping, constraints, CDF) breaks on the first
    post-checkpoint read/write."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        _latest_version,
        _replay,
        delete_delta,
        read_delta_log,
        rename_delta_column,
        write_delta_checkpoint,
        write_delta_commit,
    )

    write_delta_commit(_df(spark, 0, 100), table)
    rename_delta_column(spark, table, {"v": "val"})  # columnMapping on
    delete_delta(spark, table, "id % 7 = 0")  # DVs
    write_delta_checkpoint(table)
    _live, meta = _replay(table, _latest_version(table))
    assert isinstance(meta["configuration"], dict)
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    # post-checkpoint write + read both go through the replayed meta
    write_delta_commit(
        spark.range(100, 110).selectExpr(
            "id", "CAST(id * 3 AS DOUBLE) AS val"
        ),
        table,
    )
    got = read_delta_log(spark, table)
    assert got.columns == ["id", "val"]
    assert got.count() == 100 - 15 + 10


def test_merge_not_matched_by_source_delete(spark, table):
    """Unconditional WHEN NOT MATCHED BY SOURCE DELETE: the table must
    converge to exactly the source's key set."""
    write_delta_commit(_df(spark, 0, 10), table)
    # source: keep/update ids 2-6, insert 20
    src = spark.range(2, 7).selectExpr("id", "CAST(99 AS DOUBLE) AS v").union(
        spark.range(20, 21).selectExpr("id", "CAST(1 AS DOUBLE) AS v")
    )
    merge_delta(spark, table, src, "id", not_matched_by_source="delete")
    cur = {r.id: r.v for r in read_delta_log(spark, table).collect()}
    assert set(cur) == {2, 3, 4, 5, 6, 20}
    assert all(cur[i] == 99.0 for i in range(2, 7)) and cur[20] == 1.0
    # time travel to v0 unaffected (every merge is a plain commit)
    assert read_delta_log(spark, table, 0).count() == 10


def test_merge_by_source_condition_and_cdc_interplay(spark, table):
    """A CDC 'D' row counts as MATCHED (deletes its own key and shields
    it from the by-source leg — no double-processing), and the by-source
    condition limits deletion to the slice the source is authoritative
    for (even ids here)."""
    write_delta_commit(_df(spark, 0, 10), table)
    feed = spark.createDataFrame(
        [(0, None, "D"), (1, 50.0, "U")], "id long, v double, op string"
    )
    merge_delta(
        spark, table, feed, "id", op_col="op",
        not_matched_by_source="delete",
        not_matched_by_source_condition="id % 2 = 0",
    )
    cur = {r.id: r.v for r in read_delta_log(spark, table).collect()}
    # 0 deleted by its D row; 2,4,6,8 deleted by the conditional
    # by-source leg; odd ids survive untouched; 1 updated
    assert set(cur) == {1, 3, 5, 7, 9}
    assert cur[1] == 50.0
    assert all(cur[i] == i * 2.0 for i in (3, 5, 7, 9))


def test_merge_by_source_rejects_unknown_action(spark, table):
    write_delta_commit(_df(spark, 0, 3), table)
    src = _df(spark, 0, 1)
    with pytest.raises(ValueError, match="not_matched_by_source"):
        merge_delta(spark, table, src, "id", not_matched_by_source="update")


def test_shallow_clone_refuses_after_source_vacuum(spark, tmp_path):
    """Round 11: the source table has no registry of its clones, so its
    own VACUUM/retention can reclaim files a shallow clone references
    (delta-spark documents the same caveat). The clone's read must then
    refuse with the documented message — found leaking a raw
    PATH_NOT_FOUND AnalysisException out of the executor scan."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        clone_delta,
        cleanup_delta_log,
        read_delta_log,
        vacuum_delta,
        write_delta_checkpoint,
        write_delta_commit,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "id long, v double"
    ).coalesce(1)
    write_delta_commit(df, src)
    clone_delta(spark, src, dst)
    assert sorted(r.id for r in read_delta_log(spark, dst).collect()) == list(
        range(6)
    )
    # source moves on and reclaims: overwrite tombstones the referenced
    # file, cleanup truncates the version pinning it, vacuum removes it
    write_delta_commit(
        spark.createDataFrame([(9, 9.0)], "id long, v double"),
        src,
        mode="overwrite",
    )
    write_delta_checkpoint(src)
    cleanup_delta_log(src)
    assert vacuum_delta(src, grace_ms=0)  # the clone's file is gone
    with pytest.raises(FileNotFoundError, match="shallow clone"):
        read_delta_log(spark, dst).collect()


def test_shallow_clone_refuses_when_source_dv_reclaimed(spark, tmp_path):
    """The deletion-vector leg of the same contract: a clone rewrites
    the source's on-disk DV descriptors to absolute ``p`` storage, and
    a reclaimed DV file must refuse with the documented message, never
    a raw ENOENT out of the bitmap loader."""
    import glob
    import os

    from deg04_local_data_lake_spark.sources.delta_log import (
        clone_delta,
        delete_delta,
        read_delta_log,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(2000)], "id long, v double"
    ).coalesce(1)
    write_delta_commit(df, src)
    delete_delta(spark, src, "id % 2 = 0")  # big DV: lands on disk (u)
    clone_delta(spark, src, dst)
    assert read_delta_log(spark, dst).count() == 1000
    dvs = glob.glob(os.path.join(src, "deletion_vectors", "*.bin"))
    assert dvs, "expected an on-disk deletion vector"
    for p in dvs:
        os.remove(p)  # what a source-side VACUUM would do
    with pytest.raises(FileNotFoundError, match="shallow clone"):
        read_delta_log(spark, dst).count()
