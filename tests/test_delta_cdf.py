"""Commit-time change data feed (``delta.enableChangeDataFeed``):
UPDATE / DELETE / MERGE persist their change rows as parquet under
``_change_data/`` with ``cdc`` actions in the commit, and
``read_delta_changes`` serves those commits from the cdc files directly
— O(changed rows), no snapshot diff. These tests pin the protocol
behaviors: emission per operation, the apply identity (prev − preimages
− deletes + postimages + inserts == next, as multisets), snapshot-replay
invisibility, VACUUM retention coupling, cleanup truncation, and the
column-mapping interplay (cdc files store physical names)."""

from __future__ import annotations

import os
from collections import Counter

import pytest

import deg04_local_data_lake_spark.sources.delta_log as dl


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def _state(spark, table, version=None) -> Counter:
    return Counter(
        (r.id, r.v)
        for r in dl.read_delta_log(spark, table, version).collect()
    )


def _fold(prev: Counter, changes) -> Counter:
    out = Counter(prev)
    for r in changes:
        k = (r.id, r.v)
        if r._change_type in ("insert", "update_postimage"):
            out[k] += 1
        else:
            out[k] -= 1
    assert all(c >= 0 for c in out.values()), dict(out)
    return +out  # drop zero entries


def _cdc_count(table, version) -> int:
    return sum(1 for a in dl._read_commit(table, version) if "cdc" in a)


def test_enable_is_metadata_only_and_idempotent(spark, table):
    dl.write_delta_commit(_df(spark, [(1, 1.0)]), table)
    v = dl.enable_delta_cdf(table)
    assert v == 1
    assert dl.enable_delta_cdf(table) == 1  # already on: no new commit
    _live, meta = dl._replay(table, v)
    assert dl._cdf_enabled(meta)
    proto = dl._replay_protocol(table, v)
    assert "changeDataFeed" in (proto.get("writerFeatures") or [])
    # the property survives an overwrite (configuration carries forward)
    dl.write_delta_commit(_df(spark, [(2, 2.0)]), table, mode="overwrite")
    _live, meta = dl._replay(table, 2)
    assert dl._cdf_enabled(meta)


def test_update_delete_merge_emit_cdc_actions(spark, table):
    dl.write_delta_commit(_df(spark, [(i, float(i)) for i in range(10)]), table)
    dl.enable_delta_cdf(table)
    vu = dl.update_delta(spark, table, "id % 3 = 0", {"v": "v + 100"})
    vd = dl.delete_delta(spark, table, "id % 4 = 1")
    src = spark.createDataFrame(
        [(2, 50.0, "U"), (77, 7.0, "U"), (3, 0.0, "D")],
        "id long, v double, op string",
    )
    vm = dl.merge_delta(spark, table, src, "id", op_col="op")
    for v in (vu, vd, vm):
        assert _cdc_count(table, v) > 0, f"commit {v} has no cdc actions"
    # disabled table: no cdc files anywhere
    other = table + "_nocdf"
    dl.write_delta_commit(_df(spark, [(1, 1.0)]), other)
    dl.update_delta(spark, other, "id = 1", {"v": "2.0"})
    assert _cdc_count(other, 1) == 0
    assert not os.path.exists(os.path.join(other, "_change_data"))


def test_apply_identity_across_all_operations(spark, table):
    dl.write_delta_commit(_df(spark, [(i, float(i)) for i in range(20)]), table)
    dl.enable_delta_cdf(table)
    dl.update_delta(spark, table, "id % 3 = 0", {"v": "v * 2"})
    dl.delete_delta(spark, table, "id % 5 = 0")
    src = spark.createDataFrame(
        [(2, 100.0, "U"), (3, 200.0, "U"), (99, 9.0, "U"), (7, 0.0, "D")],
        "id long, v double, op string",
    )
    dl.merge_delta(spark, table, src, "id", op_col="op")
    dl.write_delta_commit(_df(spark, [(500, 5.0)]), table)  # append leg
    latest = dl._latest_version(table)
    for v in range(2, latest + 1):
        prev = _state(spark, table, v - 1)
        rows = dl.read_delta_changes(spark, table, v - 1, v).collect()
        assert _fold(prev, rows) == _state(spark, table, v), f"commit {v}"


def test_merge_delete_and_upsert_same_key_is_delete_plus_insert(spark, table):
    # a key carrying BOTH a CDC 'D' and an upsert must emit paired
    # delete + insert — never an unpaired update_postimage
    dl.write_delta_commit(_df(spark, [(1, 1.0), (2, 2.0)]), table)
    dl.enable_delta_cdf(table)
    src = spark.createDataFrame(
        [(1, 10.0, "U"), (1, 0.0, "D")], "id long, v double, op string"
    )
    v = dl.merge_delta(spark, table, src, "id", op_col="op")
    ch = dl.read_delta_changes(spark, table, v - 1, v).collect()
    tags = sorted(r._change_type for r in ch if r.id == 1)
    assert tags == ["delete", "insert"]
    assert _fold(_state(spark, table, v - 1), ch) == _state(spark, table, v)


def test_merge_not_matched_by_source_deletes_emit(spark, table):
    dl.write_delta_commit(
        _df(spark, [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]), table
    )
    dl.enable_delta_cdf(table)
    src = spark.createDataFrame([(1, 10.0)], "id long, v double")
    v = dl.merge_delta(
        spark, table, src, "id",
        not_matched_by_source="delete",
        not_matched_by_source_condition="v > 2.5",
    )
    ch = dl.read_delta_changes(spark, table, v - 1, v)
    dels = sorted(r.id for r in ch.collect() if r._change_type == "delete")
    assert dels == [3, 4]  # 2 survives the condition; 1 was matched
    assert _fold(
        _state(spark, table, v - 1), ch.collect()
    ) == _state(spark, table, v)


def test_cdc_invisible_to_snapshot_replay_and_checkpoint(spark, table):
    dl.write_delta_commit(_df(spark, [(i, float(i)) for i in range(8)]), table)
    dl.enable_delta_cdf(table)
    dl.update_delta(spark, table, "id < 4", {"v": "v + 1"})
    before = _state(spark, table)
    cp = dl.write_delta_checkpoint(table)
    import pyarrow.parquet as pq

    rows = pq.read_table(dl._checkpoint_file(table, cp)).to_pylist()
    assert not any(r.get("cdc") for r in rows if isinstance(r, dict))
    assert _state(spark, table) == before  # replay ignores cdc actions


def test_vacuum_keeps_cdc_until_cleanup_truncates(spark, table):
    dl.write_delta_commit(_df(spark, [(i, float(i)) for i in range(8)]), table)
    dl.enable_delta_cdf(table)
    dl.update_delta(spark, table, "id % 2 = 0", {"v": "v * 3"})  # v2
    n_before = dl.read_delta_changes(spark, table, 1, 2).count()
    doomed = dl.vacuum_delta(table, grace_ms=0)
    assert not [p for p in doomed if p.startswith("_change_data")]
    assert dl.read_delta_changes(spark, table, 1, 2).count() == n_before
    # append a few commits, checkpoint, truncate: commit 2's JSON goes,
    # so its cdc file loses its reference and the sweep reclaims it
    dl.write_delta_commit(_df(spark, [(100, 1.0)]), table)  # v3
    dl.write_delta_checkpoint(table)
    dl.cleanup_delta_log(table)
    assert not os.path.exists(dl._commit_file(table, 2))
    doomed = dl.vacuum_delta(table, grace_ms=0)
    assert [p for p in doomed if p.startswith("_change_data")]
    # and the truncated CDF range refuses loudly, never a partial read
    with pytest.raises(ValueError, match="truncated"):
        dl.read_delta_changes(spark, table, 1, 2).count()


def test_cdf_with_column_mapping_stores_physical_names(spark, table):
    dl.write_delta_commit(_df(spark, [(1, 1.0), (2, 2.0)]), table)
    dl.enable_delta_cdf(table)
    dl.rename_delta_column(spark, table, {"v": "val"})  # mapping mode on
    v = dl.update_delta(spark, table, "id = 1", {"val": "9.0"})
    acts = [a["cdc"] for a in dl._read_commit(table, v) if "cdc" in a]
    assert acts
    import pyarrow.parquet as pq

    cols: set[str] = set()
    for a in acts:
        cols.update(
            pq.read_schema(os.path.join(table, a["path"])).names
        )
    assert "_change_type" in cols
    assert "val" not in cols  # physical name (original 'v'), not logical
    ch = dl.read_delta_changes(spark, table, v - 1, v)
    assert "val" in ch.columns  # read path translates back to logical
    post = [r for r in ch.collect() if r._change_type == "update_postimage"]
    assert [(r.id, r.val) for r in post] == [(1, 9.0)]


def _cdf_stream(spark, table, name, starting=1):
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    try:
        spark.dataSource.register(make_delta_stream_source())
    except Exception:
        pass
    return (
        spark.readStream.format("deg04_delta_stream")
        .option("path", table)
        .option("maxVersionsPerBatch", 1)
        .option("readChangeFeed", "true")
        .option("startingVersion", starting)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def test_cdf_stream_equals_batch_feed(spark, table):
    dl.write_delta_commit(_df(spark, [(i, float(i)) for i in range(10)]), table)
    dl.enable_delta_cdf(table)
    dl.update_delta(spark, table, "id % 3 = 0", {"v": "v * 2"})
    dl.delete_delta(spark, table, "id % 5 = 0")
    dl.write_delta_commit(_df(spark, [(100, 1.0)]), table)
    q = _cdf_stream(spark, table, "cdf_stream_eq")
    try:
        q.processAllAvailable()
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
    finally:
        q.stop()
    assert n_batches >= 3  # one commit per trigger, exactly-once offsets
    got = spark.table("cdf_stream_eq")
    batch = dl.read_delta_changes(spark, table, 1, 4).select(got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_cdf_stream_refuses_pre_enable_change_commit(spark, table):
    # a rewriting commit WITHOUT cdc files (written before the property
    # flip) is unreconstructable as a stream: fail loudly, never guess
    dl.write_delta_commit(_df(spark, [(1, 1.0), (2, 2.0)]), table)
    dl.update_delta(spark, table, "id = 1", {"v": "9.0"})  # no CDF yet
    dl.enable_delta_cdf(table)
    q = _cdf_stream(spark, table, "cdf_stream_refuse", starting=1)
    try:
        with pytest.raises(Exception, match="no cdc files"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_mapped_append_may_omit_nullable_added_column(spark, table):
    # round-11 soak falsifier (deterministic twin of the model-test
    # @example): rename activates column mapping, ADD COLUMN extends
    # the schema metadata-only, and an append WITHOUT the new column
    # must land with it null — not raise UNRESOLVED_COLUMN
    dl.write_delta_commit(_df(spark, [(0, 0.0)]), table)
    dl.rename_delta_column(spark, table, {"v": "v1"})
    dl.add_delta_columns(table, {"c0": "double"})
    df = spark.createDataFrame([(10, 1.0)], "id long, v1 double")
    v = dl.write_delta_commit(df, table, mode="append")
    got = {r.id: (r.v1, r.c0) for r in dl.read_delta_log(spark, table).collect()}
    assert got == {0: (0.0, None), 10: (1.0, None)}
    # and time travel before the append still reads the old shape
    assert {r.id for r in dl.read_delta_log(spark, table, v - 1).collect()} == {0}


# --------------- round 11: whole-file + DV-diff stream reconstruction
#
# With CDF enabled, the only commits that rewrite data WITHOUT cdc
# files are whole-file operations (overwrite, RESTORE). The stream
# source reconstructs them exactly at the file level — added file →
# live rows as inserts (DV-excluded), removed file → previously-live
# rows as deletes, DV-changed file → the DV set difference both ways —
# instead of refusing, matching the batch reader's semantics.


def test_cdf_stream_reconstructs_overwrite_and_restore(spark, table):
    # coalesce(1): multi-row files so the DV deletes are PARTIAL-file
    # (a one-row-per-file layout degenerates every DV delete into a
    # whole-file remove and the DV include/exclude paths never run)
    dl.write_delta_commit(
        _df(spark, [(i, float(i)) for i in range(10)]).coalesce(1), table
    )
    dl.enable_delta_cdf(table)                                       # v1
    dl.update_delta(spark, table, "id % 3 = 0", {"v": "v * 2"})      # v2 cdc
    dl.write_delta_commit(
        _df(spark, [(100, 1.0), (101, 2.0)]), table, mode="overwrite"
    )                                                                # v3
    dl.restore_delta(spark, table, 2)                                # v4
    dl.delete_delta(spark, table, "id % 4 = 1")                      # v5 cdc
    dl.restore_delta(spark, table, 4)                                # v6
    assert _cdc_count(table, 3) == 0 and _cdc_count(table, 4) == 0
    q = _cdf_stream(spark, table, "cdf_recon_eq", starting=0)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("cdf_recon_eq")
    batch = dl.read_delta_changes(spark, table, -1, 6).select(got.columns)
    assert Counter(map(tuple, got.collect())) == Counter(
        map(tuple, batch.collect())
    )
    # the overwrite reconstructs as delete-all + insert-new, exactly
    v3 = Counter(
        (r.id, r._change_type)
        for r in got.collect()
        if r._commit_version == 3
    )
    assert v3 == Counter(
        {(i, "delete"): 1 for i in range(10)}
        | {(100, "insert"): 1, (101, "insert"): 1}
    )


def test_cdf_stream_restore_resurrects_dv_rows_exactly(spark, table):
    # RESTORE across a DV delete re-adds the SAME file with a smaller
    # (here: no) deletion vector and removes nothing — the change is
    # the DV set difference, emitted via the partition include-path
    dl.write_delta_commit(
        _df(spark, [(i, float(i)) for i in range(8)]).coalesce(1), table
    )
    dl.enable_delta_cdf(table)                                       # v1
    dl.delete_delta(spark, table, "id % 2 = 0")                      # v2 DV
    # the delete was partial-file: the data file survives with a DV
    assert any(
        (a.get("add") or {}).get("deletionVector")
        for a in dl._read_commit(table, 2)
    )
    dl.restore_delta(spark, table, 1)                                # v3
    q = _cdf_stream(spark, table, "cdf_resurrect", starting=3)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [
        (r.id, r.v, r._change_type, r._commit_version)
        for r in spark.table("cdf_resurrect").collect()
    ]
    assert Counter(got) == Counter(
        (i, float(i), "insert", 3) for i in range(0, 8, 2)
    )
    # the BATCH reader agrees exactly (round-11 hole, found by this
    # equality: its pure-append branch used to re-emit the re-added
    # files WHOLE — DV-dead rows included — for add-only RESTOREs)
    assert Counter(
        (r.id, r.v, r._change_type, r._commit_version)
        for r in dl.read_delta_changes(spark, table, 2, 3).collect()
    ) == Counter(got)
    # and the final snapshot agrees: everything is back
    assert _state(spark, table) == Counter(
        {(i, float(i)): 1 for i in range(8)}
    )


def test_snapshot_stream_treats_restore_as_change_commit(spark, table):
    # a RESTORE can rewrite data with NO removes (pure DV resurrection
    # re-adds a live path) — the append flow must never re-emit that
    # file's rows as if they were fresh appends
    from deg04_local_data_lake_spark.sources.pyds import (
        make_delta_stream_source,
    )

    dl.write_delta_commit(
        _df(spark, [(i, float(i)) for i in range(6)]).coalesce(1), table
    )
    dl.delete_delta(spark, table, "id >= 4")                         # v1 DV
    dl.restore_delta(spark, table, 0)                                # v2: add-only
    try:
        spark.dataSource.register(make_delta_stream_source())
    except Exception:
        pass

    def _q(name, skip):
        return (
            spark.readStream.format("deg04_delta_stream")
            .option("path", table)
            .option("maxVersionsPerBatch", 10)
            .option("skipChangeCommits", str(skip).lower())
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )

    q = _q("restore_skip", True)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # v1 (DV delete) and v2 (restore) both skipped whole: v0 rows once
    assert Counter(
        (r.id, r.v) for r in spark.table("restore_skip").collect()
    ) == Counter({(i, float(i)): 1 for i in range(6)})

    q = _q("restore_refuse", False)
    try:
        with pytest.raises(Exception, match="rewrites data"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_cdf_stream_refuses_after_property_reverting_restore(spark, table):
    # RESTORE restores table METADATA too (schema AND configuration):
    # restoring to a pre-enable version flips
    # delta.enableChangeDataFeed back off, so a later rewriting commit
    # carries no cdc files and must refuse the CDF stream with the
    # documented pre-enable message. The metadata-only restore itself
    # (data-identical snapshot: no adds, no removes) emits NOTHING —
    # it is invisible to the stream like any metaData commit.
    dl.write_delta_commit(
        _df(spark, [(i, float(i)) for i in range(6)]).coalesce(1), table
    )
    dl.enable_delta_cdf(table)                                       # v1
    assert dl.restore_delta(spark, table, 0) == 2                    # v2
    acts = dl._read_commit(table, 2)
    assert not any("add" in a or "remove" in a for a in acts)
    assert dl.delete_delta(spark, table, "id = 1") == 3              # v3
    assert _cdc_count(table, 3) == 0  # CDF is off again: no cdc staged
    q = _cdf_stream(spark, table, "cdf_prop_revert", starting=2)
    try:
        with pytest.raises(Exception, match="no cdc files"):
            q.processAllAvailable()
    finally:
        q.stop()
    # the metadata-only restore (v2) emitted no rows before the refusal
    assert spark.table("cdf_prop_revert").count() == 0
