"""Tests for the jar-less Iceberg table layer (sources/iceberg_tables.py):
snapshot commits, manifest/manifest-list round-trips through the
from-scratch Avro codec, time travel, overwrite semantics, history."""

from __future__ import annotations

import json
import os

import pytest

from deg04_local_data_lake_spark.sources.avro_io import read_container
from deg04_local_data_lake_spark.sources.iceberg_tables import (
    iceberg_history,
    read_iceberg,
    write_iceberg_commit,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "ice")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "CAST(id * 3 AS DOUBLE) AS v")


def test_append_overwrite_time_travel(spark, table):
    s1 = write_iceberg_commit(_df(spark, 0, 40), table)
    s2 = write_iceberg_commit(_df(spark, 40, 60), table)
    s3 = write_iceberg_commit(_df(spark, 0, 10), table, mode="overwrite")
    assert read_iceberg(spark, table).count() == 10
    assert read_iceberg(spark, table, s2).count() == 60
    assert read_iceberg(spark, table, s1).count() == 40
    got = sorted(r.id for r in read_iceberg(spark, table, s3).collect())
    assert got == list(range(10))
    hist = iceberg_history(table)
    assert [h["operation"] for h in hist] == ["append", "append", "overwrite"]


def test_layout_matches_hadoop_catalog_shape(spark, table):
    write_iceberg_commit(_df(spark, 0, 5), table)
    meta = os.path.join(table, "metadata")
    names = os.listdir(meta)
    assert "version-hint.text" in names
    assert "v1.metadata.json" in names
    assert any(n.startswith("snap-") and n.endswith(".avro") for n in names)
    assert any(n.endswith("-m0.avro") for n in names)
    assert os.path.isdir(os.path.join(table, "data"))
    doc = json.load(open(os.path.join(meta, "v1.metadata.json")))
    assert doc["format-version"] == 2
    assert doc["schemas"][0]["fields"][0]["id"] == 1  # spec field ids


def test_manifest_avro_carries_spec_field_ids(spark, table):
    write_iceberg_commit(_df(spark, 0, 5), table)
    meta_dir = os.path.join(table, "metadata")
    mlist = next(
        os.path.join(meta_dir, n)
        for n in os.listdir(meta_dir)
        if n.startswith("snap-")
    )
    schema, manifests = read_container(mlist)
    by_name = {f["name"]: f for f in schema["fields"]}
    assert by_name["manifest_path"]["field-id"] == 500
    assert by_name["added_snapshot_id"]["field-id"] == 503
    assert manifests[0]["added_files_count"] >= 1
    eschema, entries = read_container(manifests[0]["manifest_path"])
    assert entries and entries[0]["status"] == 1  # ADDED
    dfile = entries[0]["data_file"]
    assert dfile["file_format"] == "PARQUET"
    assert dfile["record_count"] > 0
    assert os.path.getsize(dfile["file_path"]) == dfile["file_size_in_bytes"]


def test_append_carries_previous_manifests_forward(spark, table):
    write_iceberg_commit(_df(spark, 0, 5), table)
    write_iceberg_commit(_df(spark, 5, 9), table)
    meta_dir = os.path.join(table, "metadata")
    doc = json.load(
        open(os.path.join(meta_dir, f"v{2}.metadata.json"))
    )
    snap = doc["snapshots"][-1]
    _s, manifests = read_container(snap["manifest-list"])
    assert len(manifests) == 2  # previous + new
    assert read_iceberg(spark, table).count() == 9


def test_schema_round_trip_types(spark, table):
    df = spark.range(0, 3).selectExpr(
        "id",
        "CAST(id AS INT) AS i",
        "CAST(id AS DOUBLE) AS d",
        "CAST(id AS STRING) AS s",
        "id % 2 = 0 AS b",
        "CAST(id AS DECIMAL(10,2)) AS dec",
    )
    write_iceberg_commit(df, table)
    out = read_iceberg(spark, table)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "int", "double", "string", "boolean", "decimal(10,2)"
    ]
    assert out.count() == 3


def test_missing_snapshot_raises(spark, table):
    write_iceberg_commit(_df(spark, 0, 5), table)
    with pytest.raises(FileNotFoundError):
        read_iceberg(spark, table, snapshot_id=999)


def test_timestamp_round_trip(spark, table):
    # Spark timestamp (instant) maps to Iceberg timestamptz and must come
    # back as timestamp — NOT timestamp_ntz, which would make values
    # session-timezone-dependent. NTZ maps to Iceberg timestamp.
    df = spark.range(0, 3).selectExpr(
        "id",
        "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts",
        "CAST(timestamp_micros(CAST(id * 1000000 AS LONG)) AS TIMESTAMP_NTZ)"
        " AS ts_ntz",
    )
    write_iceberg_commit(df, table)
    out = read_iceberg(spark, table)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "timestamp", "timestamp_ntz"
    ]
    meta = json.load(
        open(os.path.join(table, "metadata", "v1.metadata.json"))
    )
    types = {f["name"]: f["type"] for f in meta["schemas"][0]["fields"]}
    assert types["ts"] == "timestamptz"
    assert types["ts_ntz"] == "timestamp"
    got = {r.id: r.ts for r in out.collect()}
    want = {r.id: r.ts for r in df.collect()}
    assert got == want


def test_schema_evolution_time_travel(spark, table):
    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    evolved = spark.range(0, 5).selectExpr(
        "id", "CAST(id * 3 AS DOUBLE) AS v", "CAST(id AS STRING) AS tag"
    )
    s2 = write_iceberg_commit(evolved, table, mode="overwrite")
    # current read sees the evolved schema
    cur = read_iceberg(spark, table)
    assert cur.columns == ["id", "v", "tag"]
    assert cur.count() == 5
    # time travel to s1 resolves the ORIGINAL schema via its schema-id
    old = read_iceberg(spark, table, s1)
    assert old.columns == ["id", "v"]
    assert old.count() == 10
    meta = json.load(open(os.path.join(
        table, "metadata", f"v2.metadata.json")))
    assert len(meta["schemas"]) == 2
    assert meta["current-schema-id"] == 1
    ids = {s["snapshot-id"]: s["schema-id"] for s in meta["snapshots"]}
    assert ids == {s1: 0, s2: 1}
    # unchanged columns keep their field ids; the new column gets a fresh one
    by_name = {f["name"]: f["id"] for f in meta["schemas"][1]["fields"]}
    orig = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    assert by_name["id"] == orig["id"] and by_name["v"] == orig["v"]
    assert by_name["tag"] > max(orig.values())


def test_append_schema_mismatch_raises(spark, table):
    write_iceberg_commit(_df(spark, 0, 10), table)
    bad = spark.range(0, 5).selectExpr("id", "CAST(id AS STRING) AS v")
    with pytest.raises(ValueError, match="append schema mismatch"):
        write_iceberg_commit(bad, table, mode="append")


def test_partitioned_write_and_prune(spark, table):
    df = spark.range(0, 100).selectExpr(
        "id",
        "CAST(id % 4 AS STRING) AS bucket",
        "CAST(id * 2 AS DOUBLE) AS v",
    )
    write_iceberg_commit(df, table, partition_by=["bucket"])
    # hive-style layout on disk
    assert os.path.isdir(os.path.join(table, "data", "bucket=0"))
    # full read reconstitutes partition column values and types
    full = read_iceberg(spark, table)
    assert full.count() == 100
    assert dict(full.dtypes)["bucket"] == "string"
    # partition_filter prunes from the manifest alone
    pruned = read_iceberg(spark, table, partition_filter={"bucket": "2"})
    rows = pruned.collect()
    assert len(rows) == 25 and all(r.bucket == "2" for r in rows)
    # fewer input files than the full scan
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    with pytest.raises(ValueError, match="non-partition"):
        read_iceberg(spark, table, partition_filter={"v": 1.0})
    # a commit declaring a different spec must go through evolution
    with pytest.raises(ValueError, match="evolve_iceberg_partition_spec"):
        write_iceberg_commit(df, table, partition_by=["v"])


def test_partitioned_int_column_and_append(spark, table):
    df = spark.range(0, 40).selectExpr(
        "CAST(id % 4 AS INT) AS part", "id AS val"
    )
    write_iceberg_commit(df, table, partition_by=["part"])
    write_iceberg_commit(df, table, mode="append")
    out = read_iceberg(spark, table, partition_filter={"part": 3})
    rows = out.collect()
    assert len(rows) == 20 and all(r.part == 3 for r in rows)
    assert dict(out.dtypes)["part"] == "int"


def test_column_ranges_data_skipping(spark, table):
    # one file per disjoint id range → bounds make skipping provable
    for lo in (0, 1000, 2000, 3000):
        write_iceberg_commit(
            spark.range(lo, lo + 100).selectExpr(
                "id", "CAST(id AS DOUBLE) AS v"
            ).coalesce(1),
            table,
            mode="append" if lo else "append",
        )
    full = read_iceberg(spark, table)
    assert len(full.inputFiles()) == 4
    skipped = read_iceberg(spark, table, column_ranges={"id": (1000, 1099)})
    assert len(skipped.inputFiles()) == 1
    assert sorted(r.id for r in skipped.collect()) == list(
        range(1000, 1100))
    # half-open ranges
    ge = read_iceberg(spark, table, column_ranges={"id": (2000, None)})
    assert len(ge.inputFiles()) == 2
    # string bounds work too
    # incomparable/absent bounds keep the file (conservative): filter on
    # a column and range that excludes nothing
    keep = read_iceberg(spark, table, column_ranges={"v": (None, 1e9)})
    assert len(keep.inputFiles()) == 4


def test_bounds_recorded_in_manifest(spark, table):
    write_iceberg_commit(
        spark.range(5, 50).selectExpr(
            "id", "CAST(id AS STRING) AS s").coalesce(1),
        table,
    )
    meta_dir = os.path.join(table, "metadata")
    mpath = next(
        os.path.join(meta_dir, n)
        for n in os.listdir(meta_dir)
        if n.endswith("-m0.avro")
    )
    _s, entries = read_container(mpath)
    d = entries[0]["data_file"]
    lower = {e["key"]: e["value"] for e in d["lower_bounds"]}
    upper = {e["key"]: e["value"] for e in d["upper_bounds"]}
    import struct as _struct
    assert _struct.unpack("<q", lower[1])[0] == 5
    assert _struct.unpack("<q", upper[1])[0] == 49
    assert lower[2] == b"10"  # lexicographic string min of "5".."49"


# ------------------------------------------- position deletes (v2 MoR)


def test_position_delete_rewrites_no_data_file(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 1000), table)
    data_before = sorted(read_iceberg(spark, table).inputFiles())
    s2 = delete_iceberg(spark, table, "id % 10 = 3")
    assert s2 == 2
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == [i for i in range(1000) if i % 10 != 3]
    # data files untouched (inputFiles also lists the delete parquet the
    # anti-join reads — exclude it); pre-delete snapshot intact
    data_after = sorted(
        f for f in read_iceberg(spark, table).inputFiles()
        if "-delete-" not in f
    )
    assert data_after == data_before
    assert read_iceberg(spark, table, 1).count() == 1000
    hist = iceberg_history(table)
    assert hist[-1]["operation"] == "delete"


def test_repeated_position_deletes_stack(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 300), table)
    delete_iceberg(spark, table, "id < 50")
    delete_iceberg(spark, table, "id >= 250")
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(50, 250))
    # second delete on an already-filtered snapshot: re-deleting the
    # same rows is impossible (they no longer match any scan row)
    delete_iceberg(spark, table, "id < 60")
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(60, 250))


def test_position_delete_nothing_is_noop(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    assert delete_iceberg(spark, table, "id > 99") == s1
    assert len(iceberg_history(table)) == 1


def test_overwrite_drops_position_deletes(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 100), table)
    delete_iceberg(spark, table, "id < 10")
    write_iceberg_commit(_df(spark, 0, 20), table, mode="overwrite")
    # fresh manifest list: old deletes apply to nothing
    assert read_iceberg(spark, table).count() == 20


def test_append_after_delete_keeps_delete_applicable(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 100), table)
    delete_iceberg(spark, table, "id < 10")
    write_iceberg_commit(_df(spark, 100, 120), table, mode="append")
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(10, 120))


def test_position_delete_on_partitioned_table(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    df = spark.range(0, 100).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS bucket"
    )
    write_iceberg_commit(df, table, partition_by=["bucket"])
    delete_iceberg(spark, table, "bucket = '1' AND id < 50")
    rows = read_iceberg(spark, table).collect()
    assert len(rows) == 100 - 13  # ids 1,5,...,49 in bucket 1
    pruned = read_iceberg(spark, table, partition_filter={"bucket": "1"})
    assert sorted(r.id for r in pruned.collect()) == [
        i for i in range(50, 100) if i % 4 == 1
    ]


def test_compaction_materializes_position_deletes(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        compact_iceberg,
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 500).repartition(8), table)
    s_del = delete_iceberg(spark, table, "id % 3 = 0")
    s_c = compact_iceberg(spark, table, target_files=2)
    files = read_iceberg(spark, table).inputFiles()
    # delete parquet no longer read; small files coalesced
    assert not any("-delete-" in f for f in files)
    assert len(files) == 2
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == [i for i in range(500) if i % 3 != 0]
    # time travel to the MoR snapshot still resolves deletes
    assert read_iceberg(spark, table, s_del).count() == len(got)
    assert s_c == s_del + 1


def test_compaction_preserves_partition_spec(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        compact_iceberg,
        delete_iceberg,
    )

    df = spark.range(0, 80).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS bucket"
    )
    write_iceberg_commit(df, table, partition_by=["bucket"])
    delete_iceberg(spark, table, "id < 10")
    compact_iceberg(spark, table)
    pruned = read_iceberg(spark, table, partition_filter={"bucket": "1"})
    assert sorted(r.id for r in pruned.collect()) == [
        i for i in range(10, 80) if i % 2 == 1
    ]


# --------------------------------------------------- equality deletes


def test_equality_delete_removes_matching_rows(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg_equality,
    )

    write_iceberg_commit(_df(spark, 0, 100), table)
    keys = spark.range(0, 100).filter("id % 10 = 0").select("id")
    s2 = delete_iceberg_equality(spark, table, keys, ["id"])
    assert s2 == 2
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == [i for i in range(100) if i % 10 != 0]
    # time travel to the pre-delete snapshot sees everything
    assert read_iceberg(spark, table, 1).count() == 100


def test_equality_delete_sequence_rule_reinsert_survives(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg_equality,
    )

    # CDC shape: rows written BEFORE the delete die; the same keys
    # re-inserted AFTER the delete must survive (strictly-smaller
    # sequence rule)
    write_iceberg_commit(_df(spark, 0, 50), table)        # seq 1
    keys = spark.range(0, 10).select("id")
    delete_iceberg_equality(spark, table, keys, ["id"])   # seq 2
    reinserted = spark.range(0, 5).selectExpr(
        "id", "CAST(999.0 AS DOUBLE) AS v"
    )
    write_iceberg_commit(reinserted, table, mode="append")  # seq 3
    rows = {r.id: r.v for r in read_iceberg(spark, table).collect()}
    # ids 0-4: only the re-inserted versions; ids 5-9: gone; 10-49: orig
    assert sorted(rows) == list(range(5)) + list(range(10, 50))
    assert all(rows[i] == 999.0 for i in range(5))


def test_equality_delete_multi_column_key(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg_equality,
    )

    df = spark.range(0, 60).selectExpr(
        "id % 3 AS a", "id % 4 AS b", "id AS val"
    )
    write_iceberg_commit(df, table)
    keys = spark.sql("SELECT 1 AS a, 2 AS b").selectExpr(
        "CAST(a AS LONG) a", "CAST(b AS LONG) b"
    )
    delete_iceberg_equality(spark, table, keys, ["a", "b"])
    rows = read_iceberg(spark, table).collect()
    assert len(rows) == 60 - 5  # ids ≡ 10 (mod 12): 5 of 60
    assert not any(r.a == 1 and r.b == 2 for r in rows)


def test_equality_and_position_deletes_stack(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
        delete_iceberg_equality,
    )

    write_iceberg_commit(_df(spark, 0, 100), table)
    delete_iceberg(spark, table, "id >= 90")
    delete_iceberg_equality(
        spark, table, spark.range(0, 10).select("id"), ["id"]
    )
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(10, 90))


def test_equality_delete_unknown_column_raises(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg_equality,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    with pytest.raises(ValueError, match="not in schema"):
        delete_iceberg_equality(
            spark, table, spark.range(1).selectExpr("id AS nope"), ["nope"]
        )


def test_compaction_materializes_equality_deletes(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        compact_iceberg,
        delete_iceberg_equality,
    )

    write_iceberg_commit(_df(spark, 0, 200), table)
    delete_iceberg_equality(
        spark, table, spark.range(0, 200, 2).select("id"), ["id"]
    )
    compact_iceberg(spark, table, target_files=1)
    files = read_iceberg(spark, table).inputFiles()
    assert len(files) == 1 and "eqdelete" not in files[0]
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(1, 200, 2))


def test_position_delete_merge_broadcasts_small_delete_set(spark, table):
    """A small position-delete set must resolve as a BROADCAST anti-join
    (AQE or static planning) — the scan side never shuffles. At 100 TB
    this is the difference between a metadata-sized merge and
    re-shuffling the table."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 2000).repartition(4), table)
    delete_iceberg(spark, table, "id < 10")
    df = read_iceberg(spark, table)
    n = df.count()  # executes; AQE finalizes the join strategy
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # zero hash-partitioning shuffles: the scan side is never re-keyed
    assert "Exchange hashpartitioning" not in plan
    assert n == 1990


def test_upsert_via_equality_deletes(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        upsert_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 50), table)
    src = spark.range(40, 70).selectExpr(
        "id", "CAST(-1.0 AS DOUBLE) AS v"
    )
    upsert_iceberg(spark, table, src, ["id"])
    rows = {r.id: r.v for r in read_iceberg(spark, table).collect()}
    assert sorted(rows) == list(range(70))
    assert all(rows[i] == i * 3.0 for i in range(40))      # untouched
    assert all(rows[i] == -1.0 for i in range(40, 70))     # upserted
    # idempotent re-apply: same source upserts to the same state
    upsert_iceberg(spark, table, src, ["id"])
    rows = {r.id: r.v for r in read_iceberg(spark, table).collect()}
    assert sorted(rows) == list(range(70))
    assert all(rows[i] == -1.0 for i in range(40, 70))


def test_expire_snapshots_and_orphan_removal(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        expire_iceberg_snapshots,
        remove_orphan_iceberg_files,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 50), table)
    write_iceberg_commit(_df(spark, 50, 80), table)
    s3 = write_iceberg_commit(_df(spark, 0, 20), table, mode="overwrite")
    expired = expire_iceberg_snapshots(table, keep_last=1)
    assert expired == [1, 2]
    # current read intact; expired snapshot unreachable, loudly
    assert read_iceberg(spark, table).count() == 20
    with pytest.raises(FileNotFoundError):
        read_iceberg(spark, table, s1)
    # the default grace window refuses to touch young files — the
    # in-flight-commit protection (round 9) — even though they are
    # unreferenced; grace 0 (safe here: no writer) then reclaims them
    assert remove_orphan_iceberg_files(table) == []
    doomed = remove_orphan_iceberg_files(table, grace_ms=0)
    assert any(p.endswith(".parquet") for p in doomed)
    assert any(p.endswith(".avro") for p in doomed)
    got = sorted(r.id for r in read_iceberg(spark, table, s3).collect())
    assert got == list(range(20))


def test_orphan_removal_keeps_all_referenced(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        remove_orphan_iceberg_files,
    )

    write_iceberg_commit(_df(spark, 0, 30), table)
    write_iceberg_commit(_df(spark, 30, 60), table)
    # nothing expired: every file referenced by some snapshot
    assert remove_orphan_iceberg_files(table) == []
    assert read_iceberg(spark, table).count() == 60


def test_expire_keeps_current_at_minimum(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        expire_iceberg_snapshots,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    assert expire_iceberg_snapshots(table, keep_last=5) == []
    assert read_iceberg(spark, table).count() == 10


# ----------------------------------------------- partition transforms


def test_day_transform_prunes_from_manifests(spark, table):
    df = spark.range(0, 96).selectExpr(
        "id",
        "timestamp_micros(CAST(id * 3600 * 1000000 AS LONG)) AS ts",
        "CAST(id AS DOUBLE) AS v",
    )  # 96 hourly rows = 4 days from epoch
    write_iceberg_commit(df, table, partition_by=["day(ts)"])
    full = read_iceberg(spark, table)
    assert full.count() == 96
    # source column stays in the data files; no hive dirs
    assert "ts" in full.columns and "ts_day" not in full.columns
    assert not any(
        d.startswith("ts_day=")
        for d in os.listdir(os.path.join(table, "data"))
    )
    # manifest pruning on the transform value (day 2 from epoch)
    pruned = read_iceberg(spark, table, partition_filter={"ts_day": 2})
    rows = pruned.collect()
    assert len(rows) == 24
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    meta = json.load(
        open(os.path.join(table, "metadata", "v1.metadata.json"))
    )
    assert meta["partition-specs"][0]["fields"][0]["transform"] == "day"


def test_truncate_and_bucket_transforms(spark, table):
    df = spark.range(0, 100).selectExpr(
        "id", "CAST(id AS STRING) AS s"
    )
    write_iceberg_commit(
        df, table, partition_by=["truncate(10, id)", "bucket(4, s)"]
    )
    full = read_iceberg(spark, table)
    assert full.count() == 100
    assert set(full.columns) == {"id", "s"}
    # truncate buckets are floor-multiples of 10
    pruned = read_iceberg(
        spark, table, partition_filter={"id_truncate": 30}
    )
    got = sorted(r.id for r in pruned.collect())
    assert got == list(range(30, 40))
    meta = json.load(
        open(os.path.join(table, "metadata", "v1.metadata.json"))
    )
    trs = [f["transform"] for f in meta["partition-specs"][0]["fields"]]
    assert trs == ["truncate[10]", "bucket[4]"]


def test_transform_append_and_deletes_compose(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    df = spark.range(0, 48).selectExpr(
        "id",
        "timestamp_micros(CAST(id * 3600 * 1000000 AS LONG)) AS ts",
    )
    write_iceberg_commit(df, table, partition_by=["day(ts)"])
    write_iceberg_commit(
        spark.range(48, 72).selectExpr(
            "id",
            "timestamp_micros(CAST(id * 3600 * 1000000 AS LONG)) AS ts",
        ),
        table,
        mode="append",
    )
    delete_iceberg(spark, table, "id % 2 = 1")
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(0, 72, 2))
    pruned = read_iceberg(spark, table, partition_filter={"ts_day": 2})
    assert sorted(r.id for r in pruned.collect()) == list(range(48, 72, 2))


def test_transform_validation(spark, table):
    df = _df(spark, 0, 10)
    with pytest.raises(ValueError, match="date/timestamp"):
        write_iceberg_commit(df, table, partition_by=["day(id)"])
    with pytest.raises(ValueError, match="int/long/string"):
        write_iceberg_commit(df, table, partition_by=["bucket(4, v)"])
    with pytest.raises(ValueError, match="not in schema"):
        write_iceberg_commit(df, table, partition_by=["year(nope)"])


# --------------------------------------------- streaming source


def _start_ice_stream(spark, table, name, **opts):
    from deg04_local_data_lake_spark.sources.pyds import (
        make_iceberg_stream_source,
    )

    try:
        spark.dataSource.register(make_iceberg_stream_source())
    except Exception:
        pass
    r = spark.readStream.format("deg04_iceberg_stream").option(
        "path", table
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return (
        r.load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def test_iceberg_stream_one_batch_per_snapshot(spark, table):
    write_iceberg_commit(_df(spark, 0, 30), table)
    write_iceberg_commit(_df(spark, 30, 60), table)
    write_iceberg_commit(_df(spark, 60, 90), table)
    q = _start_ice_stream(spark, table, "ice_batches")
    try:
        q.processAllAvailable()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        # a snapshot committed while the stream runs is picked up
        write_iceberg_commit(_df(spark, 90, 95), table)
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) == 3
    got = sorted(r.id for r in spark.table("ice_batches").collect())
    assert got == list(range(95))


def test_iceberg_stream_fails_on_non_append(spark, table):
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 20), table)
    delete_iceberg(spark, table, "id < 5")
    q = _start_ice_stream(spark, table, "ice_fail")
    try:
        with pytest.raises(StreamingQueryException):
            q.processAllAvailable()
    finally:
        q.stop()


def test_iceberg_stream_skips_non_append(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 20), table)
    delete_iceberg(spark, table, "id < 5")
    write_iceberg_commit(_df(spark, 20, 30), table)
    q = _start_ice_stream(
        spark, table, "ice_skip", skipNonAppendSnapshots="true"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # delete snapshot skipped whole: every appended row, original values
    got = sorted(r.id for r in spark.table("ice_skip").collect())
    assert got == list(range(30))


# ------------------------------------------------ partition spec evolution


def test_partition_spec_evolution_identity_to_day(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        evolve_iceberg_partition_spec,
    )

    old = spark.range(0, 40).selectExpr(
        "CAST(id % 4 AS INT) AS region",
        "CAST(TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0) AS TIMESTAMP) AS ts",
        "CAST(id AS DOUBLE) AS v",
    )
    write_iceberg_commit(old, table, partition_by=["region"])
    spec_id = evolve_iceberg_partition_spec(table, ["day(ts)"])
    assert spec_id == 1
    new = spark.range(100, 140).selectExpr(
        "CAST(id % 4 AS INT) AS region",
        "CAST(TIMESTAMP '2024-02-01 00:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0) AS TIMESTAMP) AS ts",
        "CAST(id AS DOUBLE) AS v",
    )
    write_iceberg_commit(new, table, mode="append")
    # old files stay hive-partitioned; new files land flat under data/
    assert os.path.isdir(os.path.join(table, "data", "region=0"))
    full = read_iceberg(spark, table)
    assert full.count() == 80
    # filter on the OLD spec's identity column prunes only old-era files
    old_pruned = read_iceberg(spark, table, partition_filter={"region": 2})
    # new-era files are conservatively kept (their manifests don't
    # record `region`), old-era files with region!=2 are dropped
    assert old_pruned.filter("v < 100").count() == 10
    assert old_pruned.filter("v >= 100").count() == 40
    # filter on the NEW spec's transform prunes only new-era files
    feb2 = (
        (__import__("datetime").date(2024, 2, 2)
         - __import__("datetime").date(1970, 1, 1)).days
    )
    new_pruned = read_iceberg(spark, table, partition_filter={"ts_day": feb2})
    assert new_pruned.filter("v < 100").count() == 40  # old era kept whole
    got = sorted(r.v for r in new_pruned.filter("v >= 100").collect())
    assert got == sorted(
        r.v for r in new.filter("CAST(ts AS DATE) = DATE '2024-02-02'").collect()
    )
    # metadata carries both specs; manifests reference theirs by id
    import json as _json

    meta_dir = os.path.join(table, "metadata")
    hint = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    doc = _json.load(open(os.path.join(meta_dir, f"v{hint}.metadata.json")))
    assert [s["spec-id"] for s in doc["partition-specs"]] == [0, 1]
    assert doc["default-spec-id"] == 1
    # partition field ids unique across specs
    fids = [
        pf["field-id"] for s in doc["partition-specs"] for pf in s["fields"]
    ]
    assert len(fids) == len(set(fids))


def test_partition_spec_evolution_reuses_field_ids(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        evolve_iceberg_partition_spec,
    )

    df = spark.range(0, 20).selectExpr(
        "CAST(id % 2 AS INT) AS a", "CAST(id % 5 AS INT) AS b", "id AS v"
    )
    write_iceberg_commit(df, table, partition_by=["a"])
    evolve_iceberg_partition_spec(table, ["a", "b"])
    meta_dir = os.path.join(table, "metadata")
    hint = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    doc = json.load(open(os.path.join(meta_dir, f"v{hint}.metadata.json")))
    s0, s1 = doc["partition-specs"]
    # re-declared term `a` keeps field-id 1000; new term `b` gets 1001
    assert s1["fields"][0]["field-id"] == s0["fields"][0]["field-id"] == 1000
    assert s1["fields"][1]["field-id"] == 1001
    # restating the current default is a no-op
    assert evolve_iceberg_partition_spec(table, ["a", "b"]) == 1
    hint2 = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    assert hint2 == hint


def test_spec_evolution_merge_on_read_across_eras(spark, table):
    """Row-level deletes must apply across a spec-evolved (mixed
    hive/flat layout) table — the tagged scan unions both layout groups
    before the anti-join."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
        evolve_iceberg_partition_spec,
    )

    df1 = spark.range(0, 30).selectExpr("CAST(id % 3 AS INT) AS p", "id AS v")
    write_iceberg_commit(df1, table, partition_by=["p"])
    evolve_iceberg_partition_spec(table, ["bucket(4, v)"])
    df2 = spark.range(100, 130).selectExpr(
        "CAST(id % 3 AS INT) AS p", "id AS v"
    )
    write_iceberg_commit(df2, table, mode="append")
    delete_iceberg(spark, table, "v % 10 = 0")  # hits both eras
    got = sorted(r.v for r in read_iceberg(spark, table).collect())
    want = sorted(
        v for v in list(range(30)) + list(range(100, 130)) if v % 10 != 0
    )
    assert got == want


# ----------------------------------------------------------- refs


def test_tag_pins_snapshot_across_commits(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        create_iceberg_ref,
        drop_iceberg_ref,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 40), table)
    pinned = create_iceberg_ref(table, "v1", kind="tag")
    assert pinned == s1
    write_iceberg_commit(_df(spark, 40, 60), table)
    write_iceberg_commit(_df(spark, 0, 10), table, mode="overwrite")
    assert read_iceberg(spark, table, ref="v1").count() == 40
    assert read_iceberg(spark, table, ref="main").count() == 10
    # refs survive commits in metadata; duplicate create refuses
    with pytest.raises(ValueError, match="already exists"):
        create_iceberg_ref(table, "v1")
    drop_iceberg_ref(table, "v1")
    with pytest.raises(ValueError, match="no such ref"):
        read_iceberg(spark, table, ref="v1")


def test_branch_moves_and_replace(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        create_iceberg_ref,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 20), table)
    s2 = write_iceberg_commit(_df(spark, 20, 50), table)
    create_iceberg_ref(table, "audit", kind="branch", snapshot_id=s1)
    assert read_iceberg(spark, table, ref="audit").count() == 20
    create_iceberg_ref(
        table, "audit", kind="branch", snapshot_id=s2, replace=True
    )
    assert read_iceberg(spark, table, ref="audit").count() == 50
    with pytest.raises(ValueError, match="tag|branch"):
        create_iceberg_ref(table, "x", kind="nope")
    with pytest.raises(ValueError, match="managed by commits"):
        create_iceberg_ref(table, "main")
    with pytest.raises(FileNotFoundError, match="not in table"):
        create_iceberg_ref(table, "ghost", snapshot_id=999)


def test_refs_protect_snapshots_from_expiry(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        create_iceberg_ref,
        drop_iceberg_ref,
        expire_iceberg_snapshots,
        remove_orphan_iceberg_files,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 25), table)
    create_iceberg_ref(table, "keepme", kind="tag")
    write_iceberg_commit(_df(spark, 25, 40), table)
    s3 = write_iceberg_commit(_df(spark, 0, 5), table, mode="overwrite")
    expired = expire_iceberg_snapshots(table, keep_last=1)
    # the tagged snapshot survives a keep_last=1 expiry; the untagged
    # middle snapshot does not
    assert s1 not in expired and len(expired) == 1
    remove_orphan_iceberg_files(table, grace_ms=0)
    assert read_iceberg(spark, table, ref="keepme").count() == 25
    assert read_iceberg(spark, table, s3).count() == 5
    # dropping the tag releases it: next expiry removes the snapshot
    drop_iceberg_ref(table, "keepme")
    assert expire_iceberg_snapshots(table, keep_last=1) == [s1]
    with pytest.raises(FileNotFoundError):
        read_iceberg(spark, table, s1)


def test_ref_and_snapshot_id_are_exclusive(spark, table):
    write_iceberg_commit(_df(spark, 0, 5), table)
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, table, snapshot_id=1, ref="main")


# ------------------------------------------------ metadata tables


def test_metadata_tables_snapshots_refs_history(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        create_iceberg_ref,
        iceberg_metadata_table,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 40), table)
    s2 = write_iceberg_commit(_df(spark, 40, 60), table)
    create_iceberg_ref(table, "v1", kind="tag", snapshot_id=s1)
    snaps = iceberg_metadata_table(spark, table, "snapshots").collect()
    assert [r.snapshot_id for r in snaps] == [s1, s2]
    assert [r.operation for r in snaps] == ["append", "append"]
    assert [r.is_current for r in snaps] == [False, True]
    refs = {
        r.name: (r.type, r.snapshot_id)
        for r in iceberg_metadata_table(spark, table, "refs").collect()
    }
    assert refs == {"main": ("branch", s2), "v1": ("tag", s1)}
    hist = iceberg_metadata_table(spark, table, "history").collect()
    assert [r.snapshot_id for r in hist] == [s1, s2]


def test_metadata_tables_files_manifests_partitions(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        iceberg_metadata_table,
    )

    df = spark.range(100).selectExpr("id", "CAST(id % 4 AS LONG) AS p")
    s1 = write_iceberg_commit(df, table, partition_by=["p"])
    write_iceberg_commit(
        spark.range(100, 120).selectExpr("id", "CAST(id % 4 AS LONG) AS p"),
        table,
    )
    files = iceberg_metadata_table(spark, table, "files")
    rows = files.collect()
    assert all(r.content == 0 for r in rows)
    assert sum(r.record_count for r in rows) == 120
    mans = iceberg_metadata_table(spark, table, "manifests").collect()
    assert len(mans) == 2  # append carries the first manifest forward
    assert sum(m.added_rows_count for m in mans) == 120
    parts = iceberg_metadata_table(spark, table, "partitions").collect()
    got = {r.partition["p"]: r.record_count for r in parts}
    assert got == {"0": 30, "1": 30, "2": 30, "3": 30}
    # time travel: the first snapshot's files sum to its own count
    old = iceberg_metadata_table(spark, table, "files", snapshot_id=s1)
    assert sum(r.record_count for r in old.collect()) == 100


def test_metadata_tables_count_delete_files_separately(spark, table):
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
        iceberg_metadata_table,
    )

    write_iceberg_commit(_df(spark, 0, 100).repartition(2), table)
    delete_iceberg(spark, table, F.col("id") < 30)
    files = iceberg_metadata_table(spark, table, "files").collect()
    assert {r.content for r in files} == {0, 1}
    # partitions aggregates DATA files only — delete files don't inflate
    parts = iceberg_metadata_table(spark, table, "partitions").collect()
    assert sum(r.record_count for r in parts) == 100
    with pytest.raises(ValueError, match="kind must be"):
        iceberg_metadata_table(spark, table, "nope")


# ---------------------------------------------------------------- races


class _IceRace:
    """Run a competitor operation at the exact moment the writer under
    test is about to publish its metadata version — the deterministic
    simulation of two processes racing the Hadoop catalog's
    rename-without-overwrite commit."""

    def __init__(self, competitor):
        import deg04_local_data_lake_spark.sources.iceberg_tables as ice

        self.ice = ice
        self.orig = ice._try_publish_metadata_version
        self.competitor = competitor
        self.pending = True

    def __enter__(self):
        def racing(table, version, meta):
            if self.pending:
                self.pending = False
                self.ice._try_publish_metadata_version = self.orig
                try:
                    self.competitor()
                finally:
                    self.ice._try_publish_metadata_version = racing
            return self.orig(table, version, meta)

        self.ice._try_publish_metadata_version = racing
        return self

    def __exit__(self, *exc):
        self.ice._try_publish_metadata_version = self.orig


def test_iceberg_append_racing_append_rebases(spark, table):
    write_iceberg_commit(_df(spark, 0, 10), table)
    with _IceRace(lambda: write_iceberg_commit(_df(spark, 100, 120), table)):
        sid = write_iceberg_commit(_df(spark, 10, 20), table)
    assert sid == 3  # competitor took snapshot 2; the loser rebased to 3
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(20)) + list(range(100, 120))
    # time travel still resolves every intermediate snapshot
    assert read_iceberg(spark, table, 1).count() == 10
    assert read_iceberg(spark, table, 2).count() == 30


def test_iceberg_append_racing_schema_change_conflicts(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        CommitFailedError,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    wider = spark.range(100, 110).selectExpr(
        "id", "CAST(id * 3 AS DOUBLE) AS v", "CAST(id AS STRING) AS tag"
    )
    with _IceRace(
        lambda: write_iceberg_commit(wider, table, mode="overwrite")
    ):
        with pytest.raises(CommitFailedError, match="schema"):
            write_iceberg_commit(_df(spark, 10, 20), table)
    # the competitor's overwrite stands; the stale-schema append is gone
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(100, 110))


def test_iceberg_overwrite_racing_append_conflicts(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        CommitFailedError,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    with _IceRace(lambda: write_iceberg_commit(_df(spark, 100, 110), table)):
        with pytest.raises(CommitFailedError, match="overwrite"):
            write_iceberg_commit(_df(spark, 0, 5), table, mode="overwrite")
    assert read_iceberg(spark, table).count() == 20


def test_iceberg_delete_racing_append_conflicts(spark, table):
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        CommitFailedError,
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    with _IceRace(lambda: write_iceberg_commit(_df(spark, 100, 110), table)):
        with pytest.raises(CommitFailedError, match="concurrent"):
            delete_iceberg(spark, table, F.col("id") < 5)
    assert read_iceberg(spark, table).count() == 20


def test_iceberg_hint_probe_survives_stale_hint(spark, table):
    import deg04_local_data_lake_spark.sources.iceberg_tables as ice

    write_iceberg_commit(_df(spark, 0, 10), table)
    write_iceberg_commit(_df(spark, 10, 20), table)
    # regress the hint, as an out-of-order flip by a slow winner would
    with open(ice._hint_path(table), "w") as f:
        f.write("1")
    assert ice._current_version(table) == 2
    assert read_iceberg(spark, table).count() == 20


def test_sort_order_declared_and_survives_commits(spark, table):
    import deg04_local_data_lake_spark.sources.iceberg_tables as ice

    write_iceberg_commit(_df(spark, 0, 40), table)
    with pytest.raises(ValueError, match="no default sort order"):
        ice.rewrite_iceberg_sorted(spark, table)
    with pytest.raises(ValueError, match="not in schema"):
        ice.set_iceberg_sort_order(table, ["nope"])
    oid = ice.set_iceberg_sort_order(table, ["v"])
    assert oid == 1
    # later data commits carry the declared order forward
    write_iceberg_commit(_df(spark, 40, 80), table)
    meta = ice._load_metadata(table)
    assert meta["default-sort-order-id"] == oid
    assert any(o["order-id"] == oid and o["fields"] for o in meta["sort-orders"])
    sid = ice.rewrite_iceberg_sorted(spark, table, target_files=8)
    got = sorted(r.id for r in read_iceberg(spark, table, sid).collect())
    assert got == list(range(80))
    # sorted rewrite is an overwrite snapshot: order still the default
    assert ice._load_metadata(table)["default-sort-order-id"] == oid


def test_stream_writer_epochs_are_exactly_once(spark, table):
    import deg04_local_data_lake_spark.sources.iceberg_tables as ice

    w = ice.iceberg_stream_writer(table, "app1")
    w(_df(spark, 0, 10), 0)
    w(_df(spark, 10, 20), 1)
    # re-delivery of both epochs: skipped entirely
    w(_df(spark, 0, 10), 0)
    w(_df(spark, 10, 20), 1)
    assert read_iceberg(spark, table).count() == 20
    assert len(ice._load_metadata(table)["snapshots"]) == 2
    assert ice.last_committed_epoch(table, "app1") == 1
    # a DIFFERENT app's epoch counter is independent
    assert ice.last_committed_epoch(table, "other") == -1
    ice.iceberg_stream_writer(table, "other")(_df(spark, 20, 25), 0)
    assert read_iceberg(spark, table).count() == 25


def test_concurrent_iceberg_appends_serialize_without_loss(spark, table):
    """Live (thread-level) optimistic concurrency: N writers appending
    at once must ALL land — losers rebase onto the new head — with
    contiguous snapshot ids and no lost update. Before the
    rename-without-overwrite fix, racing writers could both os.replace
    the same metadata version and one snapshot silently vanished."""
    from concurrent.futures import ThreadPoolExecutor

    write_iceberg_commit(_df(spark, 0, 10), table)
    batches = [(100 + 10 * i, 110 + 10 * i) for i in range(6)]
    frames = [
        _df(spark, lo, hi).localCheckpoint(eager=True) for lo, hi in batches
    ]
    with ThreadPoolExecutor(max_workers=6) as ex:
        sids = list(
            ex.map(lambda fr: write_iceberg_commit(fr, table), frames)
        )
    assert sorted(sids) == [2, 3, 4, 5, 6, 7]  # contiguous, no clobber
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    expect = sorted(
        list(range(10)) + [i for lo, hi in batches for i in range(lo, hi)]
    )
    assert got == expect  # every append landed exactly once
    # every intermediate snapshot remains time-travelable
    for sid in sorted(sids):
        assert read_iceberg(spark, table, sid).count() == 10 * (sid - 1) + 10


def test_add_iceberg_columns_metadata_only(spark, table):
    import deg04_local_data_lake_spark.sources.iceberg_tables as ice

    write_iceberg_commit(_df(spark, 0, 5), table)
    with pytest.raises(ValueError, match="already exist"):
        ice.add_iceberg_columns(table, {"v": "double"})
    with pytest.raises(ValueError, match="unsupported iceberg type"):
        ice.add_iceberg_columns(table, {"x": "map<string,int>"})
    sid1 = ice._load_metadata(table)["current-snapshot-id"]
    new_schema_id = ice.add_iceberg_columns(table, {"tag": "string"})
    meta = ice._load_metadata(table)
    assert meta["current-schema-id"] == new_schema_id
    # latest read: current schema, nulls over pre-evolution files
    cur = read_iceberg(spark, table)
    assert [f.name for f in cur.schema.fields] == ["id", "v", "tag"]
    assert cur.filter("tag IS NULL").count() == 5
    # time travel: the snapshot keeps its pinned (old) schema
    old = read_iceberg(spark, table, sid1)
    assert [f.name for f in old.schema.fields] == ["id", "v"]
    # appends now must supply the widened shape — and then round-trip
    widened = spark.range(5, 8).selectExpr(
        "id", "CAST(id * 3 AS DOUBLE) AS v", "'x' AS tag"
    )
    write_iceberg_commit(widened, table)
    assert read_iceberg(spark, table).filter("tag = 'x'").count() == 3
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg_commit(_df(spark, 8, 9), table)  # old shape now fails


def test_drop_iceberg_columns_metadata_only(spark, table):
    import deg04_local_data_lake_spark.sources.iceberg_tables as ice

    df = spark.range(0, 6).selectExpr(
        "id", "CAST(id * 3 AS DOUBLE) AS v", "CAST(id % 2 AS LONG) AS flag"
    )
    write_iceberg_commit(df, table)
    sid1 = ice._load_metadata(table)["current-snapshot-id"]
    ice.set_iceberg_sort_order(table, ["v"])
    with pytest.raises(ValueError, match="sort-order source"):
        ice.drop_iceberg_columns(table, ["v"])
    with pytest.raises(ValueError, match="no such columns"):
        ice.drop_iceberg_columns(table, ["nope"])
    ice.drop_iceberg_columns(table, ["flag"])
    cur = read_iceberg(spark, table)
    assert [f.name for f in cur.schema.fields] == ["id", "v"]
    assert cur.count() == 6
    # time travel: pinned schema still carries the column
    old = read_iceberg(spark, table, sid1)
    assert old.filter("flag = 1").count() == 3
    # appends must match the narrowed shape
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg_commit(df, table)
    write_iceberg_commit(
        spark.range(6, 9).selectExpr("id", "CAST(id * 3 AS DOUBLE) AS v"),
        table,
    )
    assert read_iceberg(spark, table).count() == 9


def test_drop_iceberg_partition_source_rejected(spark, table):
    import deg04_local_data_lake_spark.sources.iceberg_tables as ice

    df = spark.range(0, 6).selectExpr("id", "CAST(id % 2 AS STRING) AS part")
    write_iceberg_commit(df, table, partition_by=["part"])
    with pytest.raises(ValueError, match="partition-spec source"):
        ice.drop_iceberg_columns(table, ["part"])


def test_update_iceberg_single_row_delta_snapshot(spark, table):
    import deg04_local_data_lake_spark.sources.iceberg_tables as ice
    from pyspark.sql import functions as F

    write_iceberg_commit(_df(spark, 0, 10), table)
    with pytest.raises(ValueError, match="unknown columns"):
        ice.update_iceberg(spark, table, F.col("id") < 3, {"nope": "1"})
    sid = ice.update_iceberg(
        spark, table, F.col("id") < 3, {"v": "v + 100.0"}
    )
    rows = {r.id: r.v for r in read_iceberg(spark, table).collect()}
    assert len(rows) == 10
    assert all(rows[i] == i * 3.0 + 100.0 for i in range(3))
    assert all(rows[i] == i * 3.0 for i in range(3, 10))
    # ONE snapshot carries delete + replacement manifests atomically
    meta = ice._load_metadata(table)
    assert len(meta["snapshots"]) == 2
    assert meta["snapshots"][-1]["summary"]["operation"] == "overwrite"
    # time travel below the UPDATE: original values
    assert {r.v for r in read_iceberg(spark, table, 1).collect()} == {
        i * 3.0 for i in range(10)
    }
    # no-match UPDATE commits nothing
    assert ice.update_iceberg(spark, table, F.col("id") > 99, {"v": "0.0"}) == sid
    # compaction folds the row delta into plain files
    ice.compact_iceberg(spark, table)
    rows = {r.id: r.v for r in read_iceberg(spark, table).collect()}
    assert rows[0] == 100.0 and rows[9] == 27.0
    # partitioned tables are explicitly out of scope
    p = table + "_part"
    df = spark.range(0, 6).selectExpr("id", "CAST(id % 2 AS STRING) AS part")
    write_iceberg_commit(df, p, partition_by=["part"])
    with pytest.raises(ValueError, match="unpartitioned"):
        ice.update_iceberg(spark, p, F.col("id") < 3, {"id": "id"})


def test_iceberg_timestamp_as_of_resolution(spark, table):
    write_iceberg_commit(_df(spark, 0, 10), table, timestamp_ms=1000)
    write_iceberg_commit(_df(spark, 10, 20), table, timestamp_ms=2000)
    write_iceberg_commit(_df(spark, 20, 30), table, timestamp_ms=3000)
    assert read_iceberg(spark, table, as_of_timestamp_ms=2500).count() == 20
    assert read_iceberg(spark, table, as_of_timestamp_ms=2000).count() == 20
    assert read_iceberg(spark, table, as_of_timestamp_ms=99999).count() == 30
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_iceberg(spark, table, as_of_timestamp_ms=500)
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, table, snapshot_id=1, as_of_timestamp_ms=2500)


def test_read_iceberg_changes_paths(spark, table):
    import deg04_local_data_lake_spark.sources.iceberg_tables as ice
    from pyspark.sql import functions as F

    write_iceberg_commit(_df(spark, 0, 10), table)          # snap 1
    write_iceberg_commit(_df(spark, 10, 15), table)         # snap 2 append
    ice.update_iceberg(spark, table, F.col("id") < 2, {"v": "v * 2"})  # snap 3
    ch = ice.read_iceberg_changes(spark, table, 1, 3)
    got = {(r.id, r.v, r._change_type, r._commit_snapshot_id) for r in ch.collect()}
    expect = {(i, i * 3.0, "insert", 2) for i in range(10, 15)}
    # id 0 has v=0.0: doubling is a no-op, and a value-level changelog
    # correctly reports NOTHING for a row the update didn't change
    expect |= {
        (1, 6.0, "update_postimage", 3),
        (1, 3.0, "update_preimage", 3),
    }
    assert got == expect
    with pytest.raises(ValueError, match="unknown snapshot"):
        ice.read_iceberg_changes(spark, table, 1, 99)
    with pytest.raises(ValueError, match="must precede"):
        ice.read_iceberg_changes(spark, table, 3, 1)


def test_untimestamped_delete_resolves_after_timestamped_append(
    spark, table
):
    """A row-level DELETE published without a timestamp must resolve
    strictly AFTER the timestamped append it follows — the snapshot-log
    monotonization rule (a 0-default would make it qualify at every
    instant, returning the deleted state for asof=<append instant>)."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table, timestamp_ms=1000)
    delete_iceberg(spark, table, "id < 5")  # untimestamped
    assert read_iceberg(spark, table).count() == 5
    assert read_iceberg(spark, table, as_of_timestamp_ms=1000).count() == 10
    assert read_iceberg(spark, table, as_of_timestamp_ms=1001).count() == 5


def test_row_level_ops_thread_timestamp_ms(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
        update_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table, timestamp_ms=1000)
    delete_iceberg(spark, table, "id < 3", timestamp_ms=2000)
    update_iceberg(spark, table, "id >= 8", {"v": "v + 100"}, timestamp_ms=3000)
    assert read_iceberg(spark, table, as_of_timestamp_ms=1500).count() == 10
    assert read_iceberg(spark, table, as_of_timestamp_ms=2500).count() == 7
    asof_late = read_iceberg(spark, table, as_of_timestamp_ms=9999)
    assert asof_late.filter("v > 100").count() == 2


def test_nonmonotone_timestamp_ms_rejected(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table, timestamp_ms=2000)
    with pytest.raises(ValueError, match="strictly increasing"):
        write_iceberg_commit(_df(spark, 10, 20), table, timestamp_ms=2000)
    with pytest.raises(ValueError, match="strictly increasing"):
        delete_iceberg(spark, table, "id < 5", timestamp_ms=1500)
    assert len(iceberg_history(table)) == 1


def test_stream_epoch_high_water_survives_snapshot_expiry(spark, table):
    """Exactly-once skip set must survive expire_snapshots: the
    high-water epoch lives in table PROPERTIES (carried forward by
    every commit), not only in retained snapshot summaries — a
    re-delivered old epoch after expiry must still be skipped."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        expire_iceberg_snapshots,
        iceberg_stream_writer,
        last_committed_epoch,
    )

    sink = iceberg_stream_writer(table, "appA")
    for epoch in range(4):
        sink(_df(spark, epoch * 10, epoch * 10 + 10), epoch)
    assert read_iceberg(spark, table).count() == 40
    assert last_committed_epoch(table, "appA") == 3
    expire_iceberg_snapshots(table, keep_last=1)
    # summaries for epochs 0-2 are gone with their snapshots, but the
    # properties high-water mark survives: replays are still skipped
    assert last_committed_epoch(table, "appA") == 3
    for epoch in range(4):  # full at-least-once redelivery
        sink(_df(spark, epoch * 10, epoch * 10 + 10), epoch)
    assert read_iceberg(spark, table).count() == 40
    # a genuinely new epoch still commits
    sink(_df(spark, 40, 50), 4)
    assert read_iceberg(spark, table).count() == 50
    assert last_committed_epoch(table, "appA") == 4


def test_changelog_delete_only_snapshot(spark, table):
    """A DELETE-only snapshot's changelog entry is pure deletes: the
    exact rows the predicate matched, nothing else."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        delete_iceberg,
        read_iceberg_changes,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 20), table)
    delete_iceberg(spark, table, "id < 5")
    meta_sid = iceberg_history(table)[-1]["snapshot_id"]
    ch = read_iceberg_changes(spark, table, s1, meta_sid)
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4]
    assert {r["_commit_snapshot_id"] for r in rows} == {meta_sid}


def test_changelog_refuses_expired_parent(spark, table):
    """Diffing across an EXPIRED snapshot boundary must raise, not merge
    several commits under one snapshot id. A ref-protected old snapshot
    makes retention non-contiguous: s1 survives via a tag, s2 expires,
    and s3 (an overwrite whose true parent is s2) cannot be diffed."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        create_iceberg_ref,
        expire_iceberg_snapshots,
        read_iceberg_changes,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    create_iceberg_ref(table, "pinned", snapshot_id=s1, kind="tag")
    s2 = write_iceberg_commit(_df(spark, 10, 20), table)
    s3 = write_iceberg_commit(_df(spark, 0, 5), table, mode="overwrite")
    expired = expire_iceberg_snapshots(table, keep_last=1)
    assert expired == [s2]  # s1 ref-protected, s3 current
    # expired endpoints fail loudly (unknown ids)
    with pytest.raises(ValueError, match="unknown snapshot"):
        read_iceberg_changes(spark, table, s2, s3)
    # retained-but-nonadjacent: s3 sits next to s1 in the retained list,
    # but its true parent s2 is gone — refuse, never diff s3 vs s1
    with pytest.raises(ValueError, match="expired parent"):
        read_iceberg_changes(spark, table, s1, s3)


def test_changelog_append_fast_path_survives_expiry(spark, table):
    """Append snapshots list their OWN added files — no parent diff — so
    the changelog still reconstructs them even when their parent
    expired (non-contiguous retention via a ref)."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        create_iceberg_ref,
        expire_iceberg_snapshots,
        read_iceberg_changes,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    create_iceberg_ref(table, "pinned", snapshot_id=s1, kind="tag")
    write_iceberg_commit(_df(spark, 10, 20), table)
    s3 = write_iceberg_commit(_df(spark, 20, 25), table)
    expire_iceberg_snapshots(table, keep_last=1)
    ch = read_iceberg_changes(spark, table, s1, s3)
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert sorted(r["id"] for r in rows) == list(range(20, 25))


def test_branch_write_audit_publish(spark, table):
    """WAP: branch commits are invisible on main until fast-forward."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        fast_forward_iceberg,
        read_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    write_iceberg_commit(_df(spark, 10, 20), table, branch="audit")
    write_iceberg_commit(_df(spark, 20, 25), table, branch="audit")
    # main untouched; branch sees its own lineage
    assert read_iceberg(spark, table).count() == 10
    assert read_iceberg(spark, table, ref="audit").count() == 25
    new_head = fast_forward_iceberg(table, "audit")
    assert read_iceberg(spark, table).count() == 25
    assert read_iceberg(spark, table, ref="audit").count() == 25
    hist = iceberg_history(table)
    assert hist[-1]["snapshot_id"] == new_head


def test_fast_forward_refuses_diverged_branch(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        fast_forward_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    write_iceberg_commit(_df(spark, 10, 20), table, branch="audit")
    write_iceberg_commit(_df(spark, 20, 30), table)  # main moved on
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward_iceberg(table, "audit")


def test_branch_write_to_tag_rejected(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        create_iceberg_ref,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    create_iceberg_ref(table, "pinned", snapshot_id=s1, kind="tag")
    with pytest.raises(ValueError, match="tag, not a writable branch"):
        write_iceberg_commit(_df(spark, 10, 20), table, branch="pinned")


def test_branch_timestamp_travel_unaffected(spark, table):
    """Branch commits stay out of the snapshot-log (main history, per
    spec) until published — TIMESTAMP AS OF never resolves to an
    unpublished audit snapshot."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        fast_forward_iceberg,
        read_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table, timestamp_ms=1000)
    write_iceberg_commit(
        _df(spark, 10, 20), table, branch="audit", timestamp_ms=2000
    )
    assert read_iceberg(spark, table, as_of_timestamp_ms=5000).count() == 10
    fast_forward_iceberg(table, "audit")
    assert read_iceberg(spark, table, as_of_timestamp_ms=5000).count() == 20
    assert read_iceberg(spark, table, as_of_timestamp_ms=1500).count() == 10


def test_cherry_pick_append_onto_diverged_main(spark, table):
    """fast-forward refuses a diverged branch; cherry-pick recovers by
    replaying the branch's APPEND manifests onto main as a new
    snapshot."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        cherry_pick_iceberg,
        fast_forward_iceberg,
        read_iceberg,
        resolve_iceberg_ref,
        _load_metadata,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    write_iceberg_commit(_df(spark, 10, 20), table, branch="audit")
    write_iceberg_commit(_df(spark, 20, 30), table)  # main diverges
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward_iceberg(table, "audit")
    staged = resolve_iceberg_ref(_load_metadata(table), "audit")
    new_id = cherry_pick_iceberg(table, staged)
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(30))
    hist = iceberg_history(table)
    assert hist[-1]["snapshot_id"] == new_id


def test_cherry_pick_rejects_non_append(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        cherry_pick_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    s2 = write_iceberg_commit(_df(spark, 0, 5), table, mode="overwrite")
    write_iceberg_commit(_df(spark, 5, 8), table)
    with pytest.raises(ValueError, match="only append"):
        cherry_pick_iceberg(table, s2)


def test_rollback_iceberg_metadata_only(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        expire_iceberg_snapshots,
        read_iceberg,
        rollback_iceberg,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    s2 = write_iceberg_commit(_df(spark, 10, 20), table)
    rollback_iceberg(table, s1)
    assert read_iceberg(spark, table).count() == 10
    # reversible: s2 stays in history until expiry
    rollback_iceberg(table, s2)
    assert read_iceberg(spark, table).count() == 20
    rollback_iceberg(table, s1)
    # expiry always keeps the newest window AND the current snapshot:
    # rolling back does not orphan s2 out of retention here
    expire_iceberg_snapshots(table, keep_last=1)
    assert read_iceberg(spark, table).count() == 10
    assert read_iceberg(spark, table, snapshot_id=s2).count() == 20
    with pytest.raises(FileNotFoundError, match="not in table"):
        rollback_iceberg(table, 99999)  # unknown target fails loudly


def test_type_promotion_reads_old_files_widened(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        promote_iceberg_column_type,
        read_iceberg,
    )

    df = spark.range(0, 10).selectExpr(
        "CAST(id AS INT) AS a", "CAST(id AS FLOAT) AS b"
    )
    s1 = write_iceberg_commit(df, table)
    promote_iceberg_column_type(table, "a", "long")
    promote_iceberg_column_type(table, "b", "double")
    cur = read_iceberg(spark, table)
    assert dict(cur.dtypes) == {"a": "bigint", "b": "double"}
    assert sorted(r.a for r in cur.collect()) == list(range(10))
    # appends now bind the WIDE schema; the narrow shape is rejected
    wide = spark.range(10, 15).selectExpr(
        "CAST(id AS LONG) AS a", "CAST(id AS DOUBLE) AS b"
    )
    write_iceberg_commit(wide, table)
    assert read_iceberg(spark, table).count() == 15
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg_commit(
            spark.range(0, 1).selectExpr(
                "CAST(id AS INT) AS a", "CAST(id AS FLOAT) AS b"
            ),
            table,
        )
    # time travel serves the pinned narrow schema
    old = read_iceberg(spark, table, snapshot_id=s1)
    assert dict(old.dtypes) == {"a": "int", "b": "float"}
    # lossy promotions rejected
    with pytest.raises(ValueError, match="illegal type promotion"):
        promote_iceberg_column_type(table, "a", "int")


def test_expire_protects_branch_ancestry(spark, table):
    """expire_snapshots keeps a BRANCH's parent chain (Iceberg's rule):
    dropping an intermediate branch commit would break fast-forward's
    ancestry walk even though the branch is a true descendant of main."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        expire_iceberg_snapshots,
        fast_forward_iceberg,
        read_iceberg,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)            # main head
    write_iceberg_commit(_df(spark, 10, 20), table, branch="audit")
    write_iceberg_commit(_df(spark, 20, 25), table, branch="audit")
    # keep_last=1 retains only the newest snapshot by position, but the
    # branch head's ancestry (intermediate branch commit + main head it
    # forked from) must survive
    expired = expire_iceberg_snapshots(table, keep_last=1)
    assert expired == []  # everything is ancestry of the audit head
    assert read_iceberg(spark, table, ref="audit").count() == 25
    fast_forward_iceberg(table, "audit")  # ancestry walk intact
    assert read_iceberg(spark, table).count() == 25


def test_expire_tag_pins_exactly_its_snapshot(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        create_iceberg_ref,
        expire_iceberg_snapshots,
        read_iceberg,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    s2 = write_iceberg_commit(_df(spark, 10, 20), table)
    s3 = write_iceberg_commit(_df(spark, 20, 25), table)
    create_iceberg_ref(table, "pin2", snapshot_id=s2, kind="tag")
    expired = expire_iceberg_snapshots(table, keep_last=1)
    # tag protects s2 only; s1 goes (s3 is current)
    assert expired == [s1]
    assert read_iceberg(spark, table, ref="pin2").count() == 20
    assert read_iceberg(spark, table, snapshot_id=s3).count() == 25


def test_changelog_walks_main_lineage_not_list_positions(spark, table):
    """Round-8 ADVICE fix: the changelog walks parent-snapshot-id
    lineage. Branch commits are APPENDED to meta['snapshots'], so with
    an interleaved unpublished branch append the positional walk (a)
    leaked the branch rows into the MAIN changelog and (b) falsely
    raised 'expired parent' for a main overwrite whose positional
    predecessor is the branch snapshot."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        read_iceberg_changes,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    s2 = write_iceberg_commit(_df(spark, 10, 20), table)
    # unpublished branch append lands between s2 and s3 in the list
    write_iceberg_commit(_df(spark, 100, 110), table, branch="audit")
    s3 = write_iceberg_commit(_df(spark, 0, 5), table, mode="overwrite")
    ch = read_iceberg_changes(spark, table, s1, s3).collect()
    ids = sorted(r["id"] for r in ch)
    # branch rows (100..110) are absent; s2's inserts and s3's diff only
    assert all(i < 100 for i in ids)
    by_snap = {}
    for r in ch:
        by_snap.setdefault(r["_commit_snapshot_id"], []).append(r)
    assert set(by_snap) == {s2, s3}
    # endpoints not on one lineage refuse loudly
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        _load_metadata,
        resolve_iceberg_ref,
    )

    b1 = resolve_iceberg_ref(_load_metadata(table), "audit")
    with pytest.raises(ValueError, match="not an ancestor"):
        read_iceberg_changes(spark, table, b1, s3)


def test_changelog_counts_cherry_pick_once(spark, table):
    """After a cherry-pick the picked rows appear in the main changelog
    exactly once, attributed to the PICK snapshot (the staged branch
    snapshot is not on the main lineage)."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        _load_metadata,
        cherry_pick_iceberg,
        read_iceberg_changes,
        resolve_iceberg_ref,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    write_iceberg_commit(_df(spark, 10, 20), table, branch="audit")
    write_iceberg_commit(_df(spark, 20, 30), table)  # main diverges
    staged = resolve_iceberg_ref(_load_metadata(table), "audit")
    pick = cherry_pick_iceberg(table, staged)
    ch = read_iceberg_changes(spark, table, s1, pick).collect()
    picked_rows = [r for r in ch if 10 <= r["id"] < 20]
    assert len(picked_rows) == 10  # once, not twice
    assert {r["_commit_snapshot_id"] for r in picked_rows} == {pick}
    assert {r["_change_type"] for r in picked_rows} == {"insert"}


def test_cherry_pick_reassigns_sequence_past_interleaved_delete(
    spark, table
):
    """Round-8 ADVICE fix: publish-time sequence reassignment. An
    equality delete committed on main BETWEEN staging and the pick must
    not retroactively delete the picked rows — they logically enter the
    table at the pick, so their manifests get the pick's sequence
    number (row_seq > delete_seq ⇒ survive)."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        _load_metadata,
        cherry_pick_iceberg,
        delete_iceberg_equality,
        read_iceberg,
        resolve_iceberg_ref,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    write_iceberg_commit(_df(spark, 10, 20), table, branch="audit")
    write_iceberg_commit(_df(spark, 20, 30), table)  # main diverges
    # equality delete of ids 12..18 lands on main AFTER staging: the
    # keys aren't on main yet, so it deletes nothing today — and must
    # not reach forward into the pick
    delete_iceberg_equality(
        spark, table, spark.range(12, 18).selectExpr("id"), ["id"]
    )
    staged = resolve_iceberg_ref(_load_metadata(table), "audit")
    cherry_pick_iceberg(table, staged)
    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(30))  # 12..18 survived the earlier delete


def test_append_retry_reasserts_timestamp_monotonicity(spark, table):
    """Round-8 ADVICE fix: after a lost CAS the append retry revalidates
    schema/spec AND the timestamp guard against the racer's head — a
    racer that committed a later timestamp must fail this commit's
    stale timestamp_ms loudly (the Delta rebase path's rule)."""
    from deg04_local_data_lake_spark.sources import iceberg_tables as ice

    write_iceberg_commit(_df(spark, 0, 5), table, timestamp_ms=1000)
    real = ice._try_publish_metadata_version
    state = {"raced": False}

    def lose_once_to_late_racer(tbl, version, meta):
        if not state["raced"]:
            state["raced"] = True
            # racer lands a LATER timestamp first, then we lose the CAS
            ice._try_publish_metadata_version = real
            try:
                write_iceberg_commit(
                    _df(spark, 100, 105), tbl, timestamp_ms=9000
                )
            finally:
                ice._try_publish_metadata_version = lose_once_to_late_racer
            return False
        return real(tbl, version, meta)

    ice._try_publish_metadata_version = lose_once_to_late_racer
    try:
        with pytest.raises(ValueError, match="strictly increasing"):
            write_iceberg_commit(
                _df(spark, 5, 10), table, timestamp_ms=5000
            )
    finally:
        ice._try_publish_metadata_version = real
    # and a retry with a FRESH later timestamp still lands
    write_iceberg_commit(_df(spark, 5, 10), table, timestamp_ms=9500)
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        read_iceberg,
    )

    assert read_iceberg(spark, table).count() == 15


def test_wap_publish_race_exactly_one_winner(spark, table):
    """Round-8 live race over the WAP surface (VERDICT r7 #5): concurrent
    branch appends + main appends + a fast-forward publish, all fighting
    over the same put-if-absent metadata version. Invariants: every
    APPEND lands exactly once (appends rebase internally), the
    fast-forward either lands atomically or refuses ('not an ancestor' /
    lost CAS) — never a torn state — and no snapshot is lost: metadata
    versions are contiguous and every recorded snapshot stays readable."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        CommitFailedError,
        _current_version,
        _load_metadata,
        fast_forward_iceberg,
        read_iceberg,
        resolve_iceberg_ref,
    )

    write_iceberg_commit(_df(spark, 0, 10), table)
    branch_batches = [(100, 110), (110, 120), (120, 130)]
    main_batches = [(200, 210), (210, 220)]
    frames = {
        (lo, hi): _df(spark, lo, hi).localCheckpoint(eager=True)
        for lo, hi in branch_batches + main_batches
    }

    ff_result: dict = {}

    def do_branch(b):
        return ("branch", write_iceberg_commit(frames[b], table, branch="audit"))

    def do_main(b):
        return ("main", write_iceberg_commit(frames[b], table))

    def do_ff():
        # retry lost-CAS (a racer moved metadata under us) but accept a
        # terminal divergence refusal — both are exactly-once outcomes
        for _ in range(20):
            try:
                ff_result["sid"] = fast_forward_iceberg(table, "audit")
                return ("ff", ff_result["sid"])
            except CommitFailedError:
                time.sleep(0.01)
            except ValueError as exc:
                assert "not an ancestor" in str(exc) or "no such branch" in str(exc)
                ff_result["refused"] = str(exc)
                return ("ff-refused", None)
        return ("ff-gaveup", None)

    jobs = (
        [lambda b=b: do_branch(b) for b in branch_batches]
        + [lambda b=b: do_main(b) for b in main_batches]
        + [do_ff]
    )
    with ThreadPoolExecutor(max_workers=6) as ex:
        results = [f.result() for f in [ex.submit(j) for j in jobs]]

    meta = _load_metadata(table)
    # 1) no lost snapshots: ids unique, every one readable, versions
    #    contiguous (one file per successful publish, put-if-absent)
    sids = [s["snapshot-id"] for s in meta["snapshots"]]
    assert len(sids) == len(set(sids))
    n_commits = 1 + len(branch_batches) + len(main_batches) + (
        1 if "sid" in ff_result else 0
    )
    assert _current_version(table) == n_commits
    for sid in sids:
        read_iceberg(spark, table, sid).count()  # must not raise
    # 2) every branch append landed exactly once on the audit lineage
    #    (main rows MAY appear there too: the fork point is whatever
    #    main head the first branch append observed — legitimate)
    audit = sorted(
        r.id
        for r in read_iceberg(spark, table, ref="audit").collect()
    )
    branch_rows = [i for lo, hi in branch_batches for i in range(lo, hi)]
    assert [i for i in audit if 100 <= i < 200] == branch_rows
    # 3) every main append landed exactly once on main
    main_ids = sorted(r.id for r in read_iceberg(spark, table).collect())
    main_rows = [i for lo, hi in main_batches for i in range(lo, hi)]
    assert [i for i in main_ids if 200 <= i < 300] == main_rows
    assert [i for i in main_ids if i < 100] == list(range(10))
    # 4) fast-forward atomicity: if it landed, main contains EVERY
    #    branch row that was on the audit head it published (the head is
    #    an ancestor of audit's final head, so its rows are a prefix of
    #    the branch batches in id order); if refused, main has no branch
    #    rows unless a later test-external publish happened (it didn't)
    picked = [i for i in main_ids if 100 <= i < 200]
    if "sid" in ff_result:
        head_rows = sorted(
            r.id
            for r in read_iceberg(
                spark, table, snapshot_id=ff_result["sid"]
            ).collect()
        )
        assert picked == [i for i in head_rows if i >= 100]
    else:
        assert picked == []
    # the outcome set is race-dependent but every job must have resolved
    assert all(tag != "ff-gaveup" for tag, _ in results)


def test_expiry_vs_reader_race(spark, table):
    """Round-9 live race (VERDICT r8 task #7): snapshot expiry and
    orphan-file removal racing a live writer, a changelog reader, and a
    streaming drain over one table. Invariant: every reader call either
    succeeds with EXACTLY the rows its endpoints imply, or refuses
    loudly with a documented expiry/lineage error — never a silently
    merged, partial, or torn diff.

    Two real holes this test found (now fixed and covered here):
    1. remove_orphan with no grace window deleted the manifests of an
       IN-FLIGHT commit (files land before the metadata publish), which
       corrupted the table for every later reader -> grace_ms contract
       (iceberg_tables.ORPHAN_GRACE_MS), mirroring Iceberg's
       ``older_than``; phase A runs the default grace under a live
       writer and must delete nothing.
    2. readers holding pre-expiry metadata leaked raw FileNotFoundError
       (changelog) or silently SKIPPED expired snapshots (stream
       source) -> both now refuse with the documented expiry message;
       phase B races actual deletions (grace 0, writer quiesced — the
       only safe setting for 0) against both readers.
    """
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        _load_metadata,
        expire_iceberg_snapshots,
        read_iceberg_changes,
        remove_orphan_iceberg_files,
        write_iceberg_commit,
    )
    from deg04_local_data_lake_spark.sources.pyds import (
        make_iceberg_stream_source,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    frames = {
        k: _df(spark, 10 * k, 10 * (k + 1)).localCheckpoint(eager=True)
        for k in range(1, 7)
    }
    sid_to_hi: dict[int, int] = {s1: 10}
    done = threading.Event()
    REFUSALS = (
        "expired",
        "unknown snapshot ids",
        "not an ancestor",
        "cannot order",
        "no data-changing snapshots",
    )

    def writer():
        for k in range(1, 7):
            sid = write_iceberg_commit(frames[k], table)
            sid_to_hi[sid] = 10 * (k + 1)
            time.sleep(0.02)
        done.set()
        return ("writer", len(sid_to_hi))

    def expirer():
        n, removed = 0, 0
        while not done.is_set():
            n += len(expire_iceberg_snapshots(table, keep_last=2))
            # default grace under a LIVE writer: must remove NOTHING
            # (every file is seconds old) — hole #1's regression guard
            removed += len(remove_orphan_iceberg_files(table))
            time.sleep(0.01)
        assert removed == 0, "orphan removal deleted inside the grace window"
        return ("expired", n)

    def check_changelog_once() -> str:
        meta = _load_metadata(table)
        head = meta["current-snapshot-id"]
        if head == s1:
            return "skip"
        try:
            rows = read_iceberg_changes(spark, table, s1, head).collect()
        except ValueError as exc:
            msg = str(exc)
            assert any(r in msg for r in REFUSALS), f"undocumented: {msg}"
            return "refused"
        except Exception as exc:  # Spark-side failure must still be the contract
            assert "expired" in str(exc), f"leaked internal error: {exc}"
            return "refused"
        # success must be EXACT for the head it read: all inserts, ids
        # (10, hi(head)], nothing merged, nothing missing
        assert {r["_change_type"] for r in rows} == {"insert"}
        got = sorted(r["id"] for r in rows)
        hi = sid_to_hi.get(head)
        if hi is not None:
            assert got == list(range(10, hi)), (
                f"merged/partial diff at head {head}: {len(got)} rows vs 10..{hi}"
            )
        return "ok"

    def changelog_reader():
        ok, refused = 0, 0
        while not done.is_set() or (ok + refused) == 0:
            outcome = check_changelog_once()
            ok += outcome == "ok"
            refused += outcome == "refused"
            time.sleep(0.005)
        return ("changelog", ok, refused)

    def drain_once(name: str) -> str:
        q = (
            spark.readStream.format("deg04_iceberg_stream")
            .option("path", table)
            .option("maxSnapshotsPerBatch", 1)
            .option("skipNonAppendSnapshots", "true")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        except Exception as exc:
            # loud refusal is an allowed outcome — but it must be OUR
            # expiry contract, not a leaked ENOENT/skip
            assert "expired" in str(exc), f"leaked internal error: {exc}"
            return "refused"
        finally:
            q.stop()
        got = sorted(r["id"] for r in spark.table(name).collect())
        # a drain that CLAIMS success must be whole batches from 0:
        # contiguous ids ending on a batch boundary — a half-applied
        # snapshot, a merged diff, or a silently-skipped expired
        # snapshot all break this
        assert got == list(range(len(got))), "drain skipped/merged rows"
        assert len(got) % 10 == 0 and len(got) >= 10
        return "ok"

    def stream_drainer():
        try:
            spark.dataSource.register(make_iceberg_stream_source())
        except Exception:
            pass
        ok, refused = 0, 0
        for attempt in range(3):
            outcome = drain_once(f"race_drain_a{attempt}")
            ok += outcome == "ok"
            refused += outcome == "refused"
        return ("drain", ok, refused)

    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [
            ex.submit(writer),
            ex.submit(expirer),
            ex.submit(changelog_reader),
            ex.submit(stream_drainer),
        ]
        results = [f.result(timeout=180) for f in futs]

    by_tag = {r[0]: r for r in results}
    assert by_tag["expired"][1] > 0, "expirer never expired anything"
    assert by_tag["changelog"][1] + by_tag["changelog"][2] >= 1
    assert by_tag["drain"][1] + by_tag["drain"][2] == 3

    # ---- phase B: race readers against ACTUAL file deletion. Writer is
    # quiesced, so grace 0 is safe (the documented only-safe-0 setting);
    # expired snapshots' manifests genuinely disappear mid-read.
    done2 = threading.Event()

    def deleter():
        removed = 0
        while not done2.is_set():
            expire_iceberg_snapshots(table, keep_last=1)
            removed += len(remove_orphan_iceberg_files(table, grace_ms=0))
            time.sleep(0.002)
        return removed

    def racing_readers():
        outcomes = []
        for i in range(8):
            outcomes.append(check_changelog_once())
            outcomes.append(drain_once(f"race_drain_b{i}"))
        done2.set()
        return outcomes

    with ThreadPoolExecutor(max_workers=2) as ex:
        fut_del = ex.submit(deleter)
        fut_read = ex.submit(racing_readers)
        outcomes = fut_read.result(timeout=180)
        removed = fut_del.result(timeout=30)

    assert removed > 0, "phase B never deleted a file: the race did not race"
    # every reader call resolved to a verified outcome (the assertions
    # inside check_changelog_once/drain_once are the invariant)
    assert all(o in ("ok", "refused", "skip") for o in outcomes)

    # final state intact: all 70 rows exactly once
    final = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert final == list(range(70))


def _manifest_list(table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        _load_metadata,
        _snapshot,
    )

    meta = _load_metadata(table)
    snap = _snapshot(meta, meta["current-snapshot-id"])
    _s, manifests = read_container(snap["manifest-list"])
    return meta, snap, manifests


def test_rewrite_manifests_merges_without_moving_data(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        rewrite_iceberg_manifests,
    )

    sids = [
        write_iceberg_commit(_df(spark, lo, lo + 20), table)
        for lo in (0, 20, 40, 60)
    ]
    _m, _s, before = _manifest_list(table)
    assert len(before) == 4  # one manifest per append
    files_before = set()
    for m in before:
        _es, entries = read_container(m["manifest_path"])
        files_before |= {e["data_file"]["file_path"] for e in entries}

    rid = rewrite_iceberg_manifests(table)
    meta, snap, after = _manifest_list(table)
    assert meta["current-snapshot-id"] == rid
    assert snap["summary"]["operation"] == "replace"
    assert len(after) == 1  # merged to one data manifest (single spec)
    assert after[0]["added_files_count"] == 0
    assert after[0]["existing_files_count"] == len(files_before)
    _es, entries = read_container(after[0]["manifest_path"])
    # zero data movement: exactly the same files, now EXISTING entries
    # with explicit sequence numbers
    assert {e["data_file"]["file_path"] for e in entries} == files_before
    assert all(e["status"] == 0 for e in entries)
    assert all(e["sequence_number"] is not None for e in entries)
    # content identical; time travel to every pre-rewrite snapshot intact
    assert sorted(r.id for r in read_iceberg(spark, table).collect()) == list(
        range(80)
    )
    for k, sid in enumerate(sids, start=1):
        assert read_iceberg(spark, table, sid).count() == 20 * k


def test_rewrite_manifests_is_noop_when_compact(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        rewrite_iceberg_manifests,
    )

    sid = write_iceberg_commit(_df(spark, 0, 10), table)
    assert rewrite_iceberg_manifests(table) == sid  # 1 manifest: no-op
    meta, _s, manifests = _manifest_list(table)
    assert meta["current-snapshot-id"] == sid and len(manifests) == 1


def test_rewrite_manifests_replace_contributes_no_changes(spark, table):
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        read_iceberg_changes,
        rewrite_iceberg_manifests,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    s2 = write_iceberg_commit(_df(spark, 10, 20), table)
    rid = rewrite_iceberg_manifests(table)
    # the window covering both appends AND the rewrite shows exactly the
    # appended rows — the replace snapshot adds zero changelog rows
    post = read_iceberg_changes(spark, table, s1, rid)
    assert post.count() == 10
    assert post.filter("_change_type <> 'insert'").count() == 0
    # the rewrite-only window is empty
    assert read_iceberg_changes(spark, table, s2, rid).count() == 0


def test_metadata_publish_is_cas_not_next_free_version(spark, table):
    """Lost-update regression: a metadata update derived from STALE
    metadata must fail loudly when a commit raced in between — never
    land on the next free version number with the racer's snapshot
    silently missing from its body."""
    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        CommitFailedError,
        _load_metadata,
        _publish_metadata,
    )

    s1 = write_iceberg_commit(_df(spark, 0, 10), table)
    stale = dict(_load_metadata(table))  # basis: version after s1
    stale["refs"] = {
        **stale.get("refs", {}),
        "pin": {"snapshot-id": s1, "type": "tag"},
    }
    s2 = write_iceberg_commit(_df(spark, 10, 20), table)  # racer lands
    with pytest.raises(CommitFailedError):
        _publish_metadata(table, stale)
    # the racer's commit survived untouched
    meta = _load_metadata(table)
    assert meta["current-snapshot-id"] == s2
    assert read_iceberg(spark, table).count() == 20
    assert "pin" not in meta.get("refs", {})
    # re-applied against FRESH metadata, the same change lands
    fresh = dict(_load_metadata(table))
    fresh["refs"] = {
        **fresh.get("refs", {}),
        "pin": {"snapshot-id": s1, "type": "tag"},
    }
    _publish_metadata(table, fresh)
    meta2 = _load_metadata(table)
    assert meta2["refs"]["pin"]["snapshot-id"] == s1
    assert meta2["current-snapshot-id"] == s2  # racer still intact


def test_metadata_cas_marker_never_reaches_disk(spark, table):
    write_iceberg_commit(_df(spark, 0, 5), table)
    meta_dir = os.path.join(table, "metadata")
    for name in os.listdir(meta_dir):
        if name.endswith(".metadata.json"):
            with open(os.path.join(meta_dir, name)) as f:
                assert "__base-version" not in json.load(f), name


def test_live_race_appends_vs_metadata_ops_lose_nothing(spark, table):
    """Live interleaving: appenders and tag-creators race; appenders
    rebase automatically, tag-creators retry on CommitFailedError.
    Invariant: NO appended row and NO tag is ever lost — the failure
    mode the CAS basis exists to prevent."""
    from concurrent.futures import ThreadPoolExecutor

    from deg04_local_data_lake_spark.sources.iceberg_tables import (
        CommitFailedError,
        _load_metadata,
        _publish_metadata,
    )

    s0 = write_iceberg_commit(_df(spark, 0, 10), table)

    def append(k):
        return write_iceberg_commit(
            _df(spark, 10 + 10 * k, 20 + 10 * k), table, mode="append"
        )

    def tag(name):
        for _ in range(50):
            try:
                fresh = dict(_load_metadata(table))
                fresh["refs"] = {
                    **fresh.get("refs", {}),
                    name: {"snapshot-id": s0, "type": "tag"},
                }
                _publish_metadata(table, fresh)
                return True
            except CommitFailedError:
                continue
        return False

    with ThreadPoolExecutor(max_workers=8) as ex:
        appends = [ex.submit(append, k) for k in range(4)]
        tags = [ex.submit(tag, f"t{j}") for j in range(4)]
        assert all(f.result() for f in tags)
        [f.result() for f in appends]

    got = sorted(r.id for r in read_iceberg(spark, table).collect())
    assert got == list(range(50))  # every append's rows present
    refs = _load_metadata(table).get("refs", {})
    assert {f"t{j}" for j in range(4)} <= set(refs)
