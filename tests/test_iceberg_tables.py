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
