"""End-to-end medallion pipeline + IO layer tests (SURVEY.md §5 plan items
2-3): bronze→silver→gold writes on disk, catalog DDL round-trip, CSV
ingest with explicit and inferred schema."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from deg04_local_data_lake_spark.pipelines.medallion import run_medallion
from deg04_local_data_lake_spark.sources import catalog, readers, writers


def test_medallion_end_to_end(spark, smoke_dir, tmp_path):
    paths = run_medallion(spark, smoke_dir, str(tmp_path / "lake"))

    bronze = spark.read.parquet(paths["bronze"])
    silver = spark.read.parquet(paths["silver_asset"])
    gold = spark.read.parquet(paths["gold"])

    n_li = readers.load_table(spark, smoke_dir, "lineitem").count()
    assert bronze.count() == n_li  # no per-ticker overwrite bug (SURVEY §7)
    # bronze partitioned by trade_date on disk
    assert any(p.name.startswith("trade_date=") for p in (tmp_path / "lake" / "bronze" / "stock_quotes").iterdir())

    assert silver.count() == bronze.select("trade_date", "ticker").distinct().count()
    for c in ("is_active", "version", "valid_from", "valid_to"):
        assert c in silver.columns
    assert gold.count() == silver.select(
        F.year("trade_date"), F.month("trade_date"), "ticker"
    ).distinct().count()
    # volatility defined (non-null) whenever a month has >= 2 trading days
    bad = gold.filter((F.col("trading_days") > 1) & F.col("volatility").isNull())
    assert bad.count() == 0


def test_catalog_ddl_roundtrip(spark, tmp_path):
    catalog.create_database(spark, "t_ddl")
    catalog.create_table(
        spark,
        "t_ddl.quotes",
        {"d": "DATE", "ticker": "STRING", "px": "DOUBLE"},
        partitioned_by=["d"],
        location=str(tmp_path / "quotes"),
    )
    tables = [r["tableName"] for r in catalog.show_tables(spark, "t_ddl").collect()]
    assert "quotes" in tables
    catalog.drop_table(spark, "t_ddl.quotes")
    catalog.drop_database(spark, "t_ddl")
    dbs = [r["namespace"] for r in spark.sql("SHOW DATABASES").collect()]
    assert "t_ddl" not in dbs


def test_csv_roundtrip_inferred_and_explicit(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, s string, v double"
    )
    p = str(tmp_path / "csv")
    src.write.option("header", "true").csv(p)

    inferred = readers.read_csv(spark, p)  # S1
    assert dict(inferred.dtypes)["id"] == "int"
    explicit = readers.read_csv(spark, p, schema="id long, s string, v double")  # S2
    assert dict(explicit.dtypes)["id"] == "bigint"
    assert inferred.count() == explicit.count() == 2


def test_ingest_csv_directory(spark, tmp_path):
    """S7: per-file multi-table ingest from a folder."""
    d = tmp_path / "csvs"
    d.mkdir()
    for name, rows in {"aapl": [(1, 10.0)], "msft": [(2, 20.0), (3, 30.0)]}.items():
        spark.createDataFrame(rows, "id int, px double").write.option(
            "header", "true"
        ).csv(str(d / f"{name}.csv"))
    tables = readers.ingest_csv_directory(spark, str(d))
    assert set(tables) == {"aapl", "msft"}
    assert tables["msft"].count() == 2


def test_partitioned_write_and_schema_merge(spark, tmp_path):
    p = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "x", "2024-01-01")], "id int, v string, d string")
    writers.write_lake_table(df1, p, partition_by=["d"])  # K6
    df2 = spark.createDataFrame(
        [(2, "y", 9.9, "2024-01-02")], "id int, v string, extra double, d string"
    )
    writers.write_lake_table(
        df2, p, mode="append", partition_by=["d"], merge_schema=True
    )  # K2
    back = spark.read.option("mergeSchema", "true").parquet(p)
    assert back.count() == 2
    assert "extra" in back.columns


def test_delta_format_gated(spark, tmp_path):
    """Delta writes only when the package is importable; otherwise parquet
    is the documented fallback (SURVEY.md §7 P0 risk)."""
    pytest.importorskip("delta")
    writers.write_lake_table(
        spark.range(3), str(tmp_path / "d"), fmt="delta"
    )

def test_json_roundtrip_exact(spark, smoke_dir, tmp_path):
    """JSON-lines sink/source: values round-trip exactly when read back
    with the writer's schema (JSON itself carries no type metadata)."""
    src = readers.load_table(spark, smoke_dir, "orders").limit(200)
    p = str(tmp_path / "orders_json")
    writers.write_lake_table(src, p, fmt="json")
    back = readers.read_json(spark, p, schema=src.schema)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_roundtrip_exact(spark, smoke_dir, tmp_path):
    """ORC sink/source: native columnar types round-trip bit-exactly."""
    src = readers.load_table(spark, smoke_dir, "lineitem").limit(500)
    p = str(tmp_path / "li_orc")
    writers.write_lake_table(src, p, fmt="orc")
    back = readers.read_orc(spark, p)
    assert dict(back.dtypes) == dict(src.dtypes)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_text_roundtrip(spark, smoke_dir, tmp_path):
    """Line-oriented text: one document per line, read back as `value`."""
    src = readers.load_table(spark, smoke_dir, "documents").select("text")
    p = str(tmp_path / "docs_txt")
    src.write.mode("overwrite").text(p)
    back = readers.read_text(spark, p)
    assert back.columns == ["value"]
    assert sorted(r[0] for r in back.collect()) == sorted(
        r[0] for r in src.collect()
    )


def test_avro_roundtrip_jarless(spark, smoke_dir, tmp_path):
    """Avro no longer needs the spark-avro package: the from-scratch codec
    (sources/avro_io.py) writes/reads object container files as a dataset
    front door — one file per partition out, one partition per file back.
    Nulls, dates, and the full column set must survive bit-exact."""
    from deg04_local_data_lake_spark.sources.avro_io import (
        read_avro_dataset,
        write_avro_dataset,
    )

    src = readers.load_table(spark, smoke_dir, "orders")
    p = str(tmp_path / "orders_avro")
    n = write_avro_dataset(src.repartition(3), p)
    assert n == src.count()
    import glob

    assert len(glob.glob(p + "/*.avro")) == 3  # one container per partition
    back = read_avro_dataset(spark, p)
    assert set(back.columns) == set(src.columns)
    assert sorted(map(tuple, back.select(*src.columns).collect())) == sorted(
        map(tuple, src.collect())
    )


def test_avro_front_door_rejects_uncarriable_types(spark):
    """Decimal/struct columns must fail loudly at write planning, not
    get silently stringified."""
    from deg04_local_data_lake_spark.sources.avro_io import spark_to_avro_schema

    df = spark.range(1).selectExpr("CAST(id AS DECIMAL(10,2)) AS money")
    with pytest.raises(ValueError, match="does not carry"):
        spark_to_avro_schema(df.schema)


def test_avro_dataset_schema_drift_detected(spark, tmp_path):
    """A dataset directory mixing two writer schemas must refuse to read —
    schema-on-read unioning across drifted files silently corrupts."""
    from deg04_local_data_lake_spark.sources.avro_io import (
        read_avro_dataset,
        write_avro_dataset,
    )

    p = str(tmp_path / "drift")
    write_avro_dataset(spark.range(2).selectExpr("id AS a"), p)
    # plant a second file with a different schema beside the first
    from deg04_local_data_lake_spark.sources import avro_io

    avro_io.write_container(
        p + "/part-drifted.avro",
        {"type": "record", "name": "row",
         "fields": [{"name": "b", "type": "long"}]},
        [{"b": 9}],
    )
    with pytest.raises(Exception, match="drift"):
        read_avro_dataset(spark, p).collect()


def test_compact_table(spark, smoke_dir, tmp_path):
    """Compaction rewrites a many-small-files table into few files with
    identical contents."""
    src = readers.load_table(spark, smoke_dir, "orders")
    p = str(tmp_path / "fragmented")
    src.repartition(40).write.parquet(p)  # simulate append fragmentation
    import glob

    assert len(glob.glob(p + "/*.parquet")) == 40
    before = sorted(map(tuple, spark.read.parquet(p).collect()))
    n = writers.compact_table(spark, p, target_file_bytes=64 * 1024 * 1024)
    files_after = glob.glob(p + "/*.parquet")
    assert len(files_after) == n < 40
    assert sorted(map(tuple, spark.read.parquet(p).collect())) == before


def test_versioned_table_time_travel(spark, smoke_dir, tmp_path):
    """Snapshot versioning contract: overwrites create new versions, old
    versions stay readable (time travel), rollback flips latest, vacuum
    drops history but never the published snapshot."""
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.sources.readers import load_table
    from deg04_local_data_lake_spark.sources.writers import (
        read_versioned,
        rollback_versioned,
        table_versions,
        vacuum_versioned,
        write_versioned,
    )

    path = str(tmp_path / "versioned")
    nation = load_table(spark, smoke_dir, "nation")
    assert write_versioned(nation, path) == 1
    assert write_versioned(nation.filter(F.col("n_nationkey") < 10), path) == 2
    assert write_versioned(nation.filter(F.col("n_nationkey") < 5), path) == 3

    n_all = nation.count()
    assert read_versioned(spark, path).count() == nation.filter(
        F.col("n_nationkey") < 5
    ).count()
    assert read_versioned(spark, path, version=1).count() == n_all  # time travel
    assert table_versions(path) == [1, 2, 3]

    rollback_versioned(path, 1)
    assert read_versioned(spark, path).count() == n_all

    # keeps the published v1 even though it is oldest
    doomed = vacuum_versioned(path, keep_last=1)
    assert 1 not in doomed
    assert read_versioned(spark, path).count() == n_all


def test_python_datasource_partitions_and_pushdown(spark):
    """Custom Python data source contract: registered format reads through
    the normal scan path, one task per day partition, and day/ticker
    equality filters prune at the SOURCE (pushFilters), not post-scan."""
    from pyspark.sql.datasource import EqualTo

    from deg04_local_data_lake_spark.sources.pyds import (
        TicksDataSource,
        TicksReader,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TicksDataSource)
    df = (
        spark.read.format("deg04_ticks")
        .option("days", 4)
        .option("tickers", "AA,BB")
        .option("rowsPerDay", 5)
        .load()
    )
    assert df.count() == 4 * 2 * 5
    assert df.rdd.getNumPartitions() == 4  # one per day

    # end-to-end: filtered read equals in-Spark filtering of the full read
    got = sorted(map(tuple, df.filter("day = 2 AND ticker = 'AA'").collect()))
    want = sorted(
        tuple(r) for r in df.collect() if r["day"] == 2 and r["ticker"] == "AA"
    )
    assert got == want and len(got) == 5

    # unit: the pushdown itself prunes partitions and accepts the filters
    reader = TicksReader({"days": "4", "tickers": "AA,BB", "rowsperday": "5"})
    leftover = list(
        reader.pushFilters([EqualTo(("day",), 2), EqualTo(("ticker",), "AA")])
    )
    assert leftover == []  # both handled at the source
    assert len(reader.partitions()) == 1
    assert reader.tickers == ["AA"]


def test_python_datasource_jsonl_sink_commit_protocol(spark, smoke_dir, tmp_path):
    """Custom Python sink: task temp files publish only via the driver's
    commit (atomic rename + _SUCCESS manifest) and the round-trip
    preserves every row."""
    import json
    import os

    from deg04_local_data_lake_spark.sources.pyds import JsonlDataSource
    from deg04_local_data_lake_spark.sources.readers import load_table

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "jsonl_out")
    nation = load_table(spark, smoke_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    nation.write.format("deg04_jsonl").option("path", out).mode(
        "append"
    ).save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(m["rows"] for m in manifest) == nation.count()
    assert not [f for f in os.listdir(out) if f.startswith("_tmp-")]

    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    got = sorted((r["n_nationkey"], r["n_name"]) for r in back.collect())
    want = sorted((r["n_nationkey"], r["n_name"]) for r in nation.collect())
    assert got == want


def test_write_observed_matches_direct_aggregates(spark, smoke_dir, tmp_path):
    """write_observed's in-flight metrics equal a separate aggregation of
    the same frame, and the write itself is intact."""
    from deg04_local_data_lake_spark.functions.portable import dec

    ev = readers.load_table(spark, smoke_dir, "events")
    out = str(tmp_path / "observed")
    got = writers.write_observed(
        ev,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_props": F.sum(F.col("props").isNull().cast("long")),
            "total_value": F.sum(dec("value")).cast("double"),
            "max_ts": F.max("ts"),
        },
    )
    direct = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("props").isNull().cast("long")).alias("n_null_props"),
        F.sum(dec("value")).cast("double").alias("total_value"),
        F.max("ts").alias("max_ts"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"]
    assert got["n_null_props"] == direct["n_null_props"]
    assert got["total_value"] == direct["total_value"]
    assert got["max_ts"] == direct["max_ts"]
    assert spark.read.parquet(out).count() == got["n_rows"]


def test_binary_file_ingestion(spark, tmp_path):
    """binaryFile source: exact bytes round-trip, glob pruning at listing
    time, and a metadata-only projection that never touches file bodies."""
    from deg04_local_data_lake_spark.sources.readers import read_binary_dir

    blobs = {"a.img": b"\x89fake-image-bytes\x00\x01", "b.img": b"\xffother\x10",
             "skip.txt": b"not media"}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)

    df = read_binary_dir(spark, str(tmp_path), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert rows == {k: v for k, v in blobs.items() if k.endswith(".img")}

    meta = df.select("path", "length").collect()
    assert sorted(r["length"] for r in meta) == sorted(
        len(v) for k, v in blobs.items() if k.endswith(".img")
    )
