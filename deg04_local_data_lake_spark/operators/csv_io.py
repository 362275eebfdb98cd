"""CSV front-door queries (SURVEY.md §2.1 S1/S2), driver-checkable.

The reference's ingest entry point is CSV — inferred schema
(``custom/delta_table_write.py:53``) and explicit ``StructType``
(``scratchpads/financial_dl_etl.py:19-30``). Rounds 1-2 covered both in
pytest only; these queries give S1/S2 DuckDB-oracle rows: each writes a
deterministic CSV projection of a testdata table, reads it back through
``sources.readers.read_csv`` (the same front door a user ingests
through), and aggregates — so a type lost or mangled in the CSV
round-trip breaks the hash against the parquet-sourced oracle.

Money values ride DECIMAL sums (2-decimal source values round-trip
exactly through Spark's shortest-repr CSV writer at DECIMAL(38,10) —
see functions/portable.py for the engine's exact-decimal posture).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table, read_csv


def _csv_path(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), "deg04_csv_front", tag, name)


def _orders_csv(spark: SparkSession, sf_dir: str) -> str:
    """Write the orders columns under test as CSV (overwrite: idempotent,
    deterministic content — the driver may invoke a query many times)."""
    path = _csv_path(sf_dir, "orders_csv")
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite")
        .option("header", "true")
        .csv(path)
    )
    return path


@register(
    "csv_scan_inferred",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY 1
""",
)
def csv_scan_inferred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — CSV scan with header + schema inference
    (``custom/delta_table_write.py:53``): orders → CSV → inferred read →
    per-priority rollup. Inference must recover BIGINT keys, DATE
    order-dates and DOUBLE prices for the oracle hash to match; at scale
    prefer S2 (inference costs an extra full pass — readers.read_csv
    docstring)."""
    src = _orders_csv(spark, sf_dir)
    df = read_csv(spark, src)  # header=True, inferSchema=True
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min(F.col("o_orderdate").cast("date")).cast("string").alias("first_day"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "csv_scan_explicit",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS revenue,
       CAST(max(o_custkey) AS BIGINT) AS max_custkey
FROM orders GROUP BY 1
""",
)
def csv_scan_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — CSV scan with an explicit ``StructType``
    (``financial_dl_etl.py:19-30``), using the reference's max-precision
    DECIMAL(38,10) money type: no inference pass, types land exactly as
    declared."""
    src = _orders_csv(spark, sf_dir)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderdate", DateType()),
            StructField("o_orderpriority", StringType()),
            StructField("o_totalprice", DecimalType(38, 10)),
        ]
    )
    df = read_csv(spark, src, schema=schema)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("o_totalprice").cast("double").alias("revenue"),
        F.max("o_custkey").cast("bigint").alias("max_custkey"),
    )


def _events_json(spark: SparkSession, sf_dir: str) -> str:
    """Write an events projection as JSON-lines (overwrite: idempotent)."""
    path = _csv_path(sf_dir, "events_json")
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite")
        # default NTZ format truncates to milliseconds — keep microseconds
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )
    return path


@register(
    "json_scan_lines",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       CAST(max(ts) AS VARCHAR) AS last_ts
FROM events GROUP BY 1
""",
)
def json_scan_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines front door (the third text ingest format next to the
    CSV pair): events → JSON → explicit-schema read → per-type rollup.
    The schema declares ``ts`` as TIMESTAMP_NTZ, so the writer's ISO
    strings must parse back to the exact wall times for the oracle hash
    to match — the round-trip IS the test. Schema-first for the same
    reason as S2: inference over JSON costs a full extra pass at scale,
    and open-ended JSON belongs to the variant/get_json_object paths
    (``variant_props_extract``, ``events_json_extract``), not the
    front door."""
    from pyspark.sql.types import DoubleType, TimestampNTZType

    src = _events_json(spark, sf_dir)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(src)
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
        F.max("ts").cast("string").alias("last_ts"),
    )


@register(
    "orc_scan_roundtrip",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem GROUP BY 1
""",
)
def orc_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC front door: lineitem → ORC → read → per-flag rollup. The
    second columnar format beside parquet (both Spark-native: predicate
    pushdown, column pruning, vectorized reader); decimals are stored
    typed, so the money sums round-trip exactly. Kept beside the
    parquet path so a lake standardizing on ORC runs the same engine
    unchanged."""
    path = _csv_path(sf_dir, "lineitem_orc")
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .write.mode("overwrite")
        .orc(path)
    )
    df = spark.read.orc(path)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("gross"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    )


@register(
    "avro_scan_roundtrip",
    oracle="""
SELECT CAST(s_nationkey AS INTEGER) AS s_nationkey,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
       CAST(max(s_suppkey) AS BIGINT) AS max_suppkey
FROM supplier GROUP BY 1
""",
)
def avro_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro front door WITHOUT the spark-avro jar: supplier → Avro object
    container files (from-scratch codec, ``sources/avro_io.py``) → read →
    per-nation rollup. The same binary codec that decodes Iceberg
    manifests here carries row data both directions: the writer fans out
    one container file per partition on executors, the reader plans one
    partition per file — so the round-trip exercises zigzag varints,
    ``["null", T]`` unions, and the block/sync framing end-to-end against
    the parquet-sourced oracle. Avro is the interchange/row format beside
    the CSV/JSON/XML doors; the scan path for analytics stays columnar."""
    from deg04_local_data_lake_spark.sources.avro_io import (
        read_avro_dataset,
        write_avro_dataset,
    )

    path = _csv_path(sf_dir, "supplier_avro")
    src = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    write_avro_dataset(src, path)
    df = read_avro_dataset(spark, path)
    return df.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_balance"),
        F.max("s_suppkey").cast("bigint").alias("max_suppkey"),
    )


@register(
    "xml_scan_roundtrip",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
       CAST(max(c_custkey) AS BIGINT) AS max_custkey
FROM customer GROUP BY 1
""",
)
def xml_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML front door (built into Spark 4 — the former spark-xml
    package's ``format("xml")``): customer → XML elements → explicit
    -schema read → per-segment rollup. Schema-first for the same reason
    as the CSV/JSON doors: XML inference costs a full extra pass, and a
    declared schema keeps the money column typed DECIMAL through the
    text round-trip so the oracle hash is exact. ``rowTag`` selection is
    the XML-specific contract under test — the reader must bind repeated
    ``<customer>`` elements to rows, not the document root."""
    from pyspark.sql.types import DoubleType

    path = _csv_path(sf_dir, "customer_xml")
    (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "customers")
        .option("rowTag", "customer")
        .save(path)
    )
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    )
    df = spark.read.schema(schema).option("rowTag", "customer").format("xml").load(path)
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_balance"),
        F.max("c_custkey").cast("bigint").alias("max_custkey"),
    )


@register(
    "directory_ingest_manifest",
    oracle="""
SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows FROM customer
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'region', COUNT(*) FROM region
""",
)
def directory_ingest_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — directory → multi-table ingest, driver-attested: four tables
    are exported as ``*.csv`` into one folder, ``ingest_csv_directory``
    discovers them by file stem (the reference's multi-table loop,
    ``custom/delta_table_write.py:49-56``), and the query emits one
    manifest row per discovered table with its ingested row count. A
    table lost in discovery or rows lost in the CSV round-trip break the
    hash. The per-table counts union via a driver-side loop over a
    4-entry dict — the LISTING is driver-side (tiny); each count is a
    distributed job."""
    import os

    from deg04_local_data_lake_spark.sources.readers import (
        ingest_csv_directory,
    )

    folder = _csv_path(sf_dir, "multi_table_dir")
    for t in ("customer", "nation", "orders", "region"):
        (
            load_table(spark, sf_dir, t)
            .write.mode("overwrite")
            .option("header", "true")
            .csv(os.path.join(folder, f"_{t}_staging"))
        )
        # Spark writes a directory; the ingest loop expects name.csv files
    # consolidate each staged dir into a single name.csv file
    import glob
    import shutil

    for t in ("customer", "nation", "orders", "region"):
        staged = os.path.join(folder, f"_{t}_staging")
        parts = sorted(glob.glob(os.path.join(staged, "part-*.csv")))
        dest = os.path.join(folder, f"{t}.csv")
        with open(dest, "wb") as out:
            for i, p in enumerate(parts):
                with open(p, "rb") as src:
                    if i > 0:
                        src.readline()  # drop repeated header
                    shutil.copyfileobj(src, out)
        shutil.rmtree(staged)

    tables = ingest_csv_directory(spark, folder, header=True, infer_schema=True)
    manifest = None
    for name in sorted(tables):
        row = tables[name].agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        manifest = row if manifest is None else manifest.unionByName(row)
    return manifest


@register(
    "catalog_external_table_scan",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY 1
""",
)
def catalog_external_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D3/S4 — catalog-addressed scan of an external table,
    driver-attested: CREATE DATABASE + CREATE TABLE … USING parquet
    LOCATION over the existing lake files (the reference's bronze DDL,
    ``financial_dl_bronze.py:8,14-29``), then read through
    ``spark.table`` — the catalog name, not the path. The location
    points at the SAME files every path-addressed query scans, so the
    hash match proves catalog resolution adds nothing and loses nothing.
    DDL is idempotent (IF NOT EXISTS + DROP first) because the driver
    may invoke the query repeatedly in one session."""
    from deg04_local_data_lake_spark.sources import catalog as cat

    cat.create_database(spark, "deg04_extcat")
    cat.drop_table(spark, "deg04_extcat.orders_ext")
    cat.create_table(
        spark,
        "deg04_extcat.orders_ext",
        {
            "o_orderkey": "bigint",
            "o_custkey": "bigint",
            "o_orderstatus": "string",
            "o_totalprice": "double",
            "o_orderdate": "timestamp_ntz",
            "o_orderpriority": "string",
        },
        location=f"{sf_dir}/orders.parquet",
    )
    df = spark.table("deg04_extcat.orders_ext")
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
