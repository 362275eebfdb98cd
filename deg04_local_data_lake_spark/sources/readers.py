"""Scan operators (SURVEY.md §2.1, S1-S7).

All readers return lazy DataFrames so Catalyst can push filters/projections
into the file scan (check ``.explain``: ``PushedFilters`` / ``ReadSchema``).
At 100 TB the parquet reader relies on partition pruning + min/max row-group
skipping; nothing here materializes data on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """CSV scan with inferred (S1: custom/delta_table_write.py:53) or
    explicit (S2: scratchpads/financial_dl_etl.py:19-30) schema.

    Prefer an explicit schema at scale: inference triggers an extra full
    pass over the input.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", str(infer_schema).lower())
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines scan. Always pass an explicit schema in production:
    inference is an extra full pass, and JSON carries no type metadata
    (timestamps round-trip as ISO strings otherwise)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (PushedFilters + ReadSchema reach the scan)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan: one ``value: string`` column — the raw
    ingest format for unstructured corpora (one document/record per line)."""
    return spark.read.text(path)


def _timestamp_as_of_string(timestamp_ms: int) -> str:
    """Render an epoch-millis instant for delta-spark's ``timestampAsOf``
    option (a timestamp STRING, unlike Iceberg's epoch-millis
    ``as-of-timestamp``). The offset is EXPLICIT (``+00:00``): delta-spark
    parses a zone-less string in ``spark.sql.session.timeZone``, so on a
    non-UTC session (not built by this repo's factory, which sets UTC) a
    bare wall-clock string would read a shifted instant versus the
    jar-less epoch-ms path."""
    from datetime import datetime, timezone

    return (
        datetime.fromtimestamp(
            timestamp_ms / 1000.0, tz=timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
        + "+00:00"
    )


def read_lake_table(
    spark: SparkSession,
    path_or_name: str,
    fmt: str = "parquet",
    timestamp_as_of: int | None = None,
) -> DataFrame:
    """Lake-table scan: by path for delta/parquet (S3:
    custom/delta_table_read.py:31), by catalog name for managed/Iceberg
    tables (S4/S5: financial_dl_etl.py:46, custom/iceberg_demo_read.py:33).

    ``delta`` and ``iceberg`` paths work with OR without the runtime
    jars: when the format's DataSource is not on the classpath, the scan
    falls back to the from-scratch spec implementations
    (``sources/delta_log.py`` / ``sources/iceberg_tables.py``) — the
    same table layouts the jars produce, resolved offline. A path that
    contains a ``_delta_log`` / ``metadata/version-hint.text`` routes
    directly to the log reader even before trying the jar, so behavior
    is deterministic in both environments.

    ``timestamp_as_of`` is ``TIMESTAMP AS OF`` time travel for the
    delta/iceberg formats (delta-spark's ``timestampAsOf`` option /
    Iceberg's ``as-of-timestamp``), resolved against the deterministic
    caller-supplied commit timestamps."""
    import os

    if fmt == "catalog":
        return spark.table(path_or_name)
    if fmt == "delta" and os.path.isdir(
        os.path.join(path_or_name, "_delta_log")
    ):
        try:
            reader = spark.read.format("delta")
            if timestamp_as_of is not None:
                reader = reader.option(
                    "timestampAsOf", _timestamp_as_of_string(timestamp_as_of)
                )
            return reader.load(path_or_name)
        except Exception as exc:
            if not _is_missing_datasource(exc, "delta"):
                raise
            from deg04_local_data_lake_spark.sources.delta_log import (
                read_delta_log,
            )

            return read_delta_log(
                spark, path_or_name, timestamp_as_of=timestamp_as_of
            )
    if fmt == "iceberg" and os.path.exists(
        os.path.join(path_or_name, "metadata", "version-hint.text")
    ):
        try:
            reader = spark.read.format("iceberg")
            if timestamp_as_of is not None:
                reader = reader.option("as-of-timestamp", timestamp_as_of)
            return reader.load(path_or_name)
        except Exception as exc:
            if not _is_missing_datasource(exc, "iceberg"):
                raise
            from deg04_local_data_lake_spark.sources.iceberg_tables import (
                read_iceberg,
            )

            return read_iceberg(
                spark, path_or_name, as_of_timestamp_ms=timestamp_as_of
            )
    return spark.read.format(fmt).load(path_or_name)


def _is_missing_datasource(exc: Exception, fmt: str) -> bool:
    """True only when ``exc`` means the format's DataSource class is not
    on the classpath (the jar-less case this module's fallback exists
    for). Any OTHER failure — corrupt table, bad version, permissions —
    must propagate: silently re-reading through the from-scratch layer
    on a jarful cluster would mask the root cause and could return
    different results."""
    msg = str(exc)
    markers = (
        "DATA_SOURCE_NOT_FOUND",
        "Failed to find data source",
        "Failed to find the data source",
        "ClassNotFoundException",
        "NoClassDefFoundError",
    )
    return fmt in msg and any(m in msg for m in markers)


#: (applicationId, sf_dir, table) → StructType. Schema inference on a
#: bare-path parquet read is a driver JOB (Spark reads a footer to plan
#: the scan), and every registered query pays it PER TABLE PER RUN —
#: profiled at ~0.05-0.15 s each, q5's five-table join paid five. A real
#: lake deployment resolves table schemas from the catalog/metastore
#: (the reference's S4/S5 path) instead of re-inferring per query; this
#: memo is that catalog: schema METADATA only, never data or results —
#: every run still scans the parquet inputs in full.
_SCHEMA_MEMO: dict[tuple[str, str, str], object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md).

    ``events.parquet`` stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    parquet reader rejects. We read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``, runtime-settable) and convert
    with integer division — ``ts DIV 1000`` — to microseconds; float
    division would lose precision above 2^53 ns. DuckDB truncates
    nanos→micros the same way, so values stay oracle-identical.

    The result is TIMESTAMP_NTZ (wall time), built with ``timestampadd`` on
    an NTZ epoch — ``timestamp_micros`` would give TIMESTAMP_LTZ, whose
    collected value depends on the machine/session timezone and breaks
    oracle comparison off-UTC. Every other testdata timestamp is already
    read as NTZ.

    The first read of a table infers its schema (one footer job); later
    reads in the same session resolve it from ``_SCHEMA_MEMO`` the way a
    catalog table would from the metastore, skipping the inference job.
    """
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _SCHEMA_MEMO.get(key)
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts DIV 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def ingest_csv_directory(
    spark: SparkSession, folder: str, **csv_kwargs
) -> dict[str, DataFrame]:
    """S7 (custom/delta_table_write.py:49-56): one DataFrame per ``*.csv``
    in a directory, keyed by file stem — the reference's multi-table ingest
    loop. The listing is driver-side (tiny); each table's read is lazy.

    For *many* same-schema files prefer a single
    ``spark.read.csv(folder)`` + ``input_file_name()`` instead — one job,
    not one per file.
    """
    import os

    out: dict[str, DataFrame] = {}
    for fname in sorted(os.listdir(folder)):
        if fname.endswith(".csv"):
            out[fname[: -len(".csv")]] = read_csv(
                spark, os.path.join(folder, fname), **csv_kwargs
            )
    return out


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Raw-asset ingestion via Spark's ``binaryFile`` source: one row per
    file with (path, modificationTime, length, content) — the front door
    for image/audio/video corpora feeding the multimodal operators
    (operators/multimodal.py decodes/resizes/frame-samples the ``content``
    bytes downstream).

    Scale notes: ``pathGlobFilter`` prunes at the LISTING, before any read;
    file listing itself is distributed for large directory trees. Each
    file must fit in one row (~2 GB hard ceiling; large media should be
    chunked or referenced by path + byte-range instead). A projection that
    drops ``content`` never reads file bodies at all — metadata-only
    audits stay I/O-free."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)
