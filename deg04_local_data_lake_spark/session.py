"""SparkSession factory.

Mirrors the surface of the reference's session factory
(``mage_demo/utils/spark_session_factory.py:83-89`` — ``get_spark_session``
dispatching delta/iceberg wiring) but built for testability and scale:

- plain local mode by default (every operator runs on vanilla Parquet);
- Delta / Iceberg wiring is optional and gated behind import-try, so the
  engine never hard-depends on lake-format jars being present;
- scale-oriented defaults: AQE on (skew joins + partition coalescing),
  Arrow-accelerated Python interop, UTC session timezone (oracle parity),
  sized shuffle partitions.

At 100 TB the same factory is used with a cluster master URL; nothing here
assumes single-node execution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark_session(
    app_name: str = "deg04-lake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    ansi: bool | None = None,
    delta: bool = False,
    iceberg: bool = False,
    hive: bool = False,
    warehouse: str | None = None,
    s3_endpoint: str | None = None,
    s3_access_key: str | None = None,
    s3_secret_key: str | None = None,
    s3_path_style: bool = True,
    s3_ssl: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    Parameters mirror the reference factory's ``type``/kwargs surface
    (``spark_session_factory.py:53-89``): pass ``delta=True`` /
    ``iceberg=True`` to wire the respective catalog extensions when the
    packages are importable; otherwise the session is plain Parquet-capable,
    which every operator in this engine supports as a first-class format.

    ``s3_endpoint`` / ``s3_access_key`` / ``s3_secret_key`` wire an
    S3-compatible object store exactly as the reference's
    ``configure_s3`` does (``spark_session_factory.py:44-51,74-81``:
    endpoint, credentials, path-style access for MinIO-style stores,
    SSL toggle, the S3AFileSystem impl) — but through ``spark.hadoop.*``
    BUILDER conf rather than post-hoc ``sc._jsc.hadoopConfiguration()``
    mutation, so the settings reach every executor at startup and
    ``getOrCreate`` reuse can't race them. The keys land whether or not
    the hadoop-aws jar is present (conf is inert without it)."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # custom Python data sources (sources/pyds.py) implement
        # pushFilters — the capability is opt-in in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # generous driver memory for local[32] testing; on a real cluster
        # these come from spark-submit / cluster conf instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )

    if ansi is not None:
        # The reference runs ANSI-off (financial_dl_etl.py:13); Spark 4
        # defaults ANSI-on, which matches the DuckDB oracle's strictness.
        builder = builder.config("spark.sql.ansi.enabled", str(ansi).lower())

    if warehouse:
        builder = builder.config("spark.sql.warehouse.dir", warehouse)

    if hive:
        # Hive-metastore-backed catalog (the reference's
        # ``enableHiveSupport()`` + ``fin_invest`` DB,
        # financial_dl_bronze.py:45,8) using the local Derby metastore the
        # PySpark distribution ships. The metastore DB is pinned inside
        # ``warehouse`` so sessions are hermetic (Derby otherwise writes
        # ``metastore_db/`` to the process CWD). One Hive session per JVM:
        # the metastore client binds at first use, so tests exercise this
        # in a subprocess (tests/test_hive_catalog.py).
        builder = builder.enableHiveSupport()
        if warehouse:
            builder = builder.config(
                "spark.hadoop.javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={warehouse}/metastore_db;create=true",
            )

    if delta and _importable("delta"):
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )

    if iceberg and warehouse:
        builder = builder.config(
            "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
        ).config("spark.sql.catalog.local.type", "hadoop").config(
            "spark.sql.catalog.local.warehouse", warehouse
        )

    for k, v in s3a_conf(
        endpoint=s3_endpoint,
        access_key=s3_access_key,
        secret_key=s3_secret_key,
        path_style=s3_path_style,
        ssl=s3_ssl,
    ).items():
        builder = builder.config(k, v)

    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    return builder.getOrCreate()


def s3a_conf(
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = True,
    ssl: bool = False,
) -> dict[str, str]:
    """``spark.hadoop.fs.s3a.*`` conf for an S3-compatible object store —
    one key per ``hadoopConfiguration().set`` line in the reference's
    ``configure_s3`` (``spark_session_factory.py:44-51,74-81``): impl,
    endpoint, credentials, path-style access (MinIO-style stores route
    by path, not virtual host), SSL toggle. Empty dict when no S3
    parameter is supplied, so plain local sessions carry no S3 noise.
    Pure function: unit-testable without a JVM."""
    if not (endpoint or access_key or secret_key):
        return {}
    conf = {
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(ssl).lower(),
    }
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if access_key:
        conf["spark.hadoop.fs.s3a.access.key"] = access_key
    if secret_key:
        conf["spark.hadoop.fs.s3a.secret.key"] = secret_key
    return conf


def _importable(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except Exception:
        return False
