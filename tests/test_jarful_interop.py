"""External-reader interop for the from-scratch table-format layers
(VERDICT r6 task #6): where the STOCK readers are actually installed,
round-trip a table written by ``sources/delta_log.py`` /
``sources/iceberg_tables.py`` through them and assert frame equality —
turning the spec-conformance claims (z85 + RoaringBitmapArray DV framing,
column mapping, protocol features, manifest/avro layout) from argued into
attested. In jar-less environments both tests SKIP cleanly; the driver's
pytest run records the skip, and any jarful deployment runs them as-is.

Each test drives a fresh interpreter (the ``test_hive_catalog`` pattern):
the stock readers need their session extensions installed at JVM startup,
which the shared test session deliberately does not do."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _iceberg_runtime_on_classpath() -> bool:
    """True when an iceberg-spark-runtime jar is visible to pyspark (the
    Iceberg DataSource ships as a jar only — no pip module to gate on)."""
    try:
        import pyspark

        spark_home = os.path.dirname(pyspark.__file__)
    except Exception:
        return False
    pats = [
        os.path.join(spark_home, "jars", "iceberg-spark-runtime*.jar"),
        os.path.join(os.environ.get("SPARK_HOME", "/nonexistent"), "jars",
                     "iceberg-spark-runtime*.jar"),
    ]
    return any(glob.glob(p) for p in pats)


_DELTA_CHILD = """
import sys, tempfile
sys.path.insert(0, {repo!r})
from deg04_local_data_lake_spark.session import get_spark_session
import deg04_local_data_lake_spark.sources.delta_log as dl
from pyspark.sql import functions as F

spark = get_spark_session(
    app_name="delta-interop", master="local[2]", shuffle_partitions=2,
    delta=True,
)
spark.sparkContext.setLogLevel("ERROR")

table = tempfile.mkdtemp(prefix="deg04-delta-interop-") + "/tbl"
df = spark.range(0, 100).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS v")

# exercise the protocol features the from-scratch writer claims:
# plain commits, a DV delete (z85 + RoaringBitmapArray framing), a
# rename (column mapping), and a timestamped append
dl.write_delta_commit(df, table, commit_timestamp=1000)
dl.delete_delta(spark, table, "id % 10 = 0")          # deletion vectors
dl.rename_delta_column(spark, table, {{"v": "val"}})   # column mapping
dl.write_delta_commit(
    spark.range(100, 120).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS val"),
    table, commit_timestamp=2000,
)

ours = sorted(tuple(r) for r in dl.read_delta_log(spark, table).collect())
stock = sorted(
    tuple(r) for r in spark.read.format("delta").load(table).collect()
)
assert stock == ours, (len(stock), len(ours))
assert len(stock) == 110  # 100 - 10 deleted + 20 appended

# VERSION AS OF through the stock reader must see pre-delete state
v0 = spark.read.format("delta").option("versionAsOf", 0).load(table)
assert v0.count() == 100
# TIMESTAMP AS OF: the jarful path takes a timestamp string (readers.py
# converts); resolution must agree with the jar-less layer
from deg04_local_data_lake_spark.sources.readers import read_lake_table
asof = read_lake_table(spark, table, fmt="delta", timestamp_as_of=1000)
assert asof.count() == 100
print("DELTA-INTEROP-OK")
"""

_ICEBERG_CHILD = """
import sys, tempfile
sys.path.insert(0, {repo!r})
from deg04_local_data_lake_spark.session import get_spark_session
import deg04_local_data_lake_spark.sources.iceberg_tables as ice

wh = tempfile.mkdtemp(prefix="deg04-ice-interop-")
spark = get_spark_session(
    app_name="iceberg-interop", master="local[2]", shuffle_partitions=2,
    iceberg=True, warehouse=wh,
)
spark.sparkContext.setLogLevel("ERROR")

table = wh + "/db/tbl"
df = spark.range(0, 100).selectExpr("id", "CAST(id * 3 AS DOUBLE) AS v")
ice.write_iceberg_commit(df, table, timestamp_ms=1000)
ice.delete_iceberg(spark, table, "id % 10 = 0", timestamp_ms=2000)

ours = sorted(tuple(r) for r in ice.read_iceberg(spark, table).collect())
# stock reader: hadoop-table path load (no catalog registration needed)
stock = sorted(
    tuple(r) for r in spark.read.format("iceberg").load(table).collect()
)
assert stock == ours, (len(stock), len(ours))
assert len(stock) == 90
print("ICEBERG-INTEROP-OK")
"""


def _run_child(code: str, marker: str) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", code.format(repo=_REPO)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert marker in proc.stdout, proc.stdout[-2000:]


def test_stock_delta_reader_reads_our_dv_column_mapped_table():
    pytest.importorskip("delta")  # stock delta-spark present → jar wired
    _run_child(_DELTA_CHILD, "DELTA-INTEROP-OK")


def test_stock_iceberg_reader_reads_our_v2_table():
    if not _iceberg_runtime_on_classpath():
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    _run_child(_ICEBERG_CHILD, "ICEBERG-INTEROP-OK")


def test_timestamp_as_of_string_is_zone_explicit():
    """Round-8 ADVICE fix: the jarful timestampAsOf string carries an
    explicit +00:00 offset — delta-spark parses a zone-LESS string in
    spark.sql.session.timeZone, so on a non-UTC session a bare
    wall-clock string reads a shifted instant vs the epoch-ms path."""
    from deg04_local_data_lake_spark.sources.readers import (
        _timestamp_as_of_string,
    )

    assert _timestamp_as_of_string(0) == "1970-01-01 00:00:00.000+00:00"
    assert (
        _timestamp_as_of_string(1_700_000_000_123)
        == "2023-11-14 22:13:20.123+00:00"
    )
