"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL side-by-side on the
same parquet tables and compares row count, column names, and values
(order-insensitive, exact by default). Used by ``tests/test_parity.py`` so
that what passes locally passes the driver's CORRECTNESS check.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from deg04_local_data_lake_spark.sources.readers import TESTDATA_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols: list[str], data: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr-keyed sort: rows may mix None with values, which plain tuple
    # comparison cannot order; equal values have equal reprs, so both
    # engines' equal multisets sort identically
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in data),
        key=lambda t: tuple(repr(v) for v in t),
    )


def compare(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, str]:
    """Return (ok, message). Exact value comparison after per-row
    normalization and column-name sort — strictly at least as strict as the
    driver's value-hash."""
    s_cols = spark_df.columns
    s_data = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_data = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_data) != len(d_data):
        return False, f"row count differs: spark={len(s_data)} duckdb={len(d_data)}"
    sr, dr = _rows(s_cols, s_data), _rows(d_cols, d_data)
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return False, f"first value mismatch at sorted-row {i}:\n  spark : {a}\n  duckdb: {b}"
    return True, f"ok ({len(s_data)} rows)"


def check_query(
    spark: SparkSession, sf_dir: str, name: str
) -> tuple[bool, str]:
    from deg04_local_data_lake_spark import registry

    q = registry.queries()[name]
    sql = registry.oracles().get(name)
    df = q(spark, sf_dir)
    if sql is None:
        n = df.count()
        return n >= 0, f"rows-only check: {n} rows"
    con = duckdb_connect(sf_dir)
    try:
        return compare(df, con, sql)
    finally:
        con.close()
