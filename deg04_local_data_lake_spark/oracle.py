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
    import os

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written tables are DIRECTORIES of part files — DuckDB
            # needs the glob form (lets the scale-up study's derived
            # datasets run the same oracle comparison as the driver's)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
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


def _driver_norm(v: Any) -> Any:
    """Scalar normalization for the driver-mirror canonicalization.

    Unlike ``_norm`` this deliberately does NOT convert lists to tuples —
    the whole point is to hit pandas with the same cell types the driver's
    harness sees, so unhashable shapes crash locally first. bytearray
    (Spark BinaryType) is converted to bytes, matching what a harness gets
    after Arrow conversion."""
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def driver_canonical_hash(cols: list[str], data: list[tuple]) -> int:
    """Mirror of the external driver's canonicalization pipeline, per its
    recorded traceback: pandas DataFrame → ``sort_values`` over ALL
    name-sorted columns (lexsort → factorize → hash table) → row digest.

    ``factorize`` requires every cell to be hashable, so a query emitting
    raw ``array<...>`` columns raises ``TypeError: unhashable type``
    here — exactly where the driver dies — instead of passing the local
    gate and going red remotely (this gap hid the ``normalize_embeddings``
    defect for a round)."""
    import pandas as pd

    order = sorted(cols)
    pdf = pd.DataFrame(
        [tuple(_driver_norm(v) for v in r) for r in data], columns=list(cols)
    )
    if len(pdf):
        pdf = pdf[order].sort_values(by=order, kind="mergesort", na_position="last")
    else:
        pdf = pdf.reindex(columns=order)
    digest = 0
    for t in pdf.itertuples(index=False, name=None):
        # NaN normalized at digest time only: CPython ≥3.10 hashes NaN by
        # object identity, which would make equal frames digest unequal.
        digest = (digest * 1_000_003 + hash(
            tuple("NaN" if isinstance(v, float) and math.isnan(v) else v for v in t)
        )) & 0xFFFFFFFFFFFFFFFF
    return digest


#: Result-column types banned from compared output.  The driver
#: canonicalizes through pandas: DuckDB materializes HUGEINT/DECIMAL as
#: float64 while Spark's Arrow path materializes DecimalType as
#: object-dtype ``decimal.Decimal`` — equal values, different bytes under
#: factorize/hash.  Both round-5 reds (``q12_late_priority_counts``,
#: ``orders_filter_project``) were exactly this; the lint closes the class.
def _banned_duckdb_type(type_str: str) -> bool:
    t = type_str.upper()
    return t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")


def _spark_decimal_fields(schema) -> list[str]:
    """Names of top-level or nested fields with DecimalType."""
    from pyspark.sql import types as T

    bad: list[str] = []

    def walk(dt, path: str) -> None:
        if isinstance(dt, T.DecimalType):
            bad.append(path)
        elif isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(f.dataType, f"{path}.{f.name}" if path else f.name)
        elif isinstance(dt, T.ArrayType):
            walk(dt.elementType, f"{path}[]")
        elif isinstance(dt, T.MapType):
            walk(dt.keyType, f"{path}<key>")
            walk(dt.valueType, f"{path}<value>")

    walk(schema, "")
    return bad


def lint_result_types(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str | None
) -> str | None:
    """Return an error message if either engine's output schema contains a
    type the driver's pandas canonicalization materializes differently per
    engine (Spark DecimalType; DuckDB HUGEINT/DECIMAL), else ``None``.

    Bind-time only — the oracle relation is never executed here."""
    bad = _spark_decimal_fields(spark_df.schema)
    if bad:
        return f"spark output contains DecimalType column(s) {bad}: cast to DOUBLE/BIGINT"
    if sql is not None:
        rel = con.sql(sql)
        offenders = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, (str(t) for t in rel.types))
            if _banned_duckdb_type(str(t))
        ]
        if offenders:
            return (
                f"oracle output contains HUGEINT/DECIMAL column(s) {offenders}: "
                "wrap in CAST(... AS BIGINT/DOUBLE)"
            )
    return None


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
    lint = lint_result_types(spark_df, con, sql)
    if lint is not None:
        return False, f"result-type lint: {lint}"
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
    # Driver-mirror gate: the external harness canonicalizes via a pandas
    # sort over every column, which requires hashable scalar cells.  Run
    # the same path on BOTH results so a non-canonicalizable output shape
    # (raw array/map columns) or a dtype-level divergence fails here, not
    # in the remote attestation.
    try:
        sh = driver_canonical_hash(s_cols, s_data)
        dh = driver_canonical_hash(d_cols, d_data)
    except TypeError as exc:
        return False, f"driver canonicalization would crash: {exc}"
    if sh != dh:
        return False, "driver-mirror canonical hash differs (values equal under local norm)"
    return True, f"ok ({len(s_data)} rows)"


def check_query(
    spark: SparkSession, sf_dir: str, name: str
) -> tuple[bool, str]:
    from deg04_local_data_lake_spark import registry

    q = registry.queries()[name]
    sql = registry.oracles().get(name)
    df = q(spark, sf_dir)
    if sql is None:
        # Rows-only queries still pass through the driver's harness —
        # make sure their output shape canonicalizes too.
        bad = _spark_decimal_fields(df.schema)
        if bad:
            return False, f"result-type lint: DecimalType column(s) {bad}"
        data = [tuple(r) for r in df.collect()]
        try:
            driver_canonical_hash(df.columns, data)
        except TypeError as exc:
            return False, f"driver canonicalization would crash: {exc}"
        return True, f"rows-only check: {len(data)} rows"
    con = duckdb_connect(sf_dir)
    try:
        return compare(df, con, sql)
    finally:
        con.close()
