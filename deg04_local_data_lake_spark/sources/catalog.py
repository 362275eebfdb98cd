"""Catalog / DDL layer (SURVEY.md §2.3, D1-D5).

Thin helpers over ``spark.sql`` DDL — the reference drives its lakehouse
through SQL DDL text (scratchpads/financial_dl_bronze.py:8-37 et al.); we
expose the same operations as functions so pipelines and tests can manage
databases/tables without string templating at call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_database(spark: SparkSession, name: str) -> None:
    """D1 (financial_dl_bronze.py:8)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def drop_database(spark: SparkSession, name: str, cascade: bool = True) -> None:
    """D4 (financial_dl_bronze.py:37)."""
    spark.sql(f"DROP DATABASE IF EXISTS {name}" + (" CASCADE" if cascade else ""))


def drop_table(spark: SparkSession, name: str) -> None:
    """D2 (financial_dl_bronze.py:11,36)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def create_table(
    spark: SparkSession,
    name: str,
    columns: dict[str, str],
    fmt: str = "parquet",
    partitioned_by: list[str] | None = None,
    location: str | None = None,
) -> None:
    """D3 — ``CREATE TABLE … USING <fmt> [PARTITIONED BY …] [LOCATION …]``
    (financial_dl_bronze.py:14-29)."""
    cols = ", ".join(f"{c} {t}" for c, t in columns.items())
    sql = f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING {fmt}"
    if partitioned_by:
        sql += f" PARTITIONED BY ({', '.join(partitioned_by)})"
    if location:
        sql += f" LOCATION '{location}'"
    spark.sql(sql)


def show_tables(spark: SparkSession, database: str | None = None) -> DataFrame:
    """D5 (scratchpads/delta_datalake.py:77)."""
    return spark.sql(f"SHOW TABLES IN {database}" if database else "SHOW TABLES")


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view, enabling the SQL-text
    entry point (SURVEY.md §3 EP2: the reference drives DDL/queries through
    ``spark.sql``)."""
    from deg04_local_data_lake_spark.sources.readers import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
