"""Hive-metastore-backed DDL parity (SURVEY.md §2.3 D1-D5 through
``enableHiveSupport()``, matching scratchpads/financial_dl_bronze.py:8,45).

The reference runs its DDL against a Hive metastore; rounds 1-2 only
exercised the in-memory catalog. A Hive session binds the (Derby)
metastore client once per JVM, so this test drives a fresh interpreter:
the child creates a ``fin_invest``-shaped database, a partitioned
LOCATION table, writes/reads it as a catalog table, lists and drops it —
the full D1-D5 surface against a real metastore."""

from __future__ import annotations

import subprocess
import sys

_CHILD = """
import sys, tempfile
sys.path.insert(0, {repo!r})
from deg04_local_data_lake_spark.session import get_spark_session
from deg04_local_data_lake_spark.sources import catalog
from pyspark.sql import functions as F

wh = tempfile.mkdtemp(prefix="deg04-hive-wh-")
spark = get_spark_session(
    app_name="hive-ddl", master="local[2]", shuffle_partitions=2,
    hive=True, warehouse=wh,
)
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

# D1: CREATE DATABASE (fin_invest shape, financial_dl_bronze.py:8)
catalog.create_database(spark, "fin_invest")

# D3: CREATE TABLE ... USING parquet PARTITIONED BY ... LOCATION
# (financial_dl_bronze.py:14-29 -- Delta there, parquet here: the
# format flag is orthogonal to the metastore path being exercised)
loc = wh + "/fin_invest/stock_quotes_bronze"
catalog.create_table(
    spark,
    "fin_invest.stock_quotes_bronze",
    {{"trade_date": "DATE", "ticker": "STRING", "open": "DECIMAL(38,10)",
      "close": "DECIMAL(38,10)", "volume": "BIGINT"}},
    fmt="parquet",
    partitioned_by=["trade_date"],
    location=loc,
)

# S4/K6: write into + read back through the catalog name
rows = spark.createDataFrame(
    [("2024-01-02", "AAPL", 190.0, 191.5, 1000), ("2024-01-03", "AAPL", 191.5, 192.0, 1200)],
    "trade_date string, ticker string, open double, close double, volume long",
).select(
    # insertInto is positional and the metastore moves partition columns
    # to the END of the table schema: (ticker, open, close, volume, trade_date)
    "ticker",
    F.col("open").cast("decimal(38,10)"), F.col("close").cast("decimal(38,10)"),
    "volume", F.col("trade_date").cast("date"),
)
rows.write.mode("overwrite").insertInto("fin_invest.stock_quotes_bronze")
back = spark.table("fin_invest.stock_quotes_bronze")
assert back.count() == 2, back.count()
assert {{r["ticker"] for r in back.collect()}} == {{"AAPL"}}

# metastore round-trip: a SECOND session context sees the table via the
# same metastore (catalog object, not session state)
assert spark.catalog.tableExists("fin_invest.stock_quotes_bronze")

# D5: SHOW TABLES
names = {{r["tableName"] for r in catalog.show_tables(spark, "fin_invest").collect()}}
assert "stock_quotes_bronze" in names, names

# D2 + D4: DROP TABLE / DROP DATABASE
catalog.drop_table(spark, "fin_invest.stock_quotes_bronze")
assert not spark.catalog.tableExists("fin_invest.stock_quotes_bronze")
catalog.drop_database(spark, "fin_invest")
assert "fin_invest" not in [d.name for d in spark.catalog.listDatabases()]
print("HIVE_OK")
spark.stop()
"""


def test_hive_metastore_ddl_roundtrip():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "HIVE_OK" in proc.stdout
