"""CDC upsert — the reference's one composite algorithm
(SURVEY.md §2.5 J1-J3, scratchpads/increamental_dataload.py:49-85).

The reference detects changed records (inner equi-join + any-column-differs
filter), new records (left_outer + isNull — idiomatically an anti-join),
applies updates (left_outer + per-column ``coalesce``), and unions. We
expose the same semantics as one reusable operator, ``cdc_upsert``, plus
the individual detection joins as their own queries.

Scale notes: the incremental batch is normally ≪ base, so Spark broadcasts
it and the base table never shuffles — verify ``BroadcastHashJoin`` in the
plan. With a Delta-enabled session the whole operator collapses into a
single ``MERGE INTO`` (transactional, file-skipping on the join key); the
join formulation here is the format-agnostic fallback and the semantic
spec. The reference's ``coalesce(1)`` mid-pipeline
(increamental_dataload.py:73) is deliberately NOT reproduced — it
serializes the write at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

# Derived employees-analog fixture (FIXTURES.md F4): base = customer;
# incremental = updates to every 10th customer + new ids from supplier.
_BASE_SQL = """
SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment
FROM customer
"""
_INC_SQL = """
SELECT c_custkey AS id, c_name AS name, c_acctbal + 100.0 AS acctbal,
       'UPDATED' AS segment
FROM customer WHERE c_custkey % 10 = 0
UNION ALL
SELECT 1000000 + s_suppkey, s_name, s_acctbal, 'NEW' FROM supplier
"""


def _base_inc(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    base = customer.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    inc = customer.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        (F.col("c_acctbal") + 100.0).alias("acctbal"),
        F.lit("UPDATED").alias("segment"),
    ).unionByName(
        supplier.select(
            (F.lit(1000000) + F.col("s_suppkey")).alias("id"),
            F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("acctbal"),
            F.lit("NEW").alias("segment"),
        )
    )
    return base, inc


def changed_records(base: DataFrame, inc: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """J1 (increamental_dataload.py:49-53): inner equi-join + any-column-
    differs residual filter. Null-safe comparison (``eqNullSafe``) — the
    reference's ``!=`` silently drops rows where either side is NULL."""
    i = inc.select(F.col(key).alias("inc_key"), *[F.col(c).alias(f"inc_{c}") for c in cols])
    cond = None
    for c in cols:
        diff = ~F.col(c).eqNullSafe(F.col(f"inc_{c}"))
        cond = diff if cond is None else (cond | diff)
    return (
        base.join(F.broadcast(i), base[key] == i.inc_key, "inner")
        .filter(cond)
        .select(key, *[c for c in cols], *[f"inc_{c}" for c in cols])
    )


def new_records(base: DataFrame, inc: DataFrame, key: str) -> DataFrame:
    """J2: the reference's left_outer + isNull (increamental_dataload.py:60)
    expressed as the idiomatic ``left_anti`` join — same semantics, no
    NULL-column materialization, and Spark can broadcast the base's key
    column only."""
    return inc.join(base.select(key), on=key, how="left_anti")


def cdc_upsert(base: DataFrame, inc: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """J3 + U1 (increamental_dataload.py:69-85): apply updates via
    left-join + per-column coalesce, then union the new records by name."""
    i = inc.select(F.col(key).alias("inc_key"), *[F.col(c).alias(f"inc_{c}") for c in cols])
    updated = base.join(F.broadcast(i), base[key] == i.inc_key, "left").select(
        base[key],
        *[F.coalesce(F.col(f"inc_{c}"), base[c]).alias(c) for c in cols],
    )
    return updated.unionByName(new_records(base, inc, key))


def cdc_upsert_delta(
    spark: SparkSession, target_table: str, inc: DataFrame, key: str, cols: list[str]
) -> None:
    """Transactional CDC upsert as one Delta ``MERGE INTO`` — the idiomatic
    realization of the reference's join pipeline when a Delta session is
    wired (SURVEY.md §7 P2). Delta prunes target files by the merge key's
    min/max stats, so only touched files rewrite. Requires the
    ``delta-spark`` package (gated; the join-based :func:`cdc_upsert` is
    the format-agnostic fallback)."""
    inc.createOrReplaceTempView("_cdc_inc")
    sets = ", ".join(f"t.{c} = s.{c}" for c in cols)
    vals = ", ".join([key, *cols])
    svals = ", ".join(f"s.{c}" for c in [key, *cols])
    spark.sql(
        f"MERGE INTO {target_table} t USING _cdc_inc s ON t.{key} = s.{key} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({vals}) VALUES ({svals})"
    )


def cdc_upsert_foreach_batch(
    batch_inc: DataFrame, snapshot_path: str, key: str, cols: list[str]
) -> None:
    """Streaming CDC sink body (``foreachBatch``): apply one microbatch of
    changes onto a parquet snapshot via the join-based upsert and atomically
    replace it. Parquet has no transaction log, so the rewrite is
    whole-snapshot — acceptable for compact dimension snapshots; use
    :func:`cdc_upsert_delta` for fact-scale targets."""
    spark = batch_inc.sparkSession
    base = spark.read.parquet(snapshot_path)
    merged = cdc_upsert(base, batch_inc, key, cols)
    tmp = snapshot_path.rstrip("/") + "__staged"
    merged.write.mode("overwrite").parquet(tmp)
    import shutil

    # swap with the old snapshot parked aside, so a crash at any point
    # leaves a complete copy recoverable (staged or backup) — never a
    # window with no snapshot at all
    bak = snapshot_path.rstrip("/") + "__bak"
    shutil.rmtree(bak, ignore_errors=True)
    shutil.move(snapshot_path, bak)
    shutil.move(tmp, snapshot_path)
    shutil.rmtree(bak)


_EMP_BASE = [(1, "Alice", 30, 50000), (2, "Bob", 35, 60000), (3, "Carol", 28, 55000)]
_EMP_INC = [
    (1, "Alice", 31, 50000),
    (2, "Bob", 35, 65000),
    (3, "Caroline", 29, 58000),
    (4, "Dan", 40, 52000),
]
_EMP_SCHEMA = "id int, name string, age int, salary int"


def _values_sql(rows: list[tuple]) -> str:
    return ", ".join(
        f"({r[0]}, '{r[1]}', {r[2]}, {r[3]})" for r in rows
    )


@register(
    "cdc_upsert_employees_reference",
    oracle=f"""
WITH base(id, name, age, salary) AS (VALUES {_values_sql(_EMP_BASE)}),
inc(id, name, age, salary) AS (VALUES {_values_sql(_EMP_INC)}),
updated AS (
  SELECT base.id,
         coalesce(inc.name, base.name) AS name,
         coalesce(inc.age, base.age) AS age,
         coalesce(inc.salary, base.salary) AS salary
  FROM base LEFT JOIN inc ON base.id = inc.id
)
SELECT * FROM updated
UNION ALL
SELECT inc.* FROM inc WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.id = inc.id)
""",
)
def cdc_upsert_employees_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact employee fixture (S6 in-memory rows →
    DataFrame, increamental_dataload.py:9-45) through the CDC upsert —
    expected output is the reference's 4-row final frame (3 updated + 1
    new, FIXTURES.md F4)."""
    base = spark.createDataFrame(_EMP_BASE, _EMP_SCHEMA)
    inc = spark.createDataFrame(_EMP_INC, _EMP_SCHEMA)
    return cdc_upsert(base, inc, "id", ["name", "age", "salary"])


@register(
    "cdc_changed_records",
    oracle=f"""
WITH base AS ({_BASE_SQL}), inc AS ({_INC_SQL})
SELECT base.id, base.name, base.acctbal, base.segment,
       inc.name AS inc_name, inc.acctbal AS inc_acctbal, inc.segment AS inc_segment
FROM base JOIN inc ON base.id = inc.id
WHERE base.name IS DISTINCT FROM inc.name
   OR base.acctbal IS DISTINCT FROM inc.acctbal
   OR base.segment IS DISTINCT FROM inc.segment
""",
)
def cdc_changed_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, inc = _base_inc(spark, sf_dir)
    return changed_records(base, inc, "id", ["name", "acctbal", "segment"])


@register(
    "cdc_new_records",
    oracle=f"""
WITH base AS ({_BASE_SQL}), inc AS ({_INC_SQL})
SELECT inc.* FROM inc
WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.id = inc.id)
""",
)
def cdc_new_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, inc = _base_inc(spark, sf_dir)
    return new_records(base, inc, "id")


@register(
    "cdc_upsert_customer",
    oracle=f"""
WITH base AS ({_BASE_SQL}), inc AS ({_INC_SQL}),
updated AS (
  SELECT base.id,
         coalesce(inc.name, base.name) AS name,
         coalesce(inc.acctbal, base.acctbal) AS acctbal,
         coalesce(inc.segment, base.segment) AS segment
  FROM base LEFT JOIN inc ON base.id = inc.id
)
SELECT * FROM updated
UNION ALL
SELECT inc.* FROM inc WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.id = inc.id)
""",
)
def cdc_upsert_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, inc = _base_inc(spark, sf_dir)
    return cdc_upsert(base, inc, "id", ["name", "acctbal", "segment"])


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (the lakehouse "don't recompute gold"
# pattern: merge partial aggregates from the increment into the base)
# ---------------------------------------------------------------------------

@register(
    "incremental_agg_merge",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
""",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for an aggregate table: the base
    partial aggregate (orders before 1999) is MERGED with the increment's
    partial aggregate (orders from 1999 on) instead of recomputing over
    the full history. Counts add, exact-decimal sums add, maxes max —
    every aggregate this engine exposes is chosen to have an associative
    merge (functions/portable.py), which is exactly what makes this
    pattern valid. The oracle is the full recompute: merged == direct.

    At 100 TB the base partials live as a gold table and only the
    increment is scanned per refresh — this query IS that refresh step,
    with both sides derived from the same source for oracle-checkability.
    The merge shuffles |groups| rows, not |input|."""
    cutoff = F.lit("1999-01-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("decimal(28,4)").alias("revenue_dec"),
            F.max("o_totalprice").alias("max_price"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    inc = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(inc)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("revenue_dec").cast("double").alias("revenue"),
            F.max("max_price").alias("max_price"),
        )
    )
