"""Projection / filter / scalar-function operators
(SURVEY.md §2.4 P1-P7, §2.8 U1, §2.9 F1-F10).

The reference's messy-string pipeline (custom/delta_table_write.py:59-69)
parses the Airbnb ``name`` composite — ``"Cozy loft · ★4.85 · 2 bedrooms ·
2 beds · 1 bath"`` with an *optional* rating token that shifts later tokens
left — using split/getItem/trim/startswith/regexp_replace/when. We exercise
the identical function surface over a composite synthesized from ``part``
(FIXTURES.md F3 mapping), so the parse is oracle-checkable.

Everything here is pure Catalyst expression work: no shuffle, no UDFs, whole
row batch stays in codegen. At 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table


def parse_listing_name(df: DataFrame, col: str = "name") -> DataFrame:
    """F1-F5 + P1-P2 (custom/delta_table_write.py:61-69): split a
    '·'-separated composite into typed columns, handling the optional
    ``★rating`` second token (tokens shift left when absent)."""
    # F.get (not getItem): ANSI mode turns out-of-bounds getItem into an
    # error; get returns NULL, matching the reference's ANSI-off behavior
    # on short composites (FIXTURES.md F3 edge cases)
    tok = F.split(F.col(col), "·")
    has_rating = F.trim(F.get(tok, 1)).startswith("★")
    return (
        df.withColumn("description", F.trim(F.get(tok, 0)))
        .withColumn(
            "reviews",
            F.when(
                has_rating, F.regexp_replace(F.trim(F.get(tok, 1)), "★", "")
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "bedrooms",
            F.when(has_rating, F.trim(F.get(tok, 2))).otherwise(F.trim(F.get(tok, 1))),
        )
        .withColumn(
            "beds",
            F.when(has_rating, F.trim(F.get(tok, 3))).otherwise(F.trim(F.get(tok, 2))),
        )
        .drop(col)
    )


@register(
    "listings_parse",
    oracle="""
WITH listings AS (
  SELECT p_partkey,
         p_name || ' ·' ||
         CASE WHEN p_size % 3 <> 0 THEN ' ★' || CAST(p_size AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR) || ' ·' ELSE '' END ||
         ' ' || CAST(p_size % 5 AS VARCHAR) || ' bedrooms · ' ||
         CAST(p_size % 4 AS VARCHAR) || ' beds' AS name
  FROM part
),
tok AS (
  SELECT p_partkey, string_split(name, '·') AS t FROM listings
)
SELECT p_partkey,
       trim(t[1]) AS description,
       CASE WHEN starts_with(trim(t[2]), '★')
            THEN replace(trim(t[2]), '★', '') ELSE NULL END AS reviews,
       CASE WHEN starts_with(trim(t[2]), '★') THEN trim(t[3]) ELSE trim(t[2]) END AS bedrooms,
       CASE WHEN starts_with(trim(t[2]), '★') THEN trim(t[4]) ELSE trim(t[3]) END AS beds
FROM tok
""",
)
def listings_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the Airbnb-style composite from ``part`` (one third of
    rows without the ★ token, exercising the positional shift), then parse
    it back with the reference's function chain."""
    part = load_table(spark, sf_dir, "part")
    rating = F.concat(
        F.lit(" ★"),
        F.col("p_size").cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 10).cast("string"),
        F.lit(" ·"),
    )
    listings = part.select(
        "p_partkey",
        F.concat(
            F.col("p_name"),
            F.lit(" ·"),
            F.when(F.col("p_size") % 3 != 0, rating).otherwise(F.lit("")),
            F.lit(" "),
            (F.col("p_size") % 5).cast("string"),
            F.lit(" bedrooms · "),
            (F.col("p_size") % 4).cast("string"),
            F.lit(" beds"),
        ).alias("name"),
    )
    return parse_listing_name(listings)


@register(
    "orders_filter_project",
    oracle="""
SELECT o_orderkey AS order_id,
       o_custkey AS customer_id,
       CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS total_price,
       upper(o_orderpriority) AS priority,
       CAST(year(o_orderdate) AS INTEGER) AS order_year
FROM orders
WHERE o_orderstatus <> 'F' AND o_totalprice > 100000.0
""",
)
def orders_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4/P5/P7 showcase: selectExpr-style rename + compound predicate +
    cast. Both the status and price predicates reach the parquet scan as
    PushedFilters. ``total_price`` quantizes through DECIMAL(18,4) but is
    emitted as DOUBLE on both engines: a DECIMAL output column reaches the
    driver's pandas canonicalizer as object-dtype ``decimal.Decimal`` from
    Spark but float64 from DuckDB and hash-mismatches despite equal values
    (round-5 red)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") != "F") & (F.col("o_totalprice") > 100000.0)
    ).selectExpr(
        "o_orderkey AS order_id",
        "o_custkey AS customer_id",
        "CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS total_price",
        "upper(o_orderpriority) AS priority",
        "CAST(year(o_orderdate) AS INT) AS order_year",
    )


@register(
    "events_json_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
WHERE try_cast(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: ``get_json_object`` over the ``props`` JSON
    column (motivated by SURVEY.md §2.9 note), aggregated per event type.
    At scale prefer ``from_json`` with an explicit schema once the shape is
    known — single parse, columnar output; shown here with the per-field
    extractor the reference's style implies."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.filter(F.get_json_object("props", "$.k").try_cast("int").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "sql_entry_top_nations",
    oracle="""
SELECT n_name AS nation, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def sql_entry_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``spark.sql`` TEXT entry point (SURVEY.md §3 EP2) — identical
    SQL runs through Spark's parser against registered views and through
    the DuckDB oracle, proving the SQL surface itself, not just the
    DataFrame API, matches."""
    from deg04_local_data_lake_spark.sources.catalog import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name AS nation, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@register(
    "events_props_from_json",
    oracle="""
SELECT event_type,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events GROUP BY event_type
""",
)
def events_props_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with an explicit schema — the scale path for JSON
    columns: ONE parse per row into a struct, vs one parse per
    ``get_json_object`` call (events_json_extract shows that per-field
    style). Catalyst also prunes unparsed struct fields."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json("props", StructType([StructField("k", IntegerType())])).alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.min("p.k").cast("int").alias("min_k"),
        F.max("p.k").cast("int").alias("max_k"),
    )


@register(
    "union_account_balances",
    oracle="""
WITH bal AS (
  SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS side FROM customer
  UNION ALL
  SELECT s_nationkey, s_acctbal, 'supplier' FROM supplier
)
SELECT n_name AS nation, side,
       COUNT(*) AS n_accounts,
       CAST(SUM(CAST(acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
FROM bal JOIN nation ON bal.nationkey = n_nationkey
GROUP BY n_name, side
""",
)
def union_account_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union (ours: unionByName — the reference's positional ``union``
    after ``drop`` is order-fragile, SURVEY.md §7 risk register) + a
    broadcast-joined dimension rollup. ``nation`` (25 rows) broadcasts;
    at 100 TB the fact side never shuffles for the join."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    bal = customer.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("side"),
    ).unionByName(
        supplier.select(
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
            F.lit("supplier").alias("side"),
        )
    )
    return (
        bal.join(F.broadcast(nation), bal.nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "side")
        .agg(
            F.count(F.lit(1)).alias("n_accounts"),
            F.sum(F.col("acctbal").cast("decimal(18,4)")).cast("double").alias("total_balance"),
        )
    )
