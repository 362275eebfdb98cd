"""Multi-join analytical queries over the star schema.

The reference never joins more than two frames (its joins are the CDC trio,
SURVEY.md §2.5); these queries exercise the join-heavy shapes a lakehouse
query layer must handle — the same shapes its StarRocks attachment
(docker-compose.yaml:17-77) exists to serve — expressed so Catalyst gets
the right physical plan:

- dimensions (region/nation/customer-filtered) are broadcast — the fact
  table never shuffles for them;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once, and the
  downstream aggregate reuses that partitioning where possible;
- top-k uses sort-limit (``TakeOrderedAndProject``), never a global sort.

All money arithmetic uses the exact-decimal builders (oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.operators import rankdist
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

# product re-quantized to (18,4) so the SUM stays double-exact in both
# engines; round() before the cast because DuckDB's decimal cast truncates
# while Spark's rounds HALF_UP (see operators/aggregates.py q1 note)
_REVENUE = (
    "CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST(l_discount AS DECIMAL(8,4))), 4) AS DECIMAL(18,4))"
)


def _revenue() -> F.Column:
    return (
        dec("l_extendedprice") * (1 - dec("l_discount", "decimal(8,4)"))
    ).cast("decimal(18,4)")


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM({_REVENUE}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, order_date
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: segment-filtered customers (broadcast) ⋈ orders ⋈
    lineitem, revenue per order, top-10.

    The segment filter makes the customer side small enough to broadcast;
    the date filters push into both fact scans; the final top-10 is
    sort-limit (no global sort). Tiebreak on orderkey keeps LIMIT
    deterministic.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    oracle=f"""
SELECT n_name AS nation,
       CAST(SUM({_REVENUE}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN lineitem ON l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l_orderkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: the full dimension chain region→nation→supplier
    broadcast onto lineitem, then one fact-fact shuffle join with
    date-filtered orders. Per-nation revenue."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    dims = (
        supplier.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .select("s_suppkey", "n_name")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), lineitem.l_suppkey == dims.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24.0
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped: pure filter + global aggregate — every predicate
    (date range, discount band, quantity) reaches the parquet scan as a
    pushed filter; at scale this is a stats-only skip for most row groups.
    Product summed exactly in the decimal domain (sum < 2^53 units)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount", "decimal(8,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(8,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(8,4))) AS DOUBLE) > 150.0
)
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice, total_qty
FROM orders JOIN big ON o_orderkey = big.l_orderkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: HAVING on an aggregated fact (orders whose total
    quantity exceeds a threshold) joined back to the order header. The
    aggregate's output is small (filtered groups), so Spark demotes the
    join to broadcast under AQE — check the final plan, not the initial."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", "decimal(8,4)")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        "o_totalprice",
        "total_qty",
    )


@register(
    "q4_late_shipment_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
""",
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: orders with at least one lineitem shipped after the
    order date, counted per priority — the EXISTS-correlated-subquery shape
    expressed as a LEFT SEMI join. The semi join stops probing an order on
    first match and emits each order at most once, so no post-join
    distinct is needed; at scale both sides shuffle once on orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE} END) AS DOUBLE)
            / CAST(SUM({_REVENUE}) AS DOUBLE) AS DOUBLE) AS promo_share_pct,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-12-01 00:00:00'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped: share of revenue from promo parts in a date
    window — conditional aggregation (SUM over a CASE) atop a broadcast
    part join. Both sums are exact decimals; only the final division runs
    in double, which is a single deterministic IEEE op in both engines."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-12-01 00:00:00").cast("timestamp"))
    )
    promo_rev = F.when(F.col("p_type") == "PROMO", _revenue())
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                100.0
                * F.sum(promo_rev).cast("double")
                / F.sum(_revenue()).cast("double")
            )
            .cast("double")
            .alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q19_banded_discounts",
    oracle=f"""
SELECT CAST(SUM({_REVENUE}) AS DOUBLE) AS revenue, COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_banded_discounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped: disjunction of per-brand (size, quantity) bands —
    the OR-of-ANDs predicate that defeats naive pushdown. The equi-join
    stays a broadcast hash join on partkey; Catalyst additionally extracts
    the common quantity envelope (1..40) as a scan-level filter, so the
    disjunction only runs on rows that survive the band union."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")

    def band(brand: str, size_hi: int, q_lo: float, q_hi: float) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        band("Brand#13", 15, 1.0, 21.0)
        | band("Brand#22", 25, 10.0, 30.0)
        | band("Brand#25", 35, 20.0, 40.0)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q7_nation_trade_volume",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM({_REVENUE}) AS DOUBLE) AS volume,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
""",
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped: cross-border trade volume per (supplier nation,
    customer nation, year). One fact-fact shuffle (lineitem⋈orders on
    orderkey); the supplier→nation and customer→nation lookups are plain
    equi-joins with no forced hint — Catalyst broadcasts them from size
    stats here, and at 100 TB (where customer is no longer small) the same
    plan degrades gracefully to a shuffle join rather than OOMing on a
    forced broadcast. year() is cast to INTEGER for oracle parity
    (DuckDB's year() returns BIGINT)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_nation = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .join(cust_nation, orders.o_custkey == cust_nation.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.sum(_revenue()).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q10_returned_revenue",
    oracle=f"""
SELECT c_custkey, c_name, n_name AS nation,
       CAST(SUM({_REVENUE}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: customers who returned the most revenue in a
    quarter. Both scan filters (order-date window, returnflag) push to
    parquet; the top-20 is sort-limit (TakeOrderedAndProject), never a
    global sort; custkey tiebreak keeps LIMIT deterministic."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_REVENUE}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped: supplier(s) with the maximum quarterly revenue —
    the scalar-subquery-against-an-aggregate shape, decorrelated into a
    1-row max broadcast-joined back onto the per-supplier aggregate (ties
    all surface, as in the spec). Exact-decimal sums make the double
    equality bit-reproducible in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_revenue()).cast("double").alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.max_revenue)
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust
GROUP BY n_orders
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: how many customers placed 0, 1, 2, … orders — a
    LEFT OUTER join (zero-order customers survive as NULL matches that
    COUNT(col) skips) under two stacked aggregates. The first agg reuses
    the join's custkey partitioning (no extra shuffle); the second shuffles
    only the tiny (n_orders, count) distribution."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q22_idle_balances",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS v
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
FROM customer, avg_bal
WHERE c_acctbal > avg_bal.v
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY c_nationkey
""",
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: customers holding an above-average balance with no
    recent (1999+) orders, totalled per nation — a scalar aggregate
    broadcast as a 1-row cross join plus a NOT EXISTS expressed as LEFT
    ANTI (the date filter pushes into the orders scan before the probe).
    The average is spelled SUM(decimal)/COUNT in both engines (AVG(double)
    would not reproduce bitwise); the anti join probes orders once on
    custkey."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("v")
        )
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_balance"),
        )
    )


@register(
    "fuzzy_match_names",
    oracle="""
SELECT c.c_name AS customer_name, s.s_name AS supplier_name,
       levenshtein(substr(c.c_name, 10), substr(s.s_name, 10)) AS edit_distance
FROM customer c JOIN supplier s
  ON substr(c.c_name, 10, 7) = substr(s.s_name, 10, 7)
 AND levenshtein(substr(c.c_name, 10), substr(s.s_name, 10)) <= 1
""",
)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity resolution with blocking: candidate pairs share
    the first 7 digits of the 9-digit entity id (the equi-join key — this
    is what keeps it off the quadratic cliff), verified by exact
    Levenshtein ≤ 1 on the full id. The entity-resolution sibling of the
    dedup family: block → verify, shuffle ∝ block collisions."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c_id, s_id = F.expr("substr(c_name, 10)"), F.expr("substr(s_name, 10)")
    lev = F.levenshtein(c_id, s_id)
    return (
        customer.join(
            supplier,
            (F.substring("c_name", 10, 7) == F.substring("s_name", 10, 7)) & (lev <= 1),
        )
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("s_name").alias("supplier_name"),
            lev.alias("edit_distance"),
        )
    )


@register(
    "cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
       COUNT(*) AS active_users
FROM activity
WHERE day_offset <= 7
GROUP BY 1, 2
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted on
    each subsequent day they return (first week). Two aggregations over the
    user partitioning + one broadcastable first-seen join — the canonical
    product-analytics query."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        events.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", F.col("day_offset").cast("bigint").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "funnel_stages",
    oracle="""
WITH stage_ts AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'signup') AS t_signup,
         min(ts) FILTER (WHERE event_type = 'view') AS t_view,
         min(ts) FILTER (WHERE event_type = 'click') AS t_click,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM events GROUP BY user_id
)
SELECT user_id,
       CASE
         WHEN t_signup IS NOT NULL AND t_view > t_signup
              AND t_click > t_view AND t_purchase > t_click THEN 4
         WHEN t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view THEN 3
         WHEN t_signup IS NOT NULL AND t_view > t_signup THEN 2
         WHEN t_signup IS NOT NULL THEN 1
         ELSE 0
       END AS funnel_stage
FROM stage_ts
""",
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: deepest signup→view→click→purchase stage each user
    reached in strict time order — one conditional-aggregate pass (the
    FILTER clauses are Spark's when-inside-min), no self-joins. NULL
    comparisons fall through the CASE naturally in both engines."""
    events = load_table(spark, sf_dir, "events")

    def first_ts(ev):
        return F.min(F.when(F.col("event_type") == ev, F.col("ts")))

    stage_ts = events.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    ok1 = F.col("t_signup").isNotNull()
    ok2 = ok1 & (F.col("t_view") > F.col("t_signup"))
    ok3 = ok2 & (F.col("t_click") > F.col("t_view"))
    ok4 = ok3 & (F.col("t_purchase") > F.col("t_click"))
    return stage_ts.select(
        "user_id",
        F.when(ok4, 4).when(ok3, 3).when(ok2, 2).when(ok1, 1).otherwise(0).alias(
            "funnel_stage"
        ),
    )


@register(
    "events_value_histogram",
    oracle="""
SELECT event_type,
       CAST(floor(value / 25.0) * 25 AS BIGINT) AS bin_lo,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type — one hash aggregate over
    (type, bin). NB the bin expression avoids a bare double→int cast,
    which ROUNDS in DuckDB but truncates in Spark; floor semantics are
    spelled out so both engines bin identically."""
    events = load_table(spark, sf_dir, "events")
    bin_lo = (F.floor(F.col("value") / 25.0) * 25).cast("bigint")
    return events.groupBy("event_type", bin_lo.alias("bin_lo")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "orders_above_customer_avg",
    oracle="""
WITH stats AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg,
         COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM stats
WHERE cust_orders >= 3 AND o_totalprice > 1.5 * cust_avg
""",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape ("orders 50% above this customer's
    average") decorrelated into a single window pass — one shuffle on
    custkey instead of a per-row subquery."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    stats = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("cust_avg"),
        F.count(F.lit(1)).over(w).alias("cust_orders"),
    )
    return stats.filter(
        (F.col("cust_orders") >= 3) & (F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
    ).drop("cust_orders")


@register(
    "ngram_topk_global",
    oracle="""
WITH w AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents
)
SELECT * FROM (
  SELECT lang, word, COUNT(*) AS n,
         row_number() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, word) AS rank
  FROM w GROUP BY lang, word
) WHERE rank <= 10
""",
)
def ngram_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head per language: wordcount (partial-agg shuffle on the
    word — the canonical map-side-combine shape) + per-language top-10."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "word")
    return counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)


@register(
    "corpus_curation",
    oracle="""
WITH quality AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
         len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_uniq
  FROM documents
),
scored AS (
  SELECT doc_id, lang, n_words,
         0.5 * least(1.0, n_words / 50.0) + 0.5 * (n_uniq / n_words) AS score,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM quality
),
deduped AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS dup_rn
  FROM scored
)
SELECT doc_id, lang, n_words, score
FROM deduped
WHERE dup_rn = 1 AND score >= 0.7 AND n_words >= 20
""",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline — the LLM-data use case end-to-end:
    quality-score → fingerprint-dedup (keep lowest doc_id) → threshold
    filter. One scan, one narrow shuffle on the fingerprint."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_words"),
        (
            0.5 * F.least(F.lit(1.0), F.size(words) / 50.0)
            + 0.5 * (F.size(F.array_distinct(words)) / F.size(words))
        ).alias("score"),
        F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("dup_rn", F.row_number().over(w))
        .filter((F.col("dup_rn") == 1) & (F.col("score") >= 0.7) & (F.col("n_words") >= 20))
        .select("doc_id", "lang", "n_words", "score")
    )


#: Per-basket line cap for EVERY co-purchase pair build (pagerank,
#: triangles, degree histogram, itemset pairs, affinity lift). A basket
#: with n lines contributes O(n²) pairs INTO ONE JOIN GROUP — bounded
#: baskets are what keep these plans linear, and real baskets are
#: bounded (TPC-H ≤ 7, our testdata ≤ 17 even under the adversarial
#: skew derivation), but one pathological 10k-line wholesale order
#: would put 10⁸ pairs in a single task. Baskets above the cap are
#: EXCLUDED from pair building — the MinHash MEGA_BUCKET_CAP rationale
#: (a mega-basket's co-occurrences are noise for affinity/graph
#: signals, like stopwords for tokens) — and, unlike the LSH cap, this
#: guard is plain SQL, so every oracle applies the IDENTICAL rule and
#: parity holds with no documented divergence.
CO_PURCHASE_ORDER_CAP = 64

#: The oracle-side twin of ``_cap_baskets`` — splice ``{LI}`` with the
#: site's lineitem projection.
_BOUNDED_LI_SQL = (
    "SELECT l_orderkey, l_partkey FROM ("
    "SELECT l_orderkey, l_partkey,"
    " COUNT(*) OVER (PARTITION BY l_orderkey) AS __basket_n FROM ({LI})"
    ") WHERE __basket_n <= 64"
)


def _cap_baskets(li: DataFrame) -> DataFrame:
    """Drop baskets with more than ``CO_PURCHASE_ORDER_CAP`` rows before
    a per-basket pair build. One window count keyed on the SAME column
    the pair join shuffles on, so the exchange is shared (ReusedExchange
    / AQE) — the guard costs no extra data-scale shuffle."""
    from pyspark.sql import Window

    n = F.count(F.lit(1)).over(Window.partitionBy("l_orderkey"))
    return (
        li.withColumn("__basket_n", n)
        .filter(F.col("__basket_n") <= CO_PURCHASE_ORDER_CAP)
        .drop("__basket_n")
    )


@register(
    "pagerank_step",
    oracle=f"""
WITH li AS ({_BOUNDED_LI_SQL.format(LI="SELECT l_orderkey, l_partkey FROM lineitem")}),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
outdeg AS (
  SELECT src, CAST(round(1e12 / count(*)) AS BIGINT) AS w
  FROM edges GROUP BY src
),
n AS (SELECT count(*) AS n_nodes FROM (SELECT DISTINCT src FROM edges)),
contrib AS (
  SELECT dst, CAST(SUM(w) AS BIGINT) AS in_contrib
  FROM edges JOIN outdeg USING (src) GROUP BY dst
)
SELECT dst AS partkey, in_contrib,
       0.15::DOUBLE / n_nodes
         + (0.85::DOUBLE * (CAST(in_contrib AS DOUBLE) / 1e12)) / n_nodes
         AS pr_rank
FROM contrib, n
""",
)
def pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank iteration (d=0.85, uniform init 1/N) over the part
    co-purchase graph: parts are nodes, an edge links two parts that share
    an order. The iterative-algorithm companion to
    ``embedding_kmeans_step`` — at 100 TB you persist the (src-partitioned)
    edge list once and loop this step, so its plan is what matters:

    - the edge build self-joins lineitem on ``l_orderkey`` — both sides
      share the shuffle key, one co-partitioned exchange, never a
      cartesian;
    - per-edge contributions are quantized to exact integers
      (``round(1e12/outdeg)``) so the big SUM-over-in-edges is a plain
      map-side-combinable BIGINT aggregate — bitwise deterministic under
      any partitioning, where a double sum's value would depend on
      addition order (same trick as functions/portable.py's decimal sums);
    - the final rank is ONE double expression over those exact integers
      (identical association both engines), not a floating aggregate;
    - N (node count) rides a broadcast one-row frame, no driver collect.

    Cache lifecycle: the edge persist is registered with
    ``caching.persist_tracked``; harnesses release it via
    ``caching.release_caches()``.
    """
    from deg04_local_data_lake_spark.caching import persist_tracked

    li = _cap_baskets(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        )
    # two consumers (out-degree build, contribution join) — persist so
    # the self-join+distinct runs once; the cache also serves
    # graph_degree_histogram's identical edge subtree in-session.
    # Tracked: released by caching.release_caches().
    edges = persist_tracked(edges)
    weights = edges.groupBy("src").agg(
        F.round(F.lit(1e12) / F.count(F.lit(1))).cast("long").alias("w")
    )
    contrib = (
        edges.join(weights, "src")
        .groupBy("dst")
        .agg(F.sum("w").alias("in_contrib"))
    )
    n = edges.select("src").distinct().agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    return contrib.crossJoin(F.broadcast(n)).select(
        F.col("dst").alias("partkey"),
        "in_contrib",
        (
            F.lit(0.15) / F.col("n_nodes")
            + (
                F.lit(0.85)
                * (F.col("in_contrib").cast("double") / F.lit(1e12))
            )
            / F.col("n_nodes")
        ).alias("pr_rank"),
    )


#: (applicationId, sf_dir) → (edges, deg, oriented) for the part
#: co-purchase graph. ``triangle_count`` and ``local_clustering_topk``
#: consume the SAME persisted frames in-session — without the memo each
#: rebuilt its own copies under different column aliases, which defeats
#: Spark's canonical-plan cache lookup and re-runs the expensive
#: self-join + orientation (measured ~8 s + ~6.6 s rebuilt separately
#: at sf0.1 in the r3 wide bench).
_TRI_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame, DataFrame]] = {}


def _drop_tri_cache() -> None:
    _TRI_CACHE.clear()


def _co_purchase_oriented(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build (edges, deg, corners) for the part co-purchase graph, once
    per (session, sf_dir), all persist_tracked:

    - ``edges``: canonical u<v co-purchase pairs (orderkey self-join,
      co-partitioned, distinct);
    - ``deg`` (node, degree): undirected degrees;
    - ``corners`` (a, b, c): one row per triangle in (degree, id)
      orientation order, from the degree-ordered wedge join — every
      node's out-degree is O(√m), so the enumeration is Σ outdeg(v)²
      (the standard super-node mitigation)."""
    from deg04_local_data_lake_spark.caching import (
        on_release_fixtures,
        persist_fixture,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _TRI_CACHE:
        return _TRI_CACHE[key]
    if not _TRI_CACHE:
        # SESSION FIXTURE tier: the co-purchase graph is shared by
        # triangle_count and local_clustering_topk — releasing it
        # between queries (the query-scoped tier) made each rebuild the
        # ~8 s orderkey self-join in the wide bench
        on_release_fixtures(_drop_tri_cache)
    li = _cap_baskets(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    edges = persist_fixture(
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    u_first = (F.col("du.degree") < F.col("dv.degree")) | (
        (F.col("du.degree") == F.col("dv.degree")) & (F.col("u") < F.col("v"))
    )
    oriented = persist_fixture(
        edges.join(du, F.col("u") == F.col("du.node"))
        .join(dv, F.col("v") == F.col("dv.node"))
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    # closing-edge check on a SINGLE packed key (src<<32 | dst): one hash
    # column instead of a two-column join — measured 5.6× faster on the
    # wedge-join stage at sf0.1, same result. Packing is valid while node
    # ids < 2^31 (partkeys well inside; past ~2 B ids revert to the
    # two-column conjunction).
    packed = oriented.select(
        (F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("code")
    )
    corners = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e2.src") == F.col("e1.dst"))
        .join(
            packed,
            F.col("code") == F.shiftleft(F.col("e1.src"), 32) + F.col("e2.dst"),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    # corners IS persisted now (fixture tier): with two registered
    # consumers (triangle_count, local_clustering_topk) surviving the
    # per-query cache release, one materialization of the wedge join —
    # the dominant cost — replaces two full recomputes. One row per
    # triangle, three bigints: bounded by the triangle count, far under
    # the edge list it derives from.
    corners = persist_fixture(corners)
    _TRI_CACHE[key] = (edges, deg, corners)
    return edges, deg, corners


@register(
    "triangle_count",
    oracle=f"""
WITH li AS ({_BOUNDED_LI_SQL.format(LI="SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")}),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges)
  GROUP BY node
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
  FROM deg
),
ne AS (SELECT COUNT(*) AS n_edges FROM edges)
SELECT n_nodes, n_edges, n_triangles, n_wedges,
       CASE WHEN n_wedges = 0 THEN 0.0
            ELSE 3.0 * n_triangles / n_wedges END AS global_clustering
FROM stats, ne, tri
""",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient over the part
    co-purchase graph (same graph as ``pagerank_step``; edges canonical
    u<v, so each triangle matches exactly one (e1,e2,e3) orientation).

    The multi-way-self-join graph workload: build canonical edges once
    (orderkey-keyed self-join, co-partitioned), then a **degree-ordered**
    wedge join — edges are re-oriented from the (degree, id)-smaller
    endpoint to the larger, so every node's out-degree is O(√m) and the
    wedge enumeration is Σ outdeg(v)² instead of Σ deg(v)² (the standard
    super-node mitigation; each triangle {x<y<z} in (degree, id) order is
    counted exactly once as x→y, y→z, x→z). Wedge count derives from
    exact integer degree sums; the clustering coefficient is one double
    division at the end. The three 1-row aggregates meet in broadcast
    nested loops (allowlisted: 1-row frames, constant cost).

    Cache lifecycle: the edge/oriented persists are registered with
    ``caching.persist_tracked`` (built once per session via
    ``_co_purchase_oriented``, shared with ``local_clustering_topk``);
    harnesses release them via ``caching.release_caches()``."""
    edges, deg, corners = _co_purchase_oriented(spark, sf_dir)
    tri = corners.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("(degree * (degree - 1)) DIV 2")).alias("n_wedges"),
    )
    ne = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(3.0 * F.col("n_triangles") / F.col("n_wedges"))
            .alias("global_clustering"),
        )
    )


@register(
    "pareto_revenue_share",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS rn,
         SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         SUM(cents) OVER () AS total
  FROM per_cust
)
SELECT n AS n_customers,
       rn AS top_customers,
       CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS revenue_share
FROM ranked
WHERE rn = greatest(1, CAST(ceil(0.20 * n) AS BIGINT))
""",
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: what fraction of total revenue the top 20% of
    customers hold — the 80/20 health check every revenue team runs.

    Customer revenue reduces in a distributed exact-integer-cents
    aggregate; ranking and the cumulative sum then run over one row per
    customer via the distributed bucketed rank pass (``rankdist`` with a
    weight column, bucketed on descending cents) — exact rank + running
    sum with no single-partition tail. The share is one IEEE division of
    two exact integers."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    ranked = rankdist.with_global_ranks(
        per_cust,
        [F.col("cents").desc(), "o_custkey"],
        bucket_by=-F.col("cents"),
        weight="cents",
    ).withColumnsRenamed(
        {
            rankdist.RANK: "rn",
            rankdist.CUMW: "cum",
            rankdist.N: "n",
            rankdist.TOTW: "total",
        }
    )
    pick = F.greatest(
        F.lit(1).cast("bigint"), F.ceil(F.lit(0.20) * F.col("n")).cast("bigint")
    )
    return ranked.filter(F.col("rn") == pick).select(
        F.col("n").alias("n_customers"),
        F.col("rn").alias("top_customers"),
        (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
            "revenue_share"
        ),
    )


@register(
    "graph_degree_histogram",
    oracle=f"""
WITH li AS ({_BOUNDED_LI_SQL.format(LI="SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")}),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY src)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1
""",
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph — the first
    diagnostic before any graph algorithm (is the degree sequence
    power-law? is there a hub that will skew joins?).

    Consumes the session-shared persisted edge/degree subtree of the
    triangle family (``_co_purchase_oriented`` — a node's undirected
    degree IS its distinct-partner count, which is what the directed
    both-ways formulation counts per src), so running any two of the
    graph queries in one session builds the co-purchase edges once. The
    histogram itself reduces |nodes| rows to |distinct degrees| — each
    stage's input is at least an order of magnitude smaller than the
    last. In production the degree table is the broadcast side of the
    skew-salting decision for every other graph query."""
    _edges, deg, _corners = _co_purchase_oriented(spark, sf_dir)
    return deg.select(F.col("degree").cast("bigint").alias("degree")).groupBy(
        "degree"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))


@register(
    "frequent_itemset_pairs",
    oracle=f"""
WITH li AS ({_BOUNDED_LI_SQL.format(LI="SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")}),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, support
FROM (SELECT *, row_number() OVER (ORDER BY support DESC, part_a, part_b) AS rn
      FROM pairs WHERE support >= 2)
WHERE rn <= 20
""",
)
def frequent_itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the 20 most frequently co-purchased part
    pairs (support = orders containing both) — the 2-itemset core of
    association-rule mining.

    The pair build is the canonical-orientation self-join on the basket
    key (both sides share the ``l_orderkey`` shuffle — co-partitioned,
    never cartesian; ``<`` halves the pair space). Support counting is a
    plain hash aggregate on the pair. The support ≥ 2 floor is where
    a-priori pruning plugs in at scale (drop parts below min-support
    BEFORE pairing — the same guard as the MinHash mega-bucket cap); the
    20-row final rank is ``orderBy().limit()``, which compiles to
    TakeOrderedAndProject — a per-partition heap + driver merge of 20-row
    sets, never a global sort (the pair space is NOT a reduced frame at
    100 TB, so a row_number window here would be a scale bug)."""
    li = _cap_baskets(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    return pairs.orderBy(F.col("support").desc(), "part_a", "part_b").limit(20)


@register(
    "basket_affinity_lift",
    oracle=f"""
WITH li AS ({_BOUNDED_LI_SQL.format(LI="SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")}),
n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
item AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_n FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT part_a, part_b, support,
       ia.item_n AS n_a, ib.item_n AS n_b,
       (CAST(support AS DOUBLE) * n.n)
         / (CAST(ia.item_n AS DOUBLE) * ib.item_n) AS lift
FROM pairs
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
CROSS JOIN n_orders n
ORDER BY lift DESC, part_a, part_b
LIMIT 20
""",
)
def basket_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift for co-purchased part pairs: how much more
    often two parts appear together than independence predicts —
    ``lift = P(a∧b) / (P(a)·P(b)) = support·N / (nₐ·n_b)`` — the metric
    that separates genuinely-affine pairs from merely-popular ones
    (plain support, ``frequent_itemset_pairs``, ranks popular items
    first).

    All probabilities stay as exact integer counts until ONE final double
    expression, so ranking is reproducible. The pair build is the same
    co-partitioned basket self-join; item counts broadcast onto the pair
    table; the ≥3 support floor is the a-priori prune. Top-20 by lift is
    sort-limit."""
    from pyspark.sql import Window

    li = _cap_baskets(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n")
    )
    item = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("item_n")
    )
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("item_n").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("item_n").alias("n_b"))
    lift = (F.col("support").cast("double") * F.col("n")) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select("part_a", "part_b", "support", "n_a", "n_b", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "supplier_hhi_by_nation",
    oracle="""
WITH vol AS (
  SELECT s_nationkey, l_suppkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY 1, 2
),
nation_tot AS (
  SELECT s_nationkey,
         SUM(cents) AS total,
         SUM(CAST(cents AS HUGEINT) * cents) AS sq_sum,
         CAST(count(*) AS BIGINT) AS n_suppliers
  FROM vol GROUP BY 1
)
SELECT n_name AS nation, n_suppliers,
       CAST(sq_sum AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
         AS hhi
FROM nation_tot JOIN nation ON n_nationkey = s_nationkey
""",
)
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation:
    HHI = Σ shareᵢ² = (Σ centsᵢ²) / (Σ centsᵢ)² — the antitrust/market
    structure measure (1/n for perfect competition, →1 for monopoly).

    The algebraic rewrite is the determinism move: summing per-supplier
    share-squares in floats would be order-dependent, while Σc² and (Σc)²
    are exact integer aggregates with ONE double division at the end. Two
    stacked aggregates on the same nation partitioning + a broadcast
    nation-name join."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    vol = (
        li.join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(cents).alias("cents"))
    )
    d38 = "decimal(38,0)"
    c38 = F.col("cents").cast(d38)
    # square in decimal space — supplier-volume cents² exceeds int64
    tot = vol.groupBy("s_nationkey").agg(
        F.sum(c38).alias("total"),
        F.sum(c38 * c38).alias("sq_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    return tot.join(
        F.broadcast(nation), tot.s_nationkey == nation.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        "n_suppliers",
        (
            F.col("sq_sum").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double"))
        ).alias("hhi"),
    )


@register(
    "local_clustering_topk",
    oracle=f"""
WITH li AS ({_BOUNDED_LI_SQL.format(LI="SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")}),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
),
und AS (
  SELECT u AS s, v AS d FROM edges UNION ALL SELECT v, u FROM edges
),
deg AS (SELECT s AS node, COUNT(*) AS degree FROM und GROUP BY 1),
tri AS (
  -- each triangle at node v appears ONCE as an ordered neighbor pair
  SELECT n.s AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM und n
  JOIN und m ON m.s = n.s AND n.d < m.d
  JOIN edges e ON e.u = n.d AND e.v = m.d
  GROUP BY n.s
)
SELECT d.node, d.degree,
       coalesce(t.n_triangles * 2, 0) AS n_triangles_x2,
       CAST(coalesce(t.n_triangles * 2, 0) AS DOUBLE)
         / (d.degree * (d.degree - 1)) AS local_cc
FROM deg d LEFT JOIN tri t ON t.node = d.node
WHERE d.degree > 1
ORDER BY local_cc DESC, d.node
LIMIT 20
""",
)
def local_clustering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient, top-20 — the node-level
    refinement of ``triangle_count``'s global coefficient (which node's
    neighborhood is closest to a clique). Triangles are enumerated ONCE
    via the same degree-ordered orientation (each triangle as exactly one
    (src→mid, mid→dst, src→dst) wedge closure), then credited to all
    three corners by exploding the corner array in the same pass — at 100 TB
    this is the same bounded wedge join as the global count plus one
    low-cardinality aggregate, never a per-node neighborhood expansion.
    local_cc = 2·triangles(v) / (deg(v)·(deg(v)−1)); the numerator is
    kept as the exact integer ``n_triangles_x2`` and the division is one
    double op — bitwise cross-engine. Oracle recomputes per-node
    triangles from the naive neighbor-pair join; the hash match proves
    the oriented enumeration credits corners exactly. Ties rank by node
    id; TakeOrderedAndProject, no global sort. The edge/degree/corner
    frames are the session-shared persisted subtree of ``triangle_count``
    (``_co_purchase_oriented``) — running both costs ONE wedge join."""
    edges, deg, tri_corners = _co_purchase_oriented(spark, sf_dir)
    # ONE consumption of the wedge join: explode the corner array in the
    # same pass (a 3-way union of projections would re-evaluate the join
    # per branch — measured 18.6 s → 9.6 s at sf0.1)
    per_node = (
        tri_corners.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg((F.count(F.lit(1)) * 2).alias("n_triangles_x2"))
    )
    return (
        deg.filter(F.col("degree") > 1)
        .join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles_x2", F.lit(0)).cast("bigint").alias("n_triangles_x2"),
            (
                F.coalesce("n_triangles_x2", F.lit(0)).cast("double")
                / (F.col("degree") * (F.col("degree") - 1))
            ).alias("local_cc"),
        )
        .orderBy(F.col("local_cc").desc(), "node")
        .limit(20)
    )


def _pagerank_iter_oracle(iters: int) -> str:
    """Build the chained-CTE DuckDB twin of ``pagerank_iterated``: one CTE
    per power iteration, each the exact integer-quantized update rule the
    Spark loop applies (see pagerank_iterated's docstring for why the
    quantization makes the comparison bitwise instead of float-fuzzy)."""
    ctes = [
        "li AS ("
        + _BOUNDED_LI_SQL.format(LI="SELECT l_orderkey, l_partkey FROM lineitem")
        + ")",
        """edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)""",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "n AS (SELECT count(*) AS n_nodes FROM outdeg)",
        """r0 AS (
  SELECT src AS node, CAST(round(1e12 / n_nodes) AS BIGINT) AS rq
  FROM outdeg CROSS JOIN n
)""",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""r{k} AS (
  SELECT e.dst AS node,
         CAST(round(1.5e11 / n.n_nodes) AS BIGINT)
           + CAST(round(0.85 * SUM(r.rq // o.outdeg)) AS BIGINT) AS rq
  FROM edges e
  JOIN outdeg o ON o.src = e.src
  JOIN r{k - 1} r ON r.node = e.src
  CROSS JOIN n
  GROUP BY e.dst, n.n_nodes
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node AS partkey, rq AS rank_q,
       CAST(rq AS DOUBLE) / 1e12 AS pr_rank
FROM r{iters}
"""
    )


_PAGERANK_ITERS = 5


@register("pagerank_iterated", oracle=_pagerank_iter_oracle(_PAGERANK_ITERS))
def pagerank_iterated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five full PageRank power iterations (d=0.85, uniform init) over the
    part co-purchase graph — the multi-step companion to ``pagerank_step``,
    locking that the iterative UPDATE RULE composes, not just one
    application of it.

    Iteration in a distributed engine is k unrolled plan segments, and the
    things that matter at 100 TB are all in how each segment is shaped:

    - the edge list (src, dst, outdeg) is built ONCE and persisted; every
      iteration re-joins the freshly shuffled rank frame against the SAME
      cached, src-keyed edges — the classic persist-the-graph /
      re-shuffle-the-ranks split (on a cluster: edges bucketed by src so
      only ranks move);
    - each iteration is exactly one shuffle pair (join on src, groupBy
      dst) with a map-side-combinable BIGINT SUM — no plan blowup, no
      driver-side state; k iterations = k × O(edges/partition);
    - ranks stay QUANTIZED (rq = pr·1e12 as BIGINT) through every
      iteration: the per-edge contribution is ``rq div outdeg`` (exact
      integer division), the fold is an integer SUM (associative and
      commutative — bitwise deterministic under any partitioning), and
      the only float ops are one round() per node per iteration on exact
      integer inputs, identical in both engines. A double-typed rank
      would make iteration 5's low bits depend on Spark's partition
      count; the quantized walk is hash-exact vs DuckDB's chained-CTE
      twin at every scale.

    The graph is symmetric (co-purchase), so there are no dangling nodes
    and the node set is stable across iterations — each r_k has exactly
    |V| rows, which the parity check implicitly attests five times."""
    from deg04_local_data_lake_spark.caching import persist_tracked

    li = _cap_baskets(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    # same canonical subtree as pagerank_step/graph_degree_histogram —
    # Spark's plan-cache serves all three from one persisted copy
    edges = persist_tracked(edges)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg): the loop-invariant frame. Persisted because all
    # five iterations join against it; on a cluster this is the frame you
    # bucket by src.
    edges_w = persist_tracked(edges.join(outdeg, "src"))
    n = edges.select("src").distinct().agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = (
        outdeg.select("src")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("src").alias("node"),
            F.round(F.lit(1e12) / F.col("n_nodes")).cast("long").alias("rq"),
        )
    )
    for _ in range(_PAGERANK_ITERS):
        contrib = (
            edges_w.join(
                ranks.select(F.col("node").alias("src"), "rq"), "src"
            )
            .select("dst", F.expr("rq div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.crossJoin(F.broadcast(n)).select(
            F.col("dst").alias("node"),
            (
                F.round(F.lit(1.5e11) / F.col("n_nodes")).cast("long")
                + F.round(F.lit(0.85) * F.col("s")).cast("long")
            ).alias("rq"),
        )
    return ranks.select(
        F.col("node").alias("partkey"),
        F.col("rq").alias("rank_q"),
        (F.col("rq").cast("double") / F.lit(1e12)).alias("pr_rank"),
    )
