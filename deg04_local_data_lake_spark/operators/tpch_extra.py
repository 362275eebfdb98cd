"""Remaining TPC-H-shaped query coverage (Q2/Q8/Q9/Q11/Q12/Q16/Q17/Q20/Q21).

The reference delegates all querying to Spark and its StarRocks attachment
(docker-compose.yaml:17-77); these queries complete the relational shape
inventory a lakehouse query layer must serve. The testdata star schema has
no ``partsupp`` table, so the partsupp-touching originals are re-anchored on
``lineitem`` (the same join topology and subquery shapes, different base
table).

Every query demonstrates the Spark-first decorrelation of a classic
subquery pattern:

- Q2  — correlated scalar MIN   → min-per-group aggregate joined back
- Q8  — share-of-total per group → conditional aggregation (one pass)
- Q9  — computed profit rollup   → broadcast dims, exact decimal math
- Q11 — HAVING vs global scalar  → broadcast scalar cross-join
- Q12 — multi-CASE counts        → one pass, no self-join
- Q16 — NOT IN subquery          → broadcast left-anti + countDistinct
- Q17 — correlated AVG threshold → avg-per-group aggregate joined back
- Q20 — nested IN chains         → cascaded left-semi joins
- Q21 — EXISTS + NOT EXISTS      → per-order profile aggregate (one scan
        of lineitem instead of the three self-joins a literal translation
        would make)

Determinism: every SUM/AVG routes through exact decimal
(functions/portable.py); double division/multiplication only ever happens
once per output value, on identical inputs, so both engines produce
bit-identical doubles. MIN/MAX over stored doubles are exact in any order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

_REVENUE = (
    "CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST(l_discount AS DECIMAL(8,4))), 4) AS DECIMAL(18,4))"
)


def _revenue() -> F.Column:
    return (
        dec("l_extendedprice") * (1 - dec("l_discount", "decimal(8,4)"))
    ).cast("decimal(18,4)")


# ---------------------------------------------------------------------------
# Q2 shape: correlated scalar-MIN subquery → decorrelated min-per-group join
# ---------------------------------------------------------------------------

_Q2_EU_PRICES = """
  SELECT l_partkey, s_name,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
"""


@register(
    "q2_cheapest_supplier",
    oracle=f"""
WITH eu AS ({_Q2_EU_PRICES})
SELECT DISTINCT p_partkey, p_name, s_name, unit_price AS min_unit_price
FROM part
JOIN eu ON eu.l_partkey = p_partkey
WHERE p_size <= 10
  AND unit_price = (
    SELECT MIN(unit_price) FROM eu e2 WHERE e2.l_partkey = eu.l_partkey
  )
ORDER BY min_unit_price, p_partkey, s_name
LIMIT 100
""",
)
def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped: for each small part, the European supplier(s)
    offering the minimum unit price. The correlated scalar-MIN subquery is
    decorrelated into a min-per-partkey aggregate joined back to the
    priced rows — one shuffle on partkey instead of a per-row subquery.
    Unit price is a single IEEE division of two stored doubles, identical
    in both engines; MIN and the equality test are then exact."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )

    eu_supp = supplier.join(
        F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "s_name")
    priced = li.join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey).select(
        "l_partkey",
        "s_name",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    min_price = priced.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("unit_price").alias("min_unit_price")
    )
    return (
        priced.join(
            min_price,
            (priced.l_partkey == min_price.mp_partkey)
            & (priced.unit_price == min_price.min_unit_price),
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_partkey", "p_name", "s_name", "min_unit_price")
        .distinct()
        .orderBy("min_unit_price", "p_partkey", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share of one supplier nation inside one customer region
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_7' THEN {_REVENUE} END)
                 AS DOUBLE)
            / CAST(SUM({_REVENUE}) AS DOUBLE) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY order_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped: NATION_7's share of European customers' purchase
    revenue, per order year. Share-of-total needs no second pass: a
    conditional SUM and the total SUM come out of the same hash aggregate.
    Both sums are exact decimals; the share is one double division.
    Dimension chains (customer→nation→region, supplier→nation) broadcast;
    the only shuffle is orders⋈lineitem on orderkey."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust_dim = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            ),
            F.col("c_nationkey") == nation.n_nationkey,
        )
        .select("c_custkey")
    )
    supp_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_dim), orders.o_custkey == cust_dim.c_custkey)
        .join(F.broadcast(supp_dim), li.l_suppkey == supp_dim.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_7", _revenue()))
                .cast("double")
                / F.sum(_revenue()).cast("double")
            )
            .cast("double")
            .alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape: profit (revenue − cost proxy) per supplier nation and year
# ---------------------------------------------------------------------------

_Q9_COST = (
    "CAST(round(CAST(p_retailprice AS DECIMAL(18,4))"
    " * CAST(l_quantity AS DECIMAL(8,4)) * 0.08, 4) AS DECIMAL(18,4))"
)


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(SUM({_REVENUE} - {_Q9_COST}) AS DOUBLE) AS profit,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, order_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped: profit on red parts per supplier nation per year.
    The original prices cost from ``partsupp``; with no partsupp table the
    cost proxy is 8% of retail price × quantity, computed in exact decimal
    (round-then-cast, matching DuckDB's truncating cast). Part (name
    filter), supplier, and nation broadcast; lineitem⋈orders is the one
    fact-fact shuffle."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    cost = F.round(
        dec("p_retailprice") * dec("l_quantity", "decimal(8,4)") * F.lit(0.08).cast("decimal(3,2)"),
        4,
    ).cast("decimal(18,4)")
    supp_nat = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.sum(_revenue() - cost).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Q11 shape: groups whose value exceeds a fraction of the global total
# ---------------------------------------------------------------------------


@register(
    "q11_value_concentration",
    oracle=f"""
SELECT l_partkey, CAST(SUM({_REVENUE}) AS DOUBLE) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING CAST(SUM({_REVENUE}) AS DOUBLE) > (
  SELECT 1.5 * (CAST(SUM({_REVENUE}) AS DOUBLE) / COUNT(DISTINCT l_partkey))
  FROM lineitem
)
ORDER BY part_value DESC, l_partkey
""",
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped: parts whose revenue exceeds 1.5× the average
    per-part revenue (scale-invariant, unlike the original's fixed
    fraction-of-total, which collapses to zero rows as the part count
    grows). The HAVING-vs-global-scalar subquery becomes a broadcast
    cross-join of the single-row threshold onto the per-part aggregate.
    Determinism: averaging the per-part doubles would be order-dependent;
    instead the threshold is exact-decimal total / distinct part count —
    one division, engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_revenue()).cast("double").alias("part_value")
    )
    total = li.agg(
        (
            F.lit(1.5)
            * (F.sum(_revenue()).cast("double") / F.countDistinct("l_partkey"))
        ).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 shape: late-shipment priority counts per line status
# ---------------------------------------------------------------------------


@register(
    "q12_late_priority_counts",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 45 DAY
GROUP BY l_linestatus
""",
)
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped: lines shipped ≥45 days after order placement,
    split by priority class per line status (the testdata has no
    ``l_shipmode``; ``l_linestatus`` plays its role). Both CASE counts come
    from a single hash aggregate over the one orderkey shuffle — a literal
    translation with two filtered self-joins would shuffle three times."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: NOT-IN subquery + COUNT(DISTINCT) per attribute combination
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_part_stats",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
""",
)
def q16_supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped: distinct supplier counts per (brand, size) for
    selected parts, excluding negative-balance suppliers. The NOT IN
    subquery becomes a broadcast LEFT ANTI join (safe here: s_suppkey is
    never NULL, so NOT IN ≡ anti-join). COUNT(DISTINCT) expands to a
    two-level aggregate; the first level reuses the partkey-join output
    without an extra shuffle at this group-key cardinality."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated per-group AVG threshold
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey,
         0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(8,4))) AS DOUBLE)
                / COUNT(*)) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN part_avg USING (l_partkey)
WHERE p_brand = 'Brand#13' AND l_quantity < qty_threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped: revenue from unusually small orders of one brand's
    parts. The correlated ``l_quantity < 0.5*AVG(per part)`` subquery is
    decorrelated into an avg-per-partkey aggregate joined back on partkey.
    The average is exact-decimal-sum / count (one double division), so the
    threshold — and therefore the strict comparison — is bit-identical in
    both engines. At scale: the per-part aggregate output is small
    (one row per part) and AQE demotes its join to broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            0.5
            * (
                F.sum(dec("l_quantity", "decimal(8,4)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == part_avg.pa_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested IN subqueries → cascaded semi joins
# ---------------------------------------------------------------------------


@register(
    "q20_heavy_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (
    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
  )
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(8,4))) > CAST(80 AS DECIMAL(8,4))
)
ORDER BY s_suppkey
""",
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped: suppliers who moved >80 units of any 'small%'
    part. The nested IN chain (supplier ← lineitem ← part) becomes two
    cascaded joins: a broadcast semi-join of the part filter into
    lineitem, a grouped HAVING on (suppkey, partkey), then a left-semi
    join into supplier. Quantity sums stay in exact decimal so the HAVING
    threshold is engine-identical."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity", "decimal(8,4)")).alias("total_qty"))
        .filter(F.col("total_qty") > F.lit(80).cast("decimal(8,4)"))
        .select("l_suppkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS → one per-order profile aggregate
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
profile AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp,
         MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_suppkey
  FROM late GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM profile JOIN supplier ON late_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped: suppliers who were the *sole* late shipper on a
    finished multi-supplier order. The classic EXISTS (another supplier on
    the order) + NOT EXISTS (another *late* supplier) pair would be two
    extra self-joins of lineitem; instead one per-order profile aggregate
    computes (#suppliers, #late suppliers, the late supplier) in a single
    orderkey shuffle, and the EXISTS semantics become ``n_supp > 1 AND
    n_late_supp = 1``. MAX(CASE) safely names the late supplier because
    the filter pins exactly one. At 100 TB this is the difference between
    one shuffle of lineitem and three."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late_flag = F.when(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    profile = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", late_flag.alias("is_late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("is_late") == 1, F.col("l_suppkey"))
            ).alias("n_late_supp"),
            F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
                "late_suppkey"
            ),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        profile.join(
            F.broadcast(supplier), profile.late_suppkey == supplier.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
