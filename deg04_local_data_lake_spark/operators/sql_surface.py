"""SQL scalar/window surface parity — breadth queries locking the function
surface a reference user would expect (the reference's own scalar usage is
the small F1-F10 set, SURVEY.md §2.9; these queries extend parity to the
wider everyday-SQL surface and document the cross-engine gotchas).

Known engine differences encoded here (so parity is by construction):

- ``dayofweek``: Spark is 1=Sunday..7; DuckDB is 0=Sunday..6 — the query
  publishes the ISO day number via Spark ``dayofweek()-1`` vs DuckDB
  ``dayofweek()``.
- ``date_trunc`` returns TIMESTAMP in Spark but DATE in DuckDB for day+
  granularities — both sides cast to DATE.
- ``initcap`` / ``months_between`` don't exist in DuckDB — excluded.
- Window frames: every ordering is made total (tiebreak on the key), so
  rank/lag/first_value are deterministic; RANGE frames still see peer rows
  by *value*, which both engines define identically.

All outputs are strings/integers/dates or exact-integer-derived doubles —
no float-sum nondeterminism anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.functions.portable import dec
from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table


@register(
    "string_functions_parity",
    oracle="""
SELECT c_custkey,
       translate(c_name, '#Cu', '-cU') AS translated,
       reverse(c_name) AS reversed,
       repeat(right(c_name, 2), 3) AS repeated,
       strpos(c_name, '#') AS hash_pos,
       lpad(CAST(c_custkey % 1000 AS VARCHAR), 5, '0') AS padded,
       left(c_name, 8) AS prefix,
       right(c_name, 4) AS suffix,
       split_part(c_name, '#', 2) AS after_hash,
       upper(left(c_name, 3)) || lower(right(c_name, 3)) AS mixed_case,
       length(replace(c_name, '0', '')) AS len_no_zeros,
       ltrim(rtrim('  ' || c_name || '  ')) AS trimmed
FROM customer
""",
)
def string_functions_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface over customer names: translate / reverse /
    repeat / strpos / pad / left / right / split_part / case folding /
    replace / trim — all per-row codegen expressions, scan-speed at any
    scale."""
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.translate(name, "#Cu", "-cU").alias("translated"),
        F.reverse(name).alias("reversed"),
        F.repeat(F.expr("right(c_name, 2)"), 3).alias("repeated"),
        F.instr(name, "#").alias("hash_pos"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 5, "0").alias("padded"),
        F.expr("left(c_name, 8)").alias("prefix"),
        F.expr("right(c_name, 4)").alias("suffix"),
        F.split_part(name, F.lit("#"), F.lit(2)).alias("after_hash"),
        F.concat(
            F.upper(F.expr("left(c_name, 3)")), F.lower(F.expr("right(c_name, 3)"))
        ).alias("mixed_case"),
        F.length(F.replace(name, F.lit("0"), F.lit(""))).alias("len_no_zeros"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), name, F.lit("  ")))).alias("trimmed"),
    )


@register(
    "datetime_functions_parity",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       dayofweek(o_orderdate) AS dow_sunday0,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
       CAST(date_add(CAST(o_orderdate AS DATE), INTERVAL 3 MONTH) AS DATE) AS plus_3_months
FROM orders
""",
)
def datetime_functions_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime surface over order dates: trunc (month/week), last_day,
    day-of-week (normalized to DuckDB's Sunday=0 convention), ISO week,
    quarter, day-of-year, day diff, month arithmetic with end-of-month
    clamping (both engines clamp Jan 31 + 1 month to Feb 29)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.last_day(d.cast("date")).alias("month_end"),
        (F.dayofweek(d) - 1).alias("dow_sunday0"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.quarter(d).cast("int").alias("qtr"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.add_months(d.cast("date"), 3).alias("plus_3_months"),
    )


@register(
    "window_kitchen_sink",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       rank()         OVER w AS price_rank,
       dense_rank()   OVER w AS price_dense_rank,
       percent_rank() OVER w AS price_pct_rank,
       cume_dist()    OVER w AS price_cume_dist,
       ntile(7)       OVER w AS price_septile,
       lag(o_orderkey, 1, -1)  OVER w AS prev_key,
       lead(o_orderkey, 2, -2) OVER w AS next2_key,
       first_value(o_orderkey) OVER w AS cheapest_key,
       nth_value(o_orderkey, 3) OVER
         (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key,
       count(*) OVER
         (PARTITION BY o_orderpriority ORDER BY o_totalprice
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_or_below
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def window_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/navigation window surface in one pass: rank /
    dense_rank / percent_rank / cume_dist / ntile / lag / lead (with
    defaults) / first_value / nth_value, plus a RANGE frame whose peers
    group by *value* (count of orders priced at or below the current one).
    One shuffle on the partition key serves every function — Spark
    evaluates all frames of the same (partition, order) in one Window
    node. Ordering carries an orderkey tiebreak so navigation functions
    are total; the RANGE frame deliberately orders on the raw price to
    exercise peer-row semantics (identical in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wrange = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
        F.ntile(7).over(w).alias("price_septile"),
        F.lag("o_orderkey", 1, -1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 2, -2).over(w).alias("next2_key"),
        F.first_value("o_orderkey").over(w).alias("cheapest_key"),
        F.nth_value("o_orderkey", 3)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("third_key"),
        F.count(F.lit(1)).over(wrange).alias("n_at_or_below"),
    )


@register(
    "null_semantics_parity",
    oracle="""
WITH t AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END AS bal,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_nationkey END AS nat
  FROM customer
)
SELECT c_custkey,
       coalesce(bal, -1.0) AS bal_or_default,
       nullif(nat, 0) AS nat_nonzero,
       ifnull(nat, -9) AS nat_or_neg9,
       greatest(bal, 0.0) AS bal_floor0,
       least(bal, 0.0) AS bal_cap0,
       (bal IS NOT DISTINCT FROM NULL) AS bal_is_null,
       (nat IS DISTINCT FROM 7) AS nat_ne7_nullsafe,
       CASE WHEN bal IS NULL THEN 'missing'
            WHEN bal < 0 THEN 'debtor' ELSE 'ok' END AS bal_class
FROM t
""",
)
def null_semantics_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface on synthesized null-rich columns: coalesce,
    nullif, ifnull, greatest/least (both engines skip NULLs and return
    NULL only when all inputs are), null-safe (dis)equality (Spark `<=>`
    ≡ IS NOT DISTINCT FROM), and CASE fall-through. Encodes the exact
    three-valued-logic behavior both engines share."""
    c = load_table(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(F.col("c_custkey") % 5 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nat"),
    )
    return t.select(
        "c_custkey",
        F.coalesce(F.col("bal"), F.lit(-1.0)).alias("bal_or_default"),
        F.nullif(F.col("nat"), F.lit(0)).alias("nat_nonzero"),
        F.ifnull(F.col("nat"), F.lit(-9)).alias("nat_or_neg9"),
        F.greatest(F.col("bal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("bal"), F.lit(0.0)).alias("bal_cap0"),
        F.col("bal").eqNullSafe(F.lit(None).cast("double")).alias("bal_is_null"),
        (~F.col("nat").eqNullSafe(F.lit(7))).alias("nat_ne7_nullsafe"),
        F.when(F.col("bal").isNull(), "missing")
        .when(F.col("bal") < 0, "debtor")
        .otherwise("ok")
        .alias("bal_class"),
    )


@register(
    "collection_functions_parity",
    oracle="""
SELECT vec_id,
       len(embedding) AS n_dims,
       list_sort(embedding)[1] AS low1,
       list_sort(embedding)[2] AS low2,
       list_sort(embedding)[3] AS low3,
       list_aggregate(embedding, 'max') AS max_val,
       CAST(list_position(embedding, list_aggregate(embedding, 'max'))
            AS BIGINT) AS pos_of_max,
       embedding[-1] AS last_val,
       list_contains(embedding, embedding[1]) AS has_first,
       array_to_string(flatten([[vec_id], [vec_id + 1]]), ',') AS flat_pair,
       CAST(list_sum(list_transform(range(1, CAST(vec_id % 5 AS BIGINT) + 2),
                                    x -> x * x)) AS BIGINT) AS sum_squares,
       array_to_string(list_sort(list_distinct([vec_id % 3, vec_id % 3, vec_id % 2])),
                       ',') AS dedup_mods,
       map_extract(map(['a', 'b'], [vec_id, vec_id + 1]), 'b')[1] AS map_b,
       array_to_string(map_keys(map(['a', 'b'], [vec_id, vec_id + 1])), ',') AS mkeys
FROM embeddings
WHERE vec_id < 200
""",
)
def collection_functions_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map function surface over a REAL array column (embeddings),
    the collections companion to the string/datetime/window/null parity
    quartet. Cross-engine gotchas encoded here:

    - Spark ``slice(arr, start, length)`` vs DuckDB ``list_slice(arr, lo,
      hi)`` — length-vs-inclusive-bound;
    - Spark ``array_position`` returns 0 when absent, DuckDB NULL — the
      probed element always exists here, so both sides agree;
    - ``sequence(1, n)`` (inclusive) vs ``range(1, n+1)`` (exclusive);
    - DuckDB ``map_extract`` returns a LIST of matches — ``[1]`` unwraps;
    - ``array_distinct`` keeps first-occurrence order but DuckDB's
      ``list_distinct`` does NOT (set semantics) — both sides sort the
      deduped array to a canonical order.

    Everything stays in column expressions (codegen'd or HOF-interpreted,
    never Python) and the scan reads only the two needed columns — at
    100 TB the ``vec_id`` predicate and the column pruning both reach
    parquet."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    e = F.col("embedding")
    seq = F.sequence(F.lit(1).cast("long"), F.col("vec_id") % 5 + 1)
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")),
        F.array(F.col("vec_id"), F.col("vec_id") + 1),
    )
    def joined(arr: Column) -> Column:
        # Arrays are emitted as comma-joined strings (integer rendering is
        # identical cross-engine); scalar columns keep the output
        # canonicalizable by pandas-based comparison harnesses.
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")

    srt = F.sort_array(e)
    return emb.select(
        "vec_id",
        F.size(e).alias("n_dims"),
        F.element_at(srt, 1).alias("low1"),
        F.element_at(srt, 2).alias("low2"),
        F.element_at(srt, 3).alias("low3"),
        F.array_max(e).alias("max_val"),
        F.array_position(e, F.array_max(e)).alias("pos_of_max"),
        F.element_at(e, -1).alias("last_val"),
        F.array_contains(e, F.element_at(e, 1)).alias("has_first"),
        joined(
            F.flatten(
                F.array(F.array(F.col("vec_id")), F.array(F.col("vec_id") + 1))
            )
        ).alias("flat_pair"),
        F.aggregate(
            seq, F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("sum_squares"),
        joined(
            F.sort_array(
                F.array_distinct(
                    F.array(
                        F.col("vec_id") % 3, F.col("vec_id") % 3, F.col("vec_id") % 2
                    )
                )
            )
        ).alias("dedup_mods"),
        F.element_at(m, "b").alias("map_b"),
        joined(F.map_keys(m)).alias("mkeys"),
    )


@register(
    "variant_props_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
         AS min_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_no_field
FROM events
GROUP BY event_type
""",
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` shreds the
    ``props`` JSON once into the binary VARIANT encoding; typed reads use
    ``try_variant_get`` with a JSON path (returning NULL, not an error, for
    absent fields — asserted by ``n_no_field`` covering every row). This is
    the third semi-structured strategy next to per-field
    ``get_json_object`` (events_json_extract) and schema-first ``from_json``
    (events_props_from_json): at 100 TB, VARIANT wins when the shape is
    open-ended — one parse, binary-encoded storage, pushdown-friendly typed
    gets — while ``from_json`` wins when the schema is closed."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_type",
            F.try_variant_get(v, "$.k", "int").alias("k"),
            F.try_variant_get(v, "$.missing", "string").alias("absent"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_no_field"),
        )
    )


@register(
    "bitwise_functions_parity",
    oracle="""
SELECT event_id,
       event_id & 255 AS band,
       event_id | 4096 AS bor,
       xor(event_id, 1365) AS bxor,
       event_id << 3 AS shl,
       event_id >> 2 AS shr,
       CAST(bit_count(event_id) AS INTEGER) AS popcount,
       ~event_id AS bnot
FROM events WHERE event_id < 200
""",
)
def bitwise_functions_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface — AND/OR/XOR, shifts, popcount, complement —
    pinned cross-engine on int64 (two's complement in both). These are the
    primitives under every hash-partitioning, bitmap, and bloom trick in
    the engine (LSH band keys, simhash bits, salting), so their semantics
    get their own parity lock. All row-local: codegen'd, zero shuffles."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("band"),
        F.expr("event_id | 4096").alias("bor"),
        F.expr("event_id ^ 1365").alias("bxor"),
        F.expr("shiftleft(event_id, 3)").alias("shl"),
        F.expr("shiftright(event_id, 2)").alias("shr"),
        F.expr("bit_count(event_id)").alias("popcount"),
        F.expr("~event_id").alias("bnot"),
    )


@register(
    "not_in_null_semantics",
    oracle="""
SELECT
  CAST((SELECT count(*) FROM orders
        WHERE o_custkey NOT IN
          (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END
           FROM customer)) AS BIGINT) AS n_with_null_list,
  CAST((SELECT count(*) FROM orders
        WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer WHERE c_custkey % 100 <> 0))
       AS BIGINT) AS n_without_nulls
""",
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, pinned: if the subquery list contains even one
    NULL, ``x NOT IN (list)`` is never TRUE (three-valued logic), so the
    first count is 0 — while the null-free variant returns the real
    complement. Spark plans the nullable case as a null-aware anti join
    (BroadcastNestedLoopJoin under the hood — THE reason to prefer
    ``NOT EXISTS`` at scale, which stays a hash anti join); the oracle
    proves both engines implement the same ANSI semantics. This is the
    query-correctness gotcha every migration from permissive engines hits.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_nn_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_nn_customer")
    return spark.sql(
        """
        SELECT
          CAST((SELECT count(*) FROM _nn_orders
                WHERE o_custkey NOT IN
                  (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL
                               ELSE c_custkey END
                   FROM _nn_customer)) AS BIGINT) AS n_with_null_list,
          CAST((SELECT count(*) FROM _nn_orders
                WHERE o_custkey NOT IN
                  (SELECT c_custkey FROM _nn_customer
                   WHERE c_custkey % 100 <> 0)) AS BIGINT) AS n_without_nulls
        """
    )


@register(
    "range_interval_window",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(SUM(rev) OVER (ORDER BY day
                           RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                     AND CURRENT ROW) AS DOUBLE)
         AS rev_7d,
       CAST(COUNT(*) OVER (ORDER BY day
                           RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
         AS days_present_7d
FROM daily
""",
)
def range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-aware trailing window: 7-day revenue via a RANGE frame over
    the DATE ordering — unlike a ROWS frame, missing days shrink the
    window (RANGE bounds are value-offsets, not row-offsets), so no
    gap-filling prelude is needed. The exact-decimal sum keeps the frame
    aggregate bitwise portable; `days_present_7d` exposes how many rows
    the value-bounded frame actually covered. Same tiny-ordered-series
    posture as the other curve operators (input is the pre-aggregated
    daily table)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(dec("o_totalprice")).alias("rev")
    )
    daily.createOrReplaceTempView("_riw_daily")
    return spark.sql(
        """
        SELECT day,
               CAST(SUM(rev) OVER (ORDER BY day
                                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                             AND CURRENT ROW) AS DOUBLE)
                 AS rev_7d,
               CAST(COUNT(*) OVER (ORDER BY day
                                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                             AND CURRENT ROW) AS BIGINT)
                 AS days_present_7d
        FROM _riw_daily
        """
    )


@register(
    "sql_parameterized_entry",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_high,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_totalprice >= 100000.0
GROUP BY 1
""",
)
def sql_parameterized_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL entry (the injection-safe upgrade of the
    reference's string-built ``spark.sql`` EP2): the statement text is a
    constant with ``:name`` markers and values bind through
    ``EXECUTE IMMEDIATE … USING``, so user input can never splice into
    the SQL — the same plan as the literal query (parameters fold to
    constants before optimization; pushdown and pruning are unaffected).
    ``spark.sql(sql, args={...})`` is the equivalent host-language
    binding, used throughout the tests."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "deg04_param_orders"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  CAST(COUNT(*) AS BIGINT) AS n_high,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS revenue
           FROM deg04_param_orders
           WHERE o_totalprice >= :min_price
           GROUP BY o_orderpriority'
        USING 100000.0 AS min_price
        """
    )


@register(
    "sql_scripting_block",
    oracle="""
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) / COUNT(*) AS DOUBLE)
           AS avg_bal
  FROM customer WHERE c_acctbal > 0.00
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       (SELECT avg_bal FROM thr) AS threshold
FROM customer, thr
WHERE CAST(c_acctbal AS DOUBLE) > thr.avg_bal
GROUP BY c_mktsegment
""",
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (BEGIN…END compound): DECLARE a session variable,
    SET it from a scalar subquery, then use it in the result query — the
    procedural two-step ("compute a data-driven threshold, then apply
    it") that the reference scripts in Python driver code, expressed
    entirely in SQL. The threshold is an exact-decimal mean cast to
    double once, so both engines compare the identical value. Each
    statement still plans through Catalyst individually; the script only
    sequences them — nothing becomes driver-side row iteration."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "deg04_script_customer"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE avg_bal DOUBLE;
          SET avg_bal = (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) / COUNT(*)
                        AS DOUBLE)
            FROM deg04_script_customer WHERE c_acctbal > 0.00
          );
          SELECT c_mktsegment,
                 CAST(COUNT(*) AS BIGINT) AS n_above,
                 avg_bal AS threshold
          FROM deg04_script_customer
          WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
          GROUP BY c_mktsegment;
        END
        """
    )
