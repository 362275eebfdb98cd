"""Modern ANSI-SQL surface: recursive CTEs and ordered string aggregation.

The reference drives everything through ``spark.sql`` text (SURVEY.md §3
EP2), so the SQL dialect surface IS its API surface. These queries lock
the two most-requested "modern SQL" capabilities a migrating user would
reach for next, both newly available in Spark 4:

- ``WITH RECURSIVE`` — iterative plans expressed declaratively (hierarchy
  walks, transitive closure). The engine unrolls the loop; each iteration
  here is a broadcast-able equi-join, so the 100 TB posture is "k joins of
  a shrinking frontier against a partitioned fact", not a driver loop.
  (The non-SQL twin of this pattern — label propagation — is
  ``dedup_clusters``; PageRank's single step is ``pagerank_step``.)
- ``listagg(...) WITHIN GROUP (ORDER BY ...)`` — deterministic ordered
  string aggregation (DuckDB twin: ``string_agg(... ORDER BY ...)``).

Determinism: the recursive walk is over an exact integer tree (parent =
key div 2) so results are engine-independent; listagg's WITHIN GROUP order
is total (rank is tie-broken on the key), so the concatenation is unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table


@register(
    "recursive_tree_depth",
    oracle="""
WITH RECURSIVE tree(node, root, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey BETWEEN 1 AND 10
  UNION ALL
  SELECT c.c_custkey, t.root, t.depth + 1
  FROM customer c JOIN tree t ON c.c_custkey // 2 = t.node
)
SELECT root, depth, COUNT(*) AS n_nodes, CAST(SUM(node) AS BIGINT) AS sum_keys
FROM tree GROUP BY root, depth
""",
)
def recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over the implicit binary tree on customer keys
    (parent(k) = k div 2 — an exact, data-independent hierarchy, so the
    oracle is checkable): from roots 1..10, walk all descendants present in
    the table, tracking origin root and depth.

    The recursive leg is a single equi-join (parent computed on the child
    side — an OR of the two child keys would have forced a nested-loop
    plan), so every unrolled iteration hash-joins a shrinking frontier;
    state per iteration is the frontier only. Depth is bounded by
    log₂(max key) ≈ 21 even at 100 TB key ranges."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_rec_customer")
    return spark.sql(
        """
        WITH RECURSIVE tree(node, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM _rec_customer
          WHERE c_custkey BETWEEN 1 AND 10
          UNION ALL
          SELECT c.c_custkey, t.root, t.depth + 1
          FROM _rec_customer c JOIN tree t ON c.c_custkey DIV 2 = t.node
        )
        SELECT root, depth, COUNT(*) AS n_nodes,
               CAST(SUM(node) AS BIGINT) AS sum_keys
        FROM tree GROUP BY root, depth
        """
    )


@register(
    "listagg_top_customers",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_mktsegment,
       string_agg(c_name, ',' ORDER BY rn) AS top_names,
       CAST(COUNT(*) AS BIGINT) AS n_listed
FROM ranked WHERE rn <= 5
GROUP BY c_mktsegment
""",
)
def listagg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment CSV of the top-5 customers by balance (rank tie-broken
    on custkey → a total order, so the concatenated string is unique).
    Spark 4 ``listagg WITHIN GROUP`` ≡ DuckDB ``string_agg(... ORDER BY)``.
    The rank prune happens before the aggregate, so the strings stay tiny
    regardless of table size."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_la_customer")
    return spark.sql(
        """
        WITH ranked AS (
          SELECT c_mktsegment, c_name, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM _la_customer
        )
        SELECT c_mktsegment,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY rn) AS top_names,
               CAST(COUNT(*) AS BIGINT) AS n_listed
        FROM ranked WHERE rn <= 5
        GROUP BY c_mktsegment
        """
    )
