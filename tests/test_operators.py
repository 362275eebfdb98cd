"""Operator-level unit tests on small in-memory frames — semantics the
oracle comparison can't see (reference-fixture behavior, edge cases,
plan-shape assertions)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from deg04_local_data_lake_spark.operators.asof import asof_join
from deg04_local_data_lake_spark.operators.cdc import (
    cdc_upsert,
    changed_records,
    new_records,
)
from deg04_local_data_lake_spark.operators.windows import sessionize, top_k_per_group


def _employees(spark):
    """The reference's CDC fixture (increamental_dataload.py:9-45 /
    FIXTURES.md F4): 3 base rows; inc = 2 field-updates + 1 multi-field
    update + 1 new."""
    base = spark.createDataFrame(
        [(1, "Alice", 30, 50000), (2, "Bob", 35, 60000), (3, "Carol", 28, 55000)],
        "id int, name string, age int, salary int",
    )
    inc = spark.createDataFrame(
        [
            (1, "Alice", 31, 50000),      # age update
            (2, "Bob", 35, 65000),        # salary update
            (3, "Caroline", 29, 58000),   # multi-field update
            (4, "Dan", 40, 52000),        # new record
        ],
        "id int, name string, age int, salary int",
    )
    return base, inc


def test_cdc_upsert_reference_semantics(spark):
    base, inc = _employees(spark)
    cols = ["name", "age", "salary"]

    changed = changed_records(base, inc, "id", cols)
    assert {r["id"] for r in changed.collect()} == {1, 2, 3}

    new = new_records(base, inc, "id")
    assert [r["id"] for r in new.collect()] == [4]

    final = cdc_upsert(base, inc, "id", cols).collect()
    assert len(final) == 4  # 3 updated + 1 new, the reference's expected frame
    by_id = {r["id"]: r for r in final}
    assert by_id[1]["age"] == 31
    assert by_id[2]["salary"] == 65000
    assert by_id[3]["name"] == "Caroline" and by_id[3]["salary"] == 58000
    assert by_id[4]["name"] == "Dan"


def test_cdc_null_safe_change_detection(spark):
    """The reference's `!=` misses NULL transitions; ours must not."""
    base = spark.createDataFrame([(1, None), (2, "x")], "id int, v string")
    inc = spark.createDataFrame([(1, "now-set"), (2, None)], "id int, v string")
    got = {r["id"] for r in changed_records(base, inc, "id", ["v"]).collect()}
    assert got == {1, 2}


def test_asof_join_tie_and_no_match(spark):
    t = datetime.datetime
    right = spark.createDataFrame(
        [(1, t(2024, 1, 1, 10, 0), 100), (1, t(2024, 1, 1, 12, 0), 101)],
        "k int, ts timestamp, rv int",
    )
    left = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 9, 0), "before-any"),
            (1, t(2024, 1, 1, 10, 0), "exact-tie"),
            (1, t(2024, 1, 1, 11, 59), "between"),
            (1, t(2024, 1, 1, 23, 0), "after-all"),
            (2, t(2024, 1, 1, 12, 0), "other-key"),
        ],
        "k int, ts timestamp, tag string",
    )
    rows = {r["tag"]: r for r in asof_join(left, right, key="k").collect()}
    assert rows["before-any"]["asof_rv"] is None
    assert rows["exact-tie"]["asof_rv"] == 100  # at-or-before includes ties
    assert rows["between"]["asof_rv"] == 100
    assert rows["after-all"]["asof_rv"] == 101
    assert rows["other-key"]["asof_rv"] is None


def test_sessionize_gap_boundary(spark):
    t = datetime.datetime
    ev = spark.createDataFrame(
        [
            (1, 10, t(2024, 1, 1, 0, 0)),
            (2, 10, t(2024, 1, 1, 0, 30)),       # exactly 30min -> same session
            (3, 10, t(2024, 1, 1, 1, 0, 1)),     # 30min+1s -> new session
        ],
        "event_id long, user_id long, ts timestamp",
    )
    seqs = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(ev).select("event_id", "session_seq").collect()
    }
    assert seqs[1] == seqs[2]
    assert seqs[3] == seqs[1] + 1


def test_parse_listing_name_edge_cases(spark):
    """FIXTURES.md F3 edge cases: NULL name, fewer-than-4 tokens, and the
    no-rating positional shift."""
    from deg04_local_data_lake_spark.operators.relational import parse_listing_name

    df = spark.createDataFrame(
        [
            (1, "Cozy loft · ★4.85 · 2 bedrooms · 2 beds"),
            (2, "Plain room · 1 bedrooms · 1 beds"),   # no rating: shift left
            (3, None),                                  # NULL name
            (4, "Just a title"),                        # too few tokens
        ],
        "id int, name string",
    )
    rows = {r["id"]: r for r in parse_listing_name(df).collect()}
    assert rows[1]["reviews"] == "4.85" and rows[1]["bedrooms"] == "2 bedrooms"
    assert rows[2]["reviews"] is None and rows[2]["bedrooms"] == "1 bedrooms"
    assert rows[3]["description"] is None and rows[3]["beds"] is None
    assert rows[4]["description"] == "Just a title" and rows[4]["bedrooms"] is None


def test_cosine_pandas_udf_matches_expression(spark, sf_dir):
    """The Arrow pandas_udf cosine and the JVM expression cosine must agree
    to float precision on real embeddings."""
    from deg04_local_data_lake_spark.operators.similarity import (
        cosine_pandas_udf,
        int_dot,
        quantized,
    )
    from deg04_local_data_lake_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    a = emb.selectExpr("vec_id AS ida", "embedding AS ea")
    b = emb.selectExpr("vec_id AS idb", "embedding AS eb")
    pairs = a.join(b, F.col("ida") < F.col("idb")).select(
        "ida",
        "idb",
        F.col("ea").cast("array<double>").alias("da"),
        F.col("eb").cast("array<double>").alias("db"),
    )
    cos = cosine_pandas_udf()
    qa, qb = quantized(F.col("da")), quantized(F.col("db"))
    got = pairs.select(
        "ida",
        "idb",
        cos("da", "db").alias("udf_cos"),
        (
            int_dot(qa, qb).cast("double")
            / (
                F.sqrt(int_dot(qa, qa).cast("double"))
                * F.sqrt(int_dot(qb, qb).cast("double"))
            )
        ).alias("expr_cos"),
    ).collect()
    assert got, "no pairs"
    for r in got:
        assert abs(r["udf_cos"] - r["expr_cos"]) < 1e-4


def test_top_k_deterministic_on_ties(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (1, 10, "c"), (1, 9, "d")],
        "g int, score int, id string",
    )
    got = top_k_per_group(
        df, ["g"], [F.col("score").desc(), F.col("id")], k=2
    ).collect()
    assert [(r["id"], r["rn"]) for r in sorted(got, key=lambda r: r["rn"])] == [
        ("a", 1),
        ("b", 2),
    ]


def test_cm_sketch_never_undercounts_and_merges(spark, smoke_dir):
    """Count-min invariants: (1) estimate ≥ exact for every key (collisions
    only add mass); (2) mergeability — cell-wise SUM of two half-corpus
    sketches equals the whole-corpus sketch (the contract that lets CM
    roll up across partitions/days without raw data)."""
    from deg04_local_data_lake_spark.operators.sketches import (
        cm_sketch_user_counts,
    )
    from deg04_local_data_lake_spark.sources.readers import load_table

    rows = cm_sketch_user_counts(spark, smoke_dir).collect()
    assert rows
    assert all(r["overcount"] >= 0 for r in rows)

    from pyspark.sql import functions as F
    from deg04_local_data_lake_spark.operators.sketches import CM_DEPTH, CM_WIDTH

    ev = load_table(spark, smoke_dir, "events")
    depths = F.array(*[F.lit(i) for i in range(CM_DEPTH)])
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("cm"), F.col("d").cast("string"),
                    F.lit(":"), F.col("user_id").cast("string"),
                )
            ), 1, 12,
        ), 16, 10,
    ).cast("long")

    def cells(df):
        return (
            df.select("user_id", F.explode(depths).alias("d"))
            .select("d", F.pmod(h, F.lit(CM_WIDTH)).alias("bucket"))
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("cell"))
        )

    whole = {(r["d"], r["bucket"]): r["cell"] for r in cells(ev).collect()}
    lo = cells(ev.filter(F.col("event_id") % 2 == 0)).collect()
    hi = cells(ev.filter(F.col("event_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in [*lo, *hi]:
        k = (r["d"], r["bucket"])
        merged[k] = merged.get(k, 0) + r["cell"]
    assert merged == whole


def test_bloom_decontamination_no_false_negatives(spark, smoke_dir):
    """Bloom guarantee: every exact train/eval duplicate is flagged —
    false negatives are structurally impossible (all k bits of a member
    are set by construction), and the audit columns must agree."""
    from deg04_local_data_lake_spark.operators.llm_extras import (
        bloom_decontamination_audit,
    )

    rows = bloom_decontamination_audit(spark, smoke_dir).collect()
    assert rows
    assert not [r for r in rows if r["exact_hit"] and not r["bloom_hit"]]
    for r in rows:
        assert r["false_positive"] == (r["bloom_hit"] and not r["exact_hit"])


def test_co_purchase_cap_bounds_mega_basket(spark):
    """Adversarial mega-basket: one 2000-line order would put ~2M pairs
    into a single join group of every co-purchase build (pagerank,
    triangles, itemset pairs). The basket cap must exclude it while
    leaving normal baskets untouched — and since the cap is plain SQL,
    every oracle applies the identical rule (no divergence trade)."""
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.operators.analytics import (
        CO_PURCHASE_ORDER_CAP,
        _cap_baskets,
    )

    normal = spark.range(50).selectExpr(
        "id AS l_orderkey",
        "explode(sequence(1, 5)) AS line",
    ).selectExpr("l_orderkey", "l_orderkey * 10 + line AS l_partkey")
    mega = spark.range(1).selectExpr(
        "9999 AS l_orderkey", "explode(sequence(1, 2000)) AS l_partkey"
    )
    li = _cap_baskets(normal.unionByName(mega))
    assert li.filter(F.col("l_orderkey") == 9999).count() == 0
    assert li.count() == 250  # normal baskets untouched
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .count()
    )
    assert pairs == 50 * 10  # C(5,2) per basket; ~2M mega pairs gone
    # boundary: a basket exactly at the cap survives
    at_cap = spark.range(1).selectExpr(
        "1 AS l_orderkey",
        f"explode(sequence(1, {CO_PURCHASE_ORDER_CAP})) AS l_partkey",
    )
    assert _cap_baskets(at_cap).count() == CO_PURCHASE_ORDER_CAP


def test_co_purchase_parity_holds_with_mega_basket_present(spark, tmp_path):
    """End-to-end cap attestation on data that actually CONTAINS a
    mega-basket: a 1500-line order is injected into a copy of the
    testdata, and the graph queries must still hash-match their DuckDB
    twins — both engines apply the identical SQL cap, so the pair
    explosion never happens on either side and the mega-order's parts
    simply vanish from the co-purchase signal."""
    import glob
    import shutil

    import duckdb

    from deg04_local_data_lake_spark import oracle

    src = "/root/testdata/sf0.001"
    dst = tmp_path / "mega_sf"
    dst.mkdir()
    for f in glob.glob(f"{src}/*.parquet"):
        if not f.endswith("lineitem.parquet"):
            shutil.copy(f, dst)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src}/lineitem.parquet')
          UNION ALL
          SELECT 999999990 AS l_orderkey,
                 1000000 + i AS l_partkey,
                 1 AS l_suppkey, CAST(i AS INT) AS l_linenumber,
                 1.0 AS l_quantity, 1.0 AS l_extendedprice,
                 0.0 AS l_discount, 0.0 AS l_tax,
                 'N' AS l_returnflag, 'O' AS l_linestatus,
                 TIMESTAMP '2024-01-01 00:00:00' AS l_shipdate
          FROM (SELECT unnest(generate_series(1, 1500)) AS i)
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    for name in ("pagerank_step", "frequent_itemset_pairs"):
        ok, msg = oracle.check_query(spark, str(dst), name)
        assert ok, f"{name} with mega-basket: {msg}"
    # and the mega parts are really excluded from the graph
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark import registry

    pr = registry.queries()["pagerank_step"](spark, str(dst))
    assert pr.filter(F.col("partkey") >= 1000000).count() == 0
