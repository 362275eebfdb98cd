"""Approximate-nearest-neighbor similarity search over embeddings
(north star, BASELINE.json; SURVEY.md §7 P3).

Two escalating strategies over the ``embeddings`` table
(``array<float>``, 64-dim):

- ``similarity_topk``      — brute-force cosine top-k: the exactness
  baseline. Query side is broadcast; scan side is embarrassingly parallel.
- ``similarity_ivf_topk``  — IVF (inverted-file) search: build coarse cells
  (here: the ``label`` pre-clustering), rank cells per query by cosine to
  the *centroid direction*, probe only the top ``NPROBE`` cells, exact-rank
  inside. At 100 TB the centroid table is tiny (broadcast), each query
  touches NPROBE/N_CELLS of the corpus, and the only big shuffle is keyed
  by cell id.

Determinism (oracle parity): embeddings are quantized to integer
micro-units; every dot product is then an exact integer (< 2^53, exact even
in DuckDB's double accumulator), and cosines are single IEEE divisions.
Centroid *direction* is the component-sum vector — using the sum instead of
the mean cancels the 1/n and keeps everything in exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
NPROBE = 3


def cosine_pandas_udf():
    """Vectorized (Arrow) scalar pandas_udf computing cosine similarity
    between two array<double> columns — the sanctioned Python escape hatch
    when the expression form (``int_dot``/``zip_with``) can't express the
    math (e.g. calling into numpy/BLAS for wide embeddings). ~10-100×
    faster than a row-at-a-time Python UDF: whole Arrow batches cross the
    JVM↔Python boundary once.

    Kept as an alternative implementation (tests assert it matches the
    expression form); the registered queries use the pure-JVM expression
    path, which needs no Python workers at all.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: no `pd.Series` type hints — `from __future__ import annotations`
    # turns them into strings this module can't evaluate at decoration time
    @pandas_udf("double")
    def cos(a, b):
        am = np.stack(a.values)
        bm = np.stack(b.values)
        num = (am * bm).sum(axis=1)
        den = np.sqrt((am * am).sum(axis=1)) * np.sqrt((bm * bm).sum(axis=1))
        return pd.Series(num / den)

    return cos


def quantized(col: Column) -> Column:
    """float array → exact integer micro-unit array."""
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000000).cast("long"))


def int_dot(u: Column, v: Column) -> Column:
    """Exact integer dot product via zip_with + left fold."""
    return F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_QUANT_SQL = """
SELECT vec_id, label,
       list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
FROM embeddings
"""


@register(
    "similarity_topk",
    oracle=f"""
WITH q AS ({_QUANT_SQL}),
n AS (SELECT vec_id, qe, sqrt(list_dot_product(qe, qe)) AS nrm FROM q),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_dot_product(a.qe, b.qe) / (a.nrm * b.nrm) AS cosine
  FROM n a JOIN n b ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the query vectors (vec_id < 10).

    The query side is tiny → ``broadcast`` hint, so the corpus never
    shuffles for the join; ranking shuffles only |queries|×|corpus| scored
    pairs on query_id. This is the exact-recall baseline the IVF variant is
    measured against.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", quantized(F.col("embedding")).alias("qe")
    )
    n = emb.select(
        "vec_id", "qe", F.sqrt(int_dot(F.col("qe"), F.col("qe")).cast("double")).alias("nrm")
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("q_qe"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                int_dot(F.col("q_qe"), F.col("qe")).cast("double")
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )


@register(
    "normalize_embeddings",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
  FROM embeddings
),
n AS (SELECT vec_id, qe, sqrt(list_dot_product(qe, qe)) AS nrm FROM q)
SELECT vec_id,
       u.i AS pos,
       CAST(qe[u.i] AS DOUBLE) / nrm AS component,
       nrm / 1000000.0 AS l2_norm
FROM n, LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u
""",
)
def normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embeddings — the standard prep so cosine becomes a
    plain dot product downstream. Per-row expression work only;
    deterministic through the quantized-integer norm.

    Output shape is exploded scalars ``(vec_id, pos, component, l2_norm)``
    rather than an ``array<double>`` column: external comparison harnesses
    canonicalize via a pandas sort over all columns, which cannot hash
    list cells — scalar rows are sortable/hashable everywhere.  At scale
    the exploded frame is a map-only pass (no shuffle); a pipeline that
    wants the array back gets it with one ``collect_list`` grouped on the
    already-partitioned vec_id, or just keeps the array form internally
    (this query's compared surface is the portability contract, not the
    storage layout)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", quantized(F.col("embedding")).alias("qe"))
    n = q.select(
        "vec_id", "qe", F.sqrt(int_dot(F.col("qe"), F.col("qe")).cast("double")).alias("nrm")
    )
    return n.select(
        "vec_id", F.posexplode("qe").alias("pos0", "v"), "nrm"
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        (F.col("v").cast("double") / F.col("nrm")).alias("component"),
        (F.col("nrm") / 1000000.0).alias("l2_norm"),
    )


@register(
    "similarity_ivf_topk",
    oracle=f"""
WITH q AS ({_QUANT_SQL}),
ex AS (SELECT vec_id, label, i AS pos, qe[i] AS v
       FROM q, LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u),
cent AS (
  SELECT label, pos, CAST(SUM(v) AS BIGINT) AS c FROM ex GROUP BY label, pos
),
cnorm AS (SELECT label, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS c_nrm FROM cent GROUP BY label),
qv AS (SELECT vec_id, qe, sqrt(list_dot_product(qe, qe)) AS nrm FROM q WHERE vec_id < {N_QUERIES}),
qex AS (SELECT vec_id, pos, v FROM ex WHERE vec_id < {N_QUERIES}),
cell_score AS (
  SELECT qex.vec_id AS query_id, cent.label,
         CAST(SUM(qex.v * cent.c) AS BIGINT) AS dot
  FROM qex JOIN cent ON qex.pos = cent.pos
  GROUP BY 1, 2
),
cell_rank AS (
  SELECT query_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY CAST(dot AS DOUBLE) / c_nrm DESC, label) AS cell_rn
  FROM cell_score JOIN cnorm USING (label)
),
probed AS (SELECT query_id, label FROM cell_rank WHERE cell_rn <= {NPROBE}),
cand AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
         list_dot_product(qv.qe, n.qe) / (qv.nrm * n.nrm) AS cosine
  FROM probed p
  JOIN (SELECT vec_id, label, qe, sqrt(list_dot_product(qe, qe)) AS nrm FROM q) n
    ON n.label = p.label
  JOIN qv ON qv.vec_id = p.query_id
  WHERE n.vec_id <> p.query_id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {TOP_K}
""",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: probe the NPROBE cells whose centroid
    direction is most cosine-similar to the query, exact-rank within them.

    Plan shape at scale: centroids are |cells|×|dim| rows (tiny → computed
    once, broadcast both ways); the candidate join is keyed on cell id so
    each query only meets ~NPROBE/|cells| of the corpus. The query-side
    explode is |queries|×|dim| — still broadcastable for realistic query
    batches.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", quantized(F.col("embedding")).alias("qe")
    )
    # centroid direction per cell: component sums (posexplode → keyed
    # agg), with the cell norm attached IN the same frame by a label
    # window — sqrt(Σc²) over the 64 component rows of each label, the
    # exact integer sum the separate cnorm aggregate used to compute.
    # Carrying c_nrm on every (label, pos) row makes the centroid table
    # SINGLE-consumer (the cell-score broadcast join), so the full-corpus
    # explode+aggregate is planned exactly once by construction — the
    # round-10 eager localCheckpoint barrier (added because TWO consumers,
    # cnorm and the join, each re-planned the corpus pass) is obsolete:
    # one fewer synchronous job, one fewer broadcast, same single pass.
    ex = emb.select(
        "vec_id", "label", F.posexplode("qe").alias("pos0", "v")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "v")
    wl = Window.partitionBy("label")
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.sum("v").cast("bigint").alias("c"))
        .withColumn(
            "c_nrm", F.sqrt(F.sum(F.col("c") * F.col("c")).over(wl).cast("double"))
        )
    )
    n = emb.select(
        "vec_id", "label", "qe",
        F.sqrt(int_dot(F.col("qe"), F.col("qe")).cast("double")).alias("nrm"),
    )
    qv = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_qe"), F.col("nrm").alias("q_nrm")
    )
    # explode only the query vectors (not a filter over the full corpus
    # explode — |queries|×|dim| rows instead of |corpus|×|dim|); also keeps
    # qex lineage-independent of cent's ex, avoiding ambiguous label refs
    qex = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", F.posexplode("qe").alias("pos0", "v"))
        .select("vec_id", (F.col("pos0") + 1).alias("pos"), "v")
    )
    # c_nrm rides the group key (constant within a label) so the cell
    # ranking needs no second join
    cell_score = (
        qex.join(F.broadcast(cent), "pos")
        .groupBy(F.col("vec_id").alias("query_id"), "label", "c_nrm")
        .agg(F.sum(F.col("v") * F.col("c")).cast("bigint").alias("dot"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        (F.col("dot").cast("double") / F.col("c_nrm")).desc(), F.col("label")
    )
    probed = (
        cell_score.withColumn("cell_rn", F.row_number().over(wc))
        .filter(F.col("cell_rn") <= NPROBE)
        .select("query_id", "label")
    )
    cand = (
        n.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                int_dot(F.col("q_qe"), F.col("qe")).cast("double")
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


# --- random-hyperplane LSH (data-independent near-dup blocking) ----------
#
# 16 hyperplanes → 4 bands of 4 sign bits. Hyperplane components are
# pseudo-random integers in [-1000, 1000] derived from md5("hp<plane>_<pos>")
# — both engines compute the identical grid, so bucketing (and therefore
# the candidate set) is bitwise reproducible with no RNG state anywhere.
N_PLANES = 16
BAND_BITS = 4
LSH_COS_THRESHOLD = 0.3

#: Embedding dimensionality of the corpus. ArrayType carries no length in
#: the schema, so the dimension is pipeline configuration (as it is in any
#: real embedding store) — NOT discovered by running an eager job inside a
#: lazy query builder. Testdata embeddings are 64-d.
EMB_DIM = 64


@register(
    "dedup_lsh_cosine",
    oracle=f"""
WITH q AS ({_QUANT_SQL}),
comp AS (SELECT vec_id, u.i AS pos, qe[u.i] AS v FROM q,
         LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u),
planes AS (
  SELECT p.plane, d.pos,
         (('0x' || substr(md5('hp' || CAST(p.plane AS VARCHAR) || '_'
                               || CAST(d.pos AS VARCHAR)), 1, 8))::BIGINT
          % 2001) - 1000 AS coef
  FROM (SELECT unnest(generate_series(0, {N_PLANES - 1})) AS plane) p,
       (SELECT DISTINCT u.i AS pos FROM q,
        LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u) d
),
dots AS (SELECT c.vec_id, p.plane, SUM(c.v * p.coef) AS s
         FROM comp c JOIN planes p ON c.pos = p.pos GROUP BY 1, 2),
bands AS (SELECT vec_id, plane // {BAND_BITS} AS band,
                 CAST(SUM(CASE WHEN s >= 0 THEN 1 ELSE 0 END
                          * (1 << (plane % {BAND_BITS}))) AS BIGINT) AS band_key
          FROM dots GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key
          AND a.vec_id < b.vec_id),
n AS (SELECT vec_id, qe, sqrt(list_dot_product(qe, qe)) AS nrm FROM q)
SELECT c.vec_a, c.vec_b,
       list_dot_product(x.qe, y.qe) / (x.nrm * y.nrm) AS cosine
FROM cand c JOIN n x ON c.vec_a = x.vec_id JOIN n y ON c.vec_b = y.vec_id
WHERE list_dot_product(x.qe, y.qe) / (x.nrm * y.nrm) >= {LSH_COS_THRESHOLD}
""",
)
def dedup_lsh_cosine(
    spark: SparkSession, sf_dir: str, dim: int = EMB_DIM
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH: sign-bit
    sketches over {N_PLANES} deterministic integer hyperplanes, banded
    {BAND_BITS} bits at a time; vectors sharing any band bucket become
    candidates; candidates are verified with the exact integer-quantized
    cosine. Unlike ``dedup_embedding_pairs`` (which blocks on the given
    ``label``), this needs NO pre-clustering key — the blocking is
    data-independent, which is the realistic 100 TB posture.

    Plan shape at scale: the hyperplane grid is tiny (N_PLANES×dim rows,
    broadcast); sketching is one keyed aggregate per (vec, plane); the
    candidate join shuffles only (band, band_key, vec_id) tuples — pair
    expansion is quadratic within buckets only, and band width tunes the
    recall/cost trade-off. Verification touches candidates, not n².
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", quantized(F.col("embedding")).alias("qe"))

    comp = q.select("vec_id", F.posexplode("qe").alias("pos0", "v")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "v"
    )
    # one flat range → (plane, pos) grid; no join in the grid construction
    planes = spark.range(N_PLANES * dim).select(
        (F.col("id") / dim).cast("int").alias("plane"),
        (F.col("id") % dim + 1).cast("int").alias("pos"),
    )
    coef = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("hp"),
                        F.col("plane").cast("string"),
                        F.lit("_"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    )
    planes = planes.select("plane", "pos", coef.alias("coef"))

    dots = (
        comp.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("v") * F.col("coef")).alias("s"))
    )
    bands = (
        dots.select(
            "vec_id",
            F.floor(F.col("plane") / BAND_BITS).cast("int").alias("band"),
            (
                (F.col("s") >= 0).cast("long")
                * F.pow(F.lit(2.0), (F.col("plane") % BAND_BITS).cast("double")).cast(
                    "long"
                )
            ).alias("bitval"),
        )
        .groupBy("vec_id", "band")
        .agg(F.sum("bitval").alias("band_key"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    n = q.select(
        "vec_id",
        "qe",
        F.sqrt(int_dot(F.col("qe"), F.col("qe")).cast("double")).alias("nrm"),
    )
    x, y = n.alias("x"), n.alias("y")
    # NOTE (round 11): verification deliberately stays the pure-JVM
    # expression fold rather than the Arrow pair-dot stage used by
    # dedup_embedding_pairs/semdedup — measured HERE the band-bucket
    # candidate set is small enough that the Arrow stage's fixed cost
    # exactly cancels the per-pair win (2.67 s → 2.83 s A/B)
    cos = int_dot(F.col("x.qe"), F.col("y.qe")).cast("double") / (
        F.col("x.nrm") * F.col("y.nrm")
    )
    return (
        cand.join(x, F.col("vec_a") == F.col("x.vec_id"))
        .join(y, F.col("vec_b") == F.col("y.vec_id"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= LSH_COS_THRESHOLD)
    )


# ----------------------------------- Johnson-Lindenstrauss random projection

import random as _random

#: JL output dimensionality. Signs are a fixed ±1 (Achlioptas) matrix drawn
#: once from a seeded PRNG and baked as LITERALS into both the Spark
#: expression tree and the DuckDB oracle SQL — cross-engine parity needs no
#: shared randomness at runtime, only shared codegen.
JL_DIM = 8
_JL_SIGNS: list[list[int]] = [
    [_random.Random(7_000 + p).choice((-1, 1)) for _ in range(EMB_DIM)]
    for p in range(JL_DIM)
]


def _jl_sum_sql(signs: list[int], spark_syntax: bool = False) -> str:
    """Left-associated ±embedding[d] chain as SQL TEXT — IEEE a+(-b) ≡ a-b,
    and the fixed association makes the double bit-identical in any engine
    that folds the same left-associative + chain. Generated as a string for
    BOTH engines (element access differs: Spark ``element_at`` vs DuckDB's
    1-based ``[]``); building it as 512 py4j ``Column`` calls instead cost
    ~2.3 s of driver round-trips per invocation."""
    at = "element_at(embedding, {i})" if spark_syntax else "embedding[{i}]"
    return " + ".join(
        f"(CAST({at.format(i=d + 1)} AS DOUBLE) * ({s}))"
        for d, s in enumerate(signs)
    )


@register(
    "embedding_jl_projection",
    oracle="SELECT vec_id, "
    + ", ".join(f"{_jl_sum_sql(_JL_SIGNS[p])} AS p{p}" for p in range(JL_DIM))
    + " FROM embeddings",
)
def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-d → 8-d sign-matrix random projection (Achlioptas' database-
    friendly JL variant: entries ±1, no gaussians, no float matrix to
    ship). The unscaled projection preserves pairwise distances up to the
    constant √(d_out) factor — downstream consumers that only rank by
    distance (ANN candidate generation, LSH bucketing, dedup blocking)
    never need the scale, so we skip the irrational 1/√8 multiplier that
    a bitwise cross-engine contract can't reproduce from libm.

    Map-only: zero shuffles, fully codegen'd 512-term expression tree; at
    100 TB it runs at parquet scan speed and cuts every downstream
    embedding shuffle's byte volume 8×. The sign matrix lives in the
    PLAN, not in data — nothing to broadcast, nothing to keep in sync.
    The projection is generated as ONE ``selectExpr`` SQL string — the
    same plan as the Column-by-Column formulation, without the ~2 s of
    py4j round-trips that building 512 Column objects costs the driver.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.selectExpr(
        "vec_id",
        *[
            f"{_jl_sum_sql(_JL_SIGNS[p], spark_syntax=True)} AS p{p}"
            for p in range(JL_DIM)
        ],
    )


# ------------------------------------------------- Product quantization

#: PQ geometry: 8 subspaces × 8 dims, 8 centroids per subspace. Codebook
#: entries are 3-decimal literals from a seeded PRNG, sized to the
#: embedding value range (~±0.15) — like the JL signs they are plan
#: constants, identical by construction on both engines.
PQ_M = 8
PQ_SUB_DIM = EMB_DIM // PQ_M
PQ_K = 8
_PQ_CODEBOOK: list[list[list[float]]] = [
    [
        [round(_random.Random(13_000 + s * 997 + k * 31 + d).uniform(-0.15, 0.15), 3)
         for d in range(PQ_SUB_DIM)]
        for k in range(PQ_K)
    ]
    for s in range(PQ_M)
]


def _pq_dist_sql(s: int, k: int, spark_syntax: bool = False) -> str:
    at = "element_at(embedding, {i})" if spark_syntax else "embedding[{i}]"
    terms = []
    for d in range(PQ_SUB_DIM):
        c = _PQ_CODEBOOK[s][k][d]
        e = (
            f"(CAST({at.format(i=s * PQ_SUB_DIM + d + 1)} AS DOUBLE)"
            f" - CAST({c} AS DOUBLE))"
        )
        terms.append(f"({e} * {e})")
    return " + ".join(terms)


def _pq_oracle_sql() -> str:
    cols = []
    for s in range(PQ_M):
        lst = ", ".join(_pq_dist_sql(s, k) for k in range(PQ_K))
        cols.append(
            f"list_indexof([{lst}], list_aggregate([{lst}], 'min')) AS code_{s}"
        )
        cols.append(f"list_aggregate([{lst}], 'min') AS err_{s}")
    outer_err = " + ".join(f"err_{s}" for s in range(PQ_M))
    inner = ", ".join(cols)
    return (
        f"SELECT vec_id, "
        + ", ".join(f"code_{s}" for s in range(PQ_M))
        + f", {outer_err} AS total_err FROM "
        f"(SELECT vec_id, {inner} FROM embeddings)"
    )


@register("embedding_pq_assign", oracle=_pq_oracle_sql())
def embedding_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code assignment (Jégou et al.): each 64-d
    vector becomes 8 codes of 3 bits (nearest of 8 centroids per 8-d
    subspace) plus the exact reconstruction error.

    This is the memory layer under billion-scale ANN: 64 floats (256 B)
    compress to 8 small ints, and asymmetric distance at query time is 8
    table lookups instead of 64 multiplies. The assignment itself is
    map-only argmin over plan-constant codebooks — zero shuffles, one
    codegen'd expression per subspace; at 100 TB it is a pure scan pass,
    and the codes column is what you'd write back as the ANN index.

    Argmin is ``array_position(dists, array_min(dists))`` — 1-based,
    first-match-wins tiebreak in BOTH engines, and the distance doubles
    are bit-identical by fixed-association construction, so even exact
    ties resolve identically.

    Like the JL projection, the whole 1000-term tree is shipped as TWO
    ``selectExpr`` SQL strings — identical plan to the Column-based
    build, minus ~6 s of per-invocation py4j driver chatter."""
    emb = load_table(spark, sf_dir, "embeddings")
    exprs = []
    for s in range(PQ_M):
        lst = ", ".join(_pq_dist_sql(s, k, spark_syntax=True) for k in range(PQ_K))
        exprs.append(
            f"array_position(array({lst}), array_min(array({lst}))) AS code_{s}"
        )
        exprs.append(f"array_min(array({lst})) AS err_{s}")
    inner = emb.selectExpr("vec_id", *exprs)
    total = " + ".join(f"err_{s}" for s in range(PQ_M))
    return inner.selectExpr(
        "vec_id",
        *[f"code_{s}" for s in range(PQ_M)],
        f"{total} AS total_err",
    )


# ------------------------------------------------- PQ asymmetric top-k

#: Fixed query vector for the ADC scan — 3-decimal literals from the
#: same seeded PRNG family as the codebook, identical by construction on
#: both engines.
_ADC_QUERY: list[float] = [
    round(_random.Random(77_000 + i).uniform(-0.15, 0.15), 3)
    for i in range(EMB_DIM)
]

ADC_TOPK = 10


def _adc_lut() -> list[list[float]]:
    """lut[s][k] = ||q_s − codebook[s][k]||² — 64 doubles computed ONCE
    in Python (fixed left-fold order) and baked as ``repr`` literals into
    both engines' SQL, so the lookup values are bit-identical by
    construction rather than by parallel evaluation."""
    lut = []
    for s in range(PQ_M):
        row = []
        for k in range(PQ_K):
            acc = 0.0
            for d in range(PQ_SUB_DIM):
                diff = _ADC_QUERY[s * PQ_SUB_DIM + d] - _PQ_CODEBOOK[s][k][d]
                acc += diff * diff
            row.append(acc)
        lut.append(row)
    return lut


def _adc_lut_micro() -> list[list[int]]:
    """The ADC lookup table quantized ONCE in Python to exact integer
    micro-units (round(v·10⁶)).  The compared ``adc_dist`` column is then
    a BIGINT sum of 8 integer literals — immune to any float
    canonicalization/formatting skew in an external comparison harness
    (the repo's integer-exact idiom, same as ``similarity_topk``'s
    quantized dot products).  Round-half-to-even happens here, in one
    place, before the literals are baked into either engine's SQL."""
    return [[round(v * 1_000_000) for v in row] for row in _adc_lut()]


def _adc_oracle_sql() -> str:
    lut = _adc_lut_micro()
    code_items = []
    lookups = []
    for s in range(PQ_M):
        lst = ", ".join(_pq_dist_sql(s, k) for k in range(PQ_K))
        code_items.append(
            f"list_indexof([{lst}], list_aggregate([{lst}], 'min')) AS code_{s}"
        )
        lits = ", ".join(str(v) for v in lut[s])
        lookups.append(f"list_extract([{lits}], code_{s})")
    codes = ", ".join(code_items)
    adc = " + ".join(lookups)  # integer micro-unit sum — cannot flap
    return f"""
SELECT vec_id, CAST({adc} AS BIGINT) AS adc_dist
FROM (SELECT vec_id, {codes} FROM embeddings)
ORDER BY adc_dist, vec_id
LIMIT {ADC_TOPK}
"""


@register("similarity_pq_topk", oracle=_adc_oracle_sql())
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the query-time half
    of product quantization (Jégou et al.), completing the ANN ladder
    brute-force (``similarity_topk``) → IVF (``similarity_ivf_topk``) →
    PQ. The corpus side is 8 codes per vector (what ``embedding_pq_assign``
    writes back as the index); the query vector is quantized NOWHERE —
    its exact distance to every centroid is a 64-entry lookup table
    computed once at plan-build time, so scoring a vector is 8 array
    lookups + 7 adds instead of 64 multiplies, and at 100 TB the scan
    reads the 8-byte code column instead of the 256-byte embedding (a
    32× I/O reduction before any pruning; compose with the IVF cell
    filter for the standard IVFADC pipeline).

    The whole scorer is one codegen'd ``selectExpr`` over plan constants —
    map-only, zero shuffles — and the top-k compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows,
    never a global sort). Ties break on vec_id; ``adc_dist`` is an exact
    BIGINT in micro-units — the LUT is quantized once in Python
    (``_adc_lut_micro``) and baked as integer literal text in both
    engines, so the compared column cannot flap under any harness's
    float canonicalization."""
    emb = load_table(spark, sf_dir, "embeddings")
    lut = _adc_lut_micro()
    code_items = []
    lookups = []
    for s in range(PQ_M):
        lst = ", ".join(_pq_dist_sql(s, k, spark_syntax=True) for k in range(PQ_K))
        code_items.append(
            f"array_position(array({lst}), array_min(array({lst}))) AS code_{s}"
        )
        lits = ", ".join(str(v) for v in lut[s])
        lookups.append(f"element_at(array({lits}), CAST(code_{s} AS INT))")
    adc = " + ".join(lookups)
    inner = emb.selectExpr("vec_id", *code_items)
    return (
        inner.selectExpr("vec_id", f"CAST({adc} AS BIGINT) AS adc_dist")
        .orderBy("adc_dist", "vec_id")
        .limit(ADC_TOPK)
    )


# ------------------------------------------------- IVF + ADC composite

IVFADC_NPROBE = 3

#: Query vector in exact integer milli-units for the coarse (cell) stage:
#: 3-decimal literals × 1000 are exact ints, so the cell scores are
#: integer aggregates — order-independent, bit-identical across engines.
_Q_INT: list[int] = [round(v * 1000) for v in _ADC_QUERY]


def _ivfadc_oracle_sql() -> str:
    lut = _adc_lut_micro()
    qints = ", ".join(str(v) for v in _Q_INT)
    code_items = []
    lookups = []
    for s in range(PQ_M):
        lst = ", ".join(_pq_dist_sql(s, k) for k in range(PQ_K))
        code_items.append(
            f"list_indexof([{lst}], list_aggregate([{lst}], 'min')) AS code_{s}"
        )
        lits = ", ".join(str(v) for v in lut[s])
        lookups.append(f"list_extract([{lits}], code_{s})")
    codes = ", ".join(code_items)
    adc = " + ".join(lookups)
    return f"""
WITH q AS ({_QUANT_SQL}),
comp AS (SELECT vec_id, label, u.i AS pos, qe[u.i] AS v FROM q,
         LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u),
cent AS (SELECT label, pos, SUM(v) AS c FROM comp GROUP BY 1, 2),
score AS (
  SELECT label,
         SUM(([{qints}])[pos] * c) AS dot,
         SUM(c * c) AS cc
  FROM cent GROUP BY label
),
probed AS (
  SELECT label FROM (
    SELECT label,
           row_number() OVER (
             ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(cc AS DOUBLE)) DESC,
                      label) AS rn
    FROM score
  ) WHERE rn <= {IVFADC_NPROBE}
),
cand AS (
  SELECT e.vec_id, e.label, {codes}
  FROM embeddings e JOIN probed p ON e.label = p.label
)
SELECT vec_id, label, CAST({adc} AS BIGINT) AS adc_dist
FROM cand
ORDER BY adc_dist, vec_id
LIMIT {ADC_TOPK}
"""


@register("similarity_ivfadc_topk", oracle=_ivfadc_oracle_sql())
def similarity_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (Jégou et al.): the full billion-scale ANN pipeline in one
    plan — coarse quantizer probes the NPROBE cells nearest the query,
    then PQ asymmetric distance ranks ONLY the probed cells' vectors.
    Composes the two independently-proven stages (`similarity_ivf_topk`
    cell probe, `similarity_pq_topk` ADC scan); at 100 TB the scan touches
    nprobe/|cells| of the corpus and reads 8-byte codes, not embeddings —
    the two multiplicative reductions that make exhaustive search
    unnecessary.

    Cross-engine exactness: the coarse stage works in integer micro-units
    (centroid component sums and the query's milli-unit literals are
    exact ints → cell scores are order-independent integer aggregates;
    only the final rank divides doubles), and the ADC stage sums integer
    micro-unit LUT literals (``_adc_lut_micro``) so the compared
    ``adc_dist`` is an exact BIGINT on both engines. The cell-rank window is unpartitioned but runs over
    the |cells|-row centroid frame (10³-10⁴ rows at any corpus size —
    cells scale with sqrt(n) by the usual IVF sizing, not with data
    volume). Centroid component sums grow with cell size; at extreme
    cell populations move the norm to DOUBLE before squaring (the
    division already is) — the int path here keeps the oracle bitwise.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qemb = emb.select("vec_id", "label", quantized(F.col("embedding")).alias("qe"))
    ex = qemb.select(
        "label", F.posexplode("qe").alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).alias("pos"), "v")
    cent = ex.groupBy("label", "pos").agg(F.sum("v").alias("c"))
    qints = ", ".join(str(v) for v in _Q_INT)
    score = (
        cent.withColumn(
            "qi", F.expr(f"element_at(array({qints}), CAST(pos AS INT))")
        )
        .groupBy("label")
        .agg(
            F.sum(F.col("qi") * F.col("c")).alias("dot"),
            F.sum(F.col("c") * F.col("c")).alias("cc"),
        )
    )
    wc = Window.orderBy(
        (F.col("dot").cast("double") / F.sqrt(F.col("cc").cast("double"))).desc(),
        F.col("label"),
    )
    probed = (
        score.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= IVFADC_NPROBE)
        .select("label")
    )
    lut = _adc_lut_micro()
    code_items = []
    lookups = []
    for s in range(PQ_M):
        lst = ", ".join(_pq_dist_sql(s, k, spark_syntax=True) for k in range(PQ_K))
        code_items.append(
            f"array_position(array({lst}), array_min(array({lst}))) AS code_{s}"
        )
        lits = ", ".join(str(v) for v in lut[s])
        lookups.append(f"element_at(array({lits}), CAST(code_{s} AS INT))")
    adc = " + ".join(lookups)
    cand = emb.join(F.broadcast(probed), "label").selectExpr(
        "vec_id", "label", *code_items
    )
    return (
        cand.selectExpr("vec_id", "label", f"CAST({adc} AS BIGINT) AS adc_dist")
        .orderBy("adc_dist", "vec_id")
        .limit(ADC_TOPK)
    )


def _exact_q_dist_sql(spark_syntax: bool) -> str:
    """||q − embedding||² as one literal 64-term expression (fixed left
    association; identical text modulo the array accessor on both
    engines), so the exact baseline is bit-identical cross-engine."""
    at = "element_at(embedding, {i})" if spark_syntax else "embedding[{i}]"
    terms = []
    for i, qv in enumerate(_ADC_QUERY):
        e = f"(CAST({at.format(i=i + 1)} AS DOUBLE) - CAST({qv} AS DOUBLE))"
        terms.append(f"({e} * {e})")
    return " + ".join(terms)


@register(
    "similarity_pq_recall",
    oracle=f"""
WITH exact_top AS (
  SELECT vec_id FROM (
    SELECT vec_id, {_exact_q_dist_sql(False)} AS d FROM embeddings
  ) ORDER BY d, vec_id LIMIT {ADC_TOPK}
),
adc_top AS ({_adc_oracle_sql()})
SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap,
       CAST({ADC_TOPK} AS BIGINT) AS k,
       CAST(COUNT(*) AS DOUBLE) / {ADC_TOPK} AS recall_at_k
FROM adc_top a JOIN exact_top e ON a.vec_id = e.vec_id
""",
)
def similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ-ADC scan against the EXACT nearest neighbors of
    the same query — the measured answer to "what did 32× less I/O cost
    in quality", the ANN analog of ``dedup_lsh_recall``. Both rankings
    are TakeOrderedAndProject over map-only literal expressions (the
    exact side is the full 64-term distance, the ADC side the 8-lookup
    approximation); the audit joins two k-row frames, so the whole query
    adds one broadcast join over the two scans. At 100 TB you run this
    on a sampled slice to TUNE (M, K, nprobe) before committing the
    full-corpus scan to the approximate path. (The fixture codebook is
    seeded-random, not k-means-trained, so LOW recall here is the
    expected, honest reading — the audit exists precisely to expose
    that; training the codebook is ``embedding_kmeans_step``'s job.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    exact_top = (
        emb.selectExpr("vec_id", f"{_exact_q_dist_sql(True)} AS d")
        .orderBy("d", "vec_id")
        .limit(ADC_TOPK)
        .select("vec_id")
    )
    adc_top = similarity_pq_topk(spark, sf_dir).select("vec_id")
    joined = adc_top.join(F.broadcast(exact_top), "vec_id")
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap"),
        F.lit(ADC_TOPK).cast("bigint").alias("k"),
        (F.count(F.lit(1)).cast("double") / ADC_TOPK).alias("recall_at_k"),
    )
