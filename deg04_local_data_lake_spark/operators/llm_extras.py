"""Second-round LLM training-data pipeline operators
(north star, BASELINE.json; not present in the reference — SURVEY.md §7 P3).

Five curation capabilities a 100 TB text/embedding pipeline needs beyond
the first-round dedup/similarity/quality set:

- benchmark contamination detection (cross-split n-gram overlap)
- PII detection and redaction (regex, pure codegen)
- passage-level dedup (fixed-size chunks shared across documents)
- corpus-rare-token scoring (integer-exact rarity threshold)
- k-means reassignment step (one Lloyd iteration over embeddings)

Determinism: counts and integer comparisons everywhere; every ratio is a
single int/int or exact-int-derived double division; embedding math uses
the quantized-integer dot products from ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

CONTAM_K = 5  # 5-word shingles: long enough that chance overlap is rare
PASSAGE_WORDS = 20

EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


# ---------------------------------------------------------------------------
# Contamination: test-split documents sharing n-grams with the train split
# ---------------------------------------------------------------------------

_CONTAM_SHINGLES = """
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i) u
"""


@register(
    "contamination_ngram_overlap",
    oracle=f"""
WITH sh AS ({_CONTAM_SHINGLES}),
train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0)
SELECT sh.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN train.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap,
       CAST(SUM(CASE WHEN train.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         / COUNT(*) AS overlap_ratio,
       CAST(SUM(CASE WHEN train.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) > 0
         AS contaminated
FROM sh LEFT JOIN train ON sh.s = train.s
WHERE sh.doc_id % 2 = 1
GROUP BY sh.doc_id
""",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for each test-split document
    (doc_id odd), how many of its distinct 5-gram shingles also occur
    anywhere in the train split (doc_id even).

    The train shingle set is built once (distinct) and the test shingles
    left-join it on the shingle string — at 100 TB both sides shuffle on
    the shingle key exactly once; a bloom filter on the train set
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default)
    prunes the probe side before the exchange. 5-grams keep chance
    collisions near zero, so a nonzero overlap means copied text."""
    from deg04_local_data_lake_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs, k=CONTAM_K).distinct()
    train = (
        sh.filter(F.col("doc_id") % 2 == 0)
        .select(F.col("s").alias("train_s"))
        .distinct()
    )
    test = sh.filter(F.col("doc_id") % 2 == 1)
    hit = F.when(F.col("train_s").isNotNull(), 1).otherwise(0)
    return (
        test.join(train, test.s == train.train_s, "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit).cast("bigint").alias("n_overlap"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap") / F.col("n_shingles")).alias("overlap_ratio"),
            (F.col("n_overlap") > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

_NOTE_SQL = (
    "'Reach ' || c_name || ' at ' || lower(replace(c_name, '#', ''))"
    " || '@example.com or +1-555-' ||"
    " lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "text_pii_redact",
    oracle=f"""
WITH notes AS (SELECT c_custkey, {_NOTE_SQL} AS note FROM customer)
SELECT c_custkey,
       regexp_extract(note, '{EMAIL_RE}') AS email,
       regexp_extract(note, '{PHONE_RE}') AS phone,
       len(regexp_extract_all(note, '{EMAIL_RE}'))
         + len(regexp_extract_all(note, '{PHONE_RE}')) AS n_pii,
       regexp_replace(regexp_replace(note, '{EMAIL_RE}', '[EMAIL]', 'g'),
                      '{PHONE_RE}', '[PHONE]', 'g') AS redacted
FROM notes
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: find email addresses and phone numbers
    by regex, count them, and rewrite the text with typed placeholders.

    The corpus documents are synthetic word soup with no PII, so the
    fixture text is contact notes derived from ``customer`` — the regex
    plumbing (extract / extract_all / global replace) is what this
    operator demonstrates. Pure per-row codegen expressions: at 100 TB it
    runs at scan speed with zero shuffle, and the regexes are kept to
    syntax with identical semantics in Java regex and RE2."""
    cust = load_table(spark, sf_dir, "customer")
    note = F.concat(
        F.lit("Reach "),
        F.col("c_name"),
        F.lit(" at "),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit(""))),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    notes = cust.select("c_custkey", note.alias("note"))
    n_pii = F.size(
        F.regexp_extract_all(F.col("note"), F.lit(EMAIL_RE), F.lit(0))
    ) + F.size(F.regexp_extract_all(F.col("note"), F.lit(PHONE_RE), F.lit(0)))
    return notes.select(
        "c_custkey",
        F.regexp_extract("note", EMAIL_RE, 0).alias("email"),
        F.regexp_extract("note", PHONE_RE, 0).alias("phone"),
        n_pii.alias("n_pii"),
        F.regexp_replace(
            F.regexp_replace("note", EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
        ).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Passage-level dedup (fixed-size word chunks shared across documents)
# ---------------------------------------------------------------------------


@register(
    "passage_dedup",
    oracle=f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(0, CAST(ceil(len(w) / {PASSAGE_WORDS}.0) AS INT) - 1),
           i -> array_to_string(
                  list_slice(w, i * {PASSAGE_WORDS} + 1,
                             i * {PASSAGE_WORDS} + {PASSAGE_WORDS}), ' ')
         )) AS passage
  FROM t WHERE len(w) > 0
),
counted AS (
  SELECT doc_id,
         COUNT(*) OVER (PARTITION BY md5(passage)) AS occurrences
  FROM chunks
)
SELECT doc_id,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN occurrences > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST(SUM(CASE WHEN occurrences > 1 THEN 1 ELSE 0 END) AS BIGINT)
         / COUNT(*) AS shared_ratio
FROM counted GROUP BY doc_id
""",
)
def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level dedup: split each document into fixed 20-word chunks
    and measure, per document, how many of its passages occur (verbatim)
    anywhere else in the corpus — the sub-document granularity between
    exact dedup (whole doc) and shingle dedup (every n-gram).

    Chunks are built per-row with higher-order slice expressions, then the
    only shuffle is the window partition on the passage *hash* — 32-byte
    keys, never full text. At 100 TB the passage-hash exchange is the
    working set; everything before it is scan-speed map work."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("w")
    ).filter(F.size("w") > 0)
    chunks = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, int(ceil(size(w) / {PASSAGE_WORDS}.0)) - 1),"
                f" i -> array_join(slice(w, i * {PASSAGE_WORDS} + 1,"
                f" {PASSAGE_WORDS}), ' '))"
            )
        ).alias("passage"),
    )
    occurrences = F.count(F.lit(1)).over(Window.partitionBy(F.md5("passage")))
    counted = chunks.select("doc_id", occurrences.alias("occurrences"))
    shared = F.when(F.col("occurrences") > 1, 1).otherwise(0)
    return counted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(shared).cast("bigint").alias("n_shared"),
        (F.sum(shared).cast("bigint") / F.count(F.lit(1))).alias("shared_ratio"),
    )


# ---------------------------------------------------------------------------
# Corpus-rare-token scoring
# ---------------------------------------------------------------------------


@register(
    "text_rare_token_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
freq AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
stats AS (
  SELECT CAST(SUM(c) AS BIGINT) AS total_tokens, COUNT(*) AS n_vocab FROM freq
),
rare AS (
  SELECT w FROM freq, stats WHERE 2 * c * n_vocab < total_tokens
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN rare.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare,
       CAST(SUM(CASE WHEN rare.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         / COUNT(*) AS rare_ratio
FROM tok LEFT JOIN rare ON tok.w = rare.w
GROUP BY doc_id
""",
)
def text_rare_token_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-rarity scoring: a token is *rare* when its corpus frequency
    is below half the mean token frequency — the integer test
    ``2·c·|vocab| < total_tokens`` avoids any float threshold, so the rare
    set is engine-exact. Per document: rare-token count and ratio (the
    cheap surprise/outlier signal used for quality filtering and
    dedup-marker detection; on this corpus it isolates the injected
    near-duplicate marker token).

    Plan: one token explode feeds both the frequency aggregate and the
    per-doc count; the rare vocabulary is tiny → broadcast back onto the
    token stream, so the only big shuffle is the word-frequency exchange."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    stats = freq.agg(
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_vocab"),
    )
    rare = (
        freq.join(F.broadcast(stats))
        .filter(2 * F.col("c") * F.col("n_vocab") < F.col("total_tokens"))
        .select(F.col("w").alias("rare_w"))
    )
    hit = F.when(F.col("rare_w").isNotNull(), 1).otherwise(0)
    return (
        tok.join(F.broadcast(rare), tok.w == F.col("rare_w"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(hit).cast("bigint").alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_rare",
            (F.col("n_rare") / F.col("n_tokens")).alias("rare_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# One Lloyd (k-means) reassignment step over embeddings
# ---------------------------------------------------------------------------

_QUANT_SQL = """
SELECT vec_id, label,
       list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
FROM embeddings
"""


@register(
    "embedding_kmeans_step",
    oracle=f"""
WITH q AS ({_QUANT_SQL}),
ex AS (SELECT vec_id, label, i AS pos, qe[i] AS v
       FROM q, LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u),
cent AS (
  SELECT label AS c_label, pos, CAST(SUM(v) AS BIGINT) AS c
  FROM ex GROUP BY 1, 2
),
cnorm AS (
  SELECT c_label, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS c_nrm
  FROM cent GROUP BY 1
),
dots AS (
  SELECT ex.vec_id, cent.c_label, CAST(SUM(ex.v * cent.c) AS BIGINT) AS dot
  FROM ex JOIN cent USING (pos) GROUP BY 1, 2
),
ranked AS (
  SELECT vec_id, c_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY CAST(dot AS DOUBLE) / c_nrm DESC, c_label)
           AS rn
  FROM dots JOIN cnorm USING (c_label)
)
SELECT q.label AS old_label, ranked.c_label AS new_label,
       COUNT(*) AS n_vecs
FROM ranked JOIN q USING (vec_id)
WHERE rn = 1
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def embedding_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration over the embedding table: centroids are the
    per-label component sums (exact integers — summing instead of
    averaging cancels the 1/n without changing the argmax), every vector
    is reassigned to its max-cosine centroid, and the output is the
    (old_label → new_label) movement matrix.

    Cosine argmax per vector needs no vector norm (constant per vector),
    only the centroid norm — so the ranking key dot/‖c‖ stays a single
    double division of exact integers. Plan: the centroid table is
    k×dim rows (tiny → broadcast); the component join fans each exploded
    component row out k ways map-side; the per-(vector, cell) dot
    aggregate is the one real shuffle. Iterating this query to a fixed
    point is driver-side composition (each step is one job); the step
    itself is what must scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000000).cast("long")
        ).alias("qe"),
    )
    ex = q.select(
        "vec_id", "label", F.posexplode("qe").alias("pos0", "v")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "v")
    cent = ex.groupBy(F.col("label").alias("c_label"), "pos").agg(
        F.sum("v").cast("bigint").alias("c")
    )
    cnorm = cent.groupBy("c_label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")).alias("c_nrm")
    )
    dots = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "c_label")
        .agg(F.sum(F.col("v") * F.col("c")).cast("bigint").alias("dot"))
    )
    ranked = (
        dots.join(F.broadcast(cnorm), "c_label")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    (F.col("dot").cast("double") / F.col("c_nrm")).desc(),
                    F.col("c_label"),
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        ranked.join(q.select("vec_id", "label"), "vec_id")
        .groupBy(
            F.col("label").alias("old_label"),
            F.col("c_label").alias("new_label"),
        )
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("old_label", "new_label")
    )


@register(
    "embedding_pca_power_iter",
    oracle=f"""
WITH q AS ({_QUANT_SQL}),
ex AS (SELECT vec_id, i AS pos, qe[i] AS v,
              CASE WHEN i % 2 = 1 THEN 1 ELSE -1 END AS v0
       FROM q, LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u),
dotted AS (
  SELECT pos, v,
         SUM(v * v0) OVER (PARTITION BY vec_id) AS dot
  FROM ex
),
y AS (
  SELECT pos, CAST(SUM(v * dot) AS DOUBLE) AS y_component
  FROM dotted GROUP BY pos
),
nrm AS (SELECT sqrt(list_reduce(
          list_prepend(CAST(0 AS DOUBLE), list(y_component ORDER BY pos)),
          (a, b) -> a + b * b)) AS y_nrm
        FROM y)
SELECT pos, y_component, y_component / y_nrm AS y_unit
FROM y, nrm
""",
)
def embedding_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the top principal direction of the
    embedding Gram matrix: y = Aᵀ(A·v₀) with a fixed alternating-sign start
    vector — the distributed kernel inside PCA / spectral initialization
    (iterating + re-normalizing is driver-side composition, as with
    ``embedding_kmeans_step``).

    Never materializes the d×d Gram matrix: A·v₀ is a per-vector window sum
    over the exploded components (one ``vec_id`` shuffle), and Aᵀ·(A v₀) is
    a per-dimension aggregate (one ``pos`` shuffle over d=64 groups) — both
    sides are row-linear passes, so the step scales with nnz(A), not d².
    All products stay in quantized-integer space (components ≤ 1e6, so
    v·dot ≤ 6.4e13 per row — exact in int64; the cross-row sum rides
    exact decimal for unbounded n). Only the final component and its
    normalization are converted to double — one correctly-rounded
    conversion + identical IEEE sqrt/division per engine, so the result is
    bitwise reproducible. The norm is accumulated over the 64 per-dimension
    doubles in explicit ``pos`` order to pin the summation tree.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000000).cast("long")
        ).alias("qe"),
    )
    ex = q.select("vec_id", F.posexplode("qe").alias("pos0", "v")).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        "v",
        F.when((F.col("pos0") + 1) % 2 == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("v0"),
    )
    dotted = ex.select(
        "pos",
        "v",
        F.sum(F.col("v") * F.col("v0"))
        .over(Window.partitionBy("vec_id"))
        .alias("dot"),
    )
    y = dotted.groupBy("pos").agg(
        F.sum((F.col("v") * F.col("dot")).cast("decimal(38,0)"))
        .cast("double")
        .alias("y_component")
    )
    # 64 rows: fold the norm in pos order so both engines add identically
    nrm = (
        y.sort("pos")
        .agg(F.collect_list("y_component").alias("ys"))
        .select(
            F.sqrt(
                F.aggregate(
                    "ys", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ).alias("y_nrm")
        )
    )
    return y.crossJoin(F.broadcast(nrm)).select(
        "pos", "y_component", (F.col("y_component") / F.col("y_nrm")).alias("y_unit")
    )


@register(
    "embedding_int8_quantization",
    oracle="""
WITH scaled AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
  FROM embeddings
),
err AS (
  SELECT vec_id,
         list_max(list_transform(xs,
           x -> abs(x - CAST(round(x / scale * 127) AS BIGINT) * scale / 127)))
           AS max_abs_err
  FROM scaled WHERE scale > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
       max(max_abs_err) AS worst_err,
       CAST(SUM(CAST(max_abs_err AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*)
         AS mean_worst_err
FROM err
""",
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 (symmetric, per-vector max-abs scale) embedding quantization
    audit: quantize q = round(x/scale·127), dequantize, and report the
    per-vector worst reconstruction error and its corpus mean — the check
    run before shipping a vector index at ¼ the footprint.

    Row-local arithmetic end-to-end (the same IEEE expression tree in both
    engines: divide, round, integer-rescale, subtract, abs), one
    per-vector max, then a 1-row global aggregate whose mean rides an
    exact-decimal sum — the only cross-row float reduction is a max, which
    is order-insensitive. No shuffle until the final 1-row aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    xs = F.transform("embedding", lambda x: x.cast("double"))
    scaled = emb.select(
        "vec_id",
        F.array_max(F.transform(xs, F.abs)).alias("scale"),
        xs.alias("xs"),
    ).filter(F.col("scale") > 0)
    dequant_err = F.transform(
        "xs",
        lambda x: F.abs(
            x
            - F.round(x / F.col("scale") * 127).cast("bigint") * F.col("scale") / 127
        ),
    )
    err = scaled.select(
        "vec_id", F.array_max(dequant_err).alias("max_abs_err")
    )
    return err.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.max("max_abs_err").alias("worst_err"),
        (
            F.sum(F.col("max_abs_err").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_worst_err"),
    )


# ----------------------------------------------- Bloom decontamination

BLOOM_M = 1024  # bits
BLOOM_K = 4     # hash functions


@register(
    "bloom_decontamination_audit",
    oracle=f"""
WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
eval AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5('b' || CAST(k.k AS VARCHAR) || ':' || text),
                         1, 12))::BIGINT % {BLOOM_M} AS pos
  FROM train, (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS k) k
),
probes AS (
  SELECT e.doc_id, k.k,
         ('0x' || substr(md5('b' || CAST(k.k AS VARCHAR) || ':' || e.text),
                         1, 12))::BIGINT % {BLOOM_M} AS pos
  FROM eval e, (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS k) k
),
hits AS (
  SELECT p.doc_id,
         COUNT(*) FILTER (WHERE b.pos IS NOT NULL) AS set_bits
  FROM probes p LEFT JOIN bits b ON p.pos = b.pos
  GROUP BY p.doc_id
),
exact AS (
  SELECT e.doc_id, EXISTS (SELECT 1 FROM train t WHERE t.text = e.text)
           AS exact_hit
  FROM eval e
)
SELECT h.doc_id,
       h.set_bits = {BLOOM_K} AS bloom_hit,
       x.exact_hit,
       (h.set_bits = {BLOOM_K}) AND NOT x.exact_hit AS false_positive
FROM hits h JOIN exact x ON h.doc_id = x.doc_id
""",
)
def bloom_decontamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter train/eval decontamination screen with an exact audit
    — the constant-memory first pass of benchmark decontamination (the
    exact n-gram pass, ``contamination_ngram_overlap``, is the expensive
    second stage this filter gates).

    The filter is {BLOOM_M} bits with {BLOOM_K} portable md5 hashes; the
    bit-set is built as a DISTINCT of set positions (≤ {BLOOM_M} rows no
    matter the corpus — map-side combinable, broadcast back to the probe
    side), so at 100 TB the eval side never shuffles: it left-joins a
    broadcast bit table and a doc is flagged iff all {BLOOM_K} probes
    hit. Bloom semantics guarantee NO false negatives (every exact
    duplicate is flagged — the invariant tests pin), only false
    positives, which the exact-membership audit column quantifies so the
    FPR of this geometry is a measured number, not a formula.
    """
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id", "text")
    ks = F.array(*[F.lit(i) for i in range(BLOOM_K)])

    def pos(text_col):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("b"),
                        F.col("k").cast("string"),
                        F.lit(":"),
                        text_col,
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(BLOOM_M))

    bits = (
        train.select(F.explode(ks).alias("k"), "text")
        .select(pos(F.col("text")).alias("pos"))
        .distinct()
        .withColumn("is_set", F.lit(True))
    )
    probes = ev.select("doc_id", F.explode(ks).alias("k"), "text").select(
        "doc_id", pos(F.col("text")).alias("pos")
    )
    hits = (
        probes.join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.when(F.col("is_set"), F.lit(1))).alias("set_bits")
        )
    )
    exact = ev.join(
        train.select("text").distinct(), "text", "left_semi"
    ).select("doc_id", F.lit(True).alias("exact_hit"))
    return (
        hits.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("set_bits") == BLOOM_K).alias("bloom_hit"),
            F.coalesce("exact_hit", F.lit(False)).alias("exact_hit"),
            (
                (F.col("set_bits") == BLOOM_K)
                & ~F.coalesce("exact_hit", F.lit(False))
            ).alias("false_positive"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling score (hashed-unigram surrogate)
# ---------------------------------------------------------------------------

#: Per-token frequency micro-units. sc * DSIR_SCALE must fit in int64 —
#: ENFORCED at runtime in sample_dsir_weights (≈9.2M-token corpus bound);
#: drop to 1e9 for larger corpora and the bound scales to ~9.2B tokens.
DSIR_SCALE = 10**12
DSIR_TOPK = 100


@register(
    "sample_dsir_weights",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
scnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS sc FROM tok GROUP BY 1),
tcnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS tc FROM tok WHERE lang = 'en' GROUP BY 1),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s_total,
         CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS t_total
  FROM tok
),
freq AS (
  SELECT scnt.w, sc, COALESCE(tc, CAST(0 AS BIGINT)) AS tc
  FROM scnt LEFT JOIN tcnt USING (w)
),
scored AS (
  SELECT doc_id, lang,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM((tc * {DSIR_SCALE}) // t_total
                  - (sc * {DSIR_SCALE}) // s_total) AS BIGINT) AS dsir_score
  FROM tok JOIN freq USING (w) CROSS JOIN tot
  GROUP BY 1, 2
)
SELECT doc_id, lang, n_tokens, dsir_score
FROM scored
ORDER BY dsir_score DESC, doc_id
LIMIT {DSIR_TOPK}
""",
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169), integer-exact surrogate: rank every document by
    how much its unigrams look like the TARGET distribution (here
    ``lang = 'en'``) versus the full SOURCE corpus, and keep the top-k.
    DSIR proper sums log(p_target/p_source) per token; cross-engine
    bitwise parity rules out float log-sums (order-dependent), so the
    per-token score is the scaled-frequency difference
    ``(tc*S) div t_total - (sc*S) div s_total`` — exact BIGINTs in both
    engines (Spark DIV and DuckDB // agree on non-negative operands),
    monotone in the same direction as the log-ratio for the common case.

    Scale: two token-frequency aggregates (map-side combine), one
    token-keyed join back to the exploded corpus, one per-doc aggregate,
    then global top-k as TakeOrderedAndProject — no all-pairs work, no
    windows.  The totals frame is a broadcast 1-row crossJoin.  At 100 TB
    the frequency table is the only wide state and it is vocabulary-,
    not corpus-, sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"),
    )
    scnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("sc"))
    tcnt = (
        tok.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    tot = tok.agg(
        F.count(F.lit(1)).alias("s_total"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("t_total"),
    )
    # int64 guard: every per-token product is bounded by s_total *
    # DSIR_SCALE (sc ≤ s_total, tc ≤ t_total ≤ s_total). Spark wraps
    # silently on BIGINT overflow in non-ANSI mode while DuckDB errors,
    # so past the bound the bitwise-parity contract would break without
    # a sound — enforce it, don't comment it. One metadata-cheap job on
    # an aggregate the query needs anyway (the broadcast totals frame).
    s_total = (tot.first() or {"s_total": 0})["s_total"] or 0
    if s_total > (2**63 - 1) // DSIR_SCALE:
        raise ValueError(
            f"DSIR integer scale overflow: corpus has {s_total} tokens, "
            f"but sc * {DSIR_SCALE} must fit in int64 "
            f"(max {(2**63 - 1) // DSIR_SCALE} tokens); lower DSIR_SCALE"
        )
    freq = scnt.join(tcnt, "w", "left").select(
        "w", "sc", F.coalesce("tc", F.lit(0).cast("bigint")).alias("tc")
    )
    return (
        tok.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            (
                F.expr(f"(tc * {DSIR_SCALE}) DIV t_total")
                - F.expr(f"(sc * {DSIR_SCALE}) DIV s_total")
            ).alias("tok_score"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("tok_score").cast("bigint").alias("dsir_score"),
        )
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(DSIR_TOPK)
    )


# --------------------------------------------- training shard assignment

N_TRAIN_SHARDS = 16
SHARD_EPOCH_SALT = "epoch0"


@register(
    "training_shard_assignment",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         {{md5}} AS h
  FROM documents
),
assigned AS (
  SELECT doc_id, h,
         CAST(h % {N_TRAIN_SHARDS} AS BIGINT) AS shard
  FROM h
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM assigned
""".format(md5="('0x' || substr(md5('" + SHARD_EPOCH_SALT + ":' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"),
)
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE for training-data export: every
    document gets a (shard, position) from an epoch-salted portable
    hash — the standard way a 100 TB corpus becomes N reproducible,
    statistically-interchangeable training shards with a different
    document order per epoch (change the salt, get an independent
    permutation; no RNG state, any worker can recompute any
    assignment).

    Scale: one hash projection, then the BUCKETED distributed rank
    (``rankdist.with_global_ranks(group_by=["shard"])``) for the
    within-shard position — a plain ``Window.partitionBy(shard)`` would
    concentrate corpus/N rows into one task per shard (N is small by
    design), exactly the low-cardinality skew the rank machinery
    exists for. No global sort, no driver state; shard sizes
    concentrate tightly around corpus/N by the hash's uniformity. The
    60-bit md5-prefix hash keeps Spark and DuckDB bit-identical."""
    from deg04_local_data_lake_spark.functions.portable import md5_long
    from deg04_local_data_lake_spark.operators import rankdist

    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.col("doc_id").cast("string"), salt=SHARD_EPOCH_SALT)
    assigned = docs.select(
        "doc_id",
        h.alias("h"),
        F.pmod(h, F.lit(N_TRAIN_SHARDS)).cast("bigint").alias("shard"),
    )
    ranked = rankdist.with_global_ranks(
        assigned, ["h", "doc_id"], group_by=["shard"]
    )
    return ranked.select(
        "doc_id",
        "shard",
        F.col("_rsel_rank").cast("bigint").alias("pos"),
    )


# --------------------------------------------- end-to-end curation pipeline


def _curation_sql() -> str:
    """DuckDB twin of ``corpus_curation_full`` — one CTE chain mirroring
    each gate over the previous gate's survivors."""
    from deg04_local_data_lake_spark.functions.portable import md5_long_sql
    from deg04_local_data_lake_spark.operators import dedup, text

    stop = ",".join(f"'{w}'" for w in text.STOPWORDS["en"])
    bands_body = dedup._BANDS_SQL.strip()
    assert bands_body.startswith("WITH ")
    bands_body = bands_body[len("WITH "):]  # splice into the outer WITH
    h_sql = md5_long_sql("CAST(doc_id AS VARCHAR)", salt=SHARD_EPOCH_SALT)
    return f"""
WITH {bands_body},
w0 AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
gb AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(words, x -> length(x)))
              AS BIGINT) AS n_word_chars,
         CAST(len(list_filter(words, x -> list_contains([{stop}], x)))
              AS BIGINT) AS stopword_hits
  FROM w0
),
g2 AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] AS g
  FROM w0, LATERAL (SELECT unnest(generate_series(1, len(words) - 1)) AS i) u
),
g2c AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
g2m AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top2, CAST(SUM(c) AS BIGINT) AS n2
  FROM g2c GROUP BY 1
),
g3 AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS g
  FROM w0, LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) u
),
g3c AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
g3m AS (
  SELECT doc_id,
         CAST(SUM(c) FILTER (WHERE c > 1) AS BIGINT) AS dup3,
         CAST(SUM(c) AS BIGINT) AS n3
  FROM g3c GROUP BY 1
),
keep1 AS (
  SELECT gb.doc_id
  FROM gb JOIN g2m USING (doc_id) JOIN g3m USING (doc_id)
  WHERE (n_words BETWEEN {text.GOPHER_MIN_WORDS} AND {text.GOPHER_MAX_WORDS})
    AND n_word_chars / n_words BETWEEN {text.GOPHER_MIN_MEAN_WORD_LEN}
                                   AND {text.GOPHER_MAX_MEAN_WORD_LEN}
    AND stopword_hits >= {text.GOPHER_MIN_STOPWORD_HITS}
    AND top2 / n2 <= {text.GOPHER_MAX_TOP2GRAM_FRAC}
    AND COALESCE(dup3, CAST(0 AS BIGINT)) / n3
          <= {text.GOPHER_MAX_DUP3GRAM_FRAC}
),
w2 AS (SELECT * FROM w0 WHERE doc_id IN (SELECT doc_id FROM keep1)),
win AS (
  SELECT doc_id,
         list_aggregate(words[i:i+{dedup.SUBSTR_W - 1}], 'string_agg', ' ') AS s
  FROM w2, LATERAL (
    SELECT unnest(generate_series(1, len(words) - {dedup.SUBSTR_W - 1})) AS i) u
  WHERE len(words) >= {dedup.SUBSTR_W}
),
freq AS (
  SELECT s, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM win GROUP BY 1
),
keep2 AS (
  SELECT win.doc_id
  FROM win JOIN freq USING (s)
  GROUP BY 1
  HAVING COUNT(*) FILTER (WHERE n_docs >= {dedup.SUBSTR_MIN_DOCS})
           / COUNT(*) <= {dedup.SUBSTR_MAX_DUP_FRAC}
),
mh_drop AS (
  SELECT DISTINCT b.doc_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  WHERE a.doc_id IN (SELECT doc_id FROM keep2)
    AND b.doc_id IN (SELECT doc_id FROM keep2)
),
keep3 AS (
  SELECT doc_id FROM keep2
  WHERE doc_id NOT IN (SELECT doc_id FROM mh_drop)
),
q AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000)
                                  AS BIGINT)) AS qe
  FROM embeddings
  WHERE vec_id IN (SELECT doc_id FROM keep3)
),
ex AS (SELECT vec_id, label, i AS pos, qe[i] AS v
       FROM q, LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u),
cent AS (
  SELECT label, pos, CAST(SUM(v) AS BIGINT) AS c FROM ex GROUP BY 1, 2
),
cnorm AS (
  SELECT label, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS c_nrm FROM cent GROUP BY 1
),
vdot AS (
  SELECT ex.vec_id, CAST(SUM(ex.v * cent.c) AS BIGINT) AS dotc
  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
  GROUP BY 1
),
cs AS (
  SELECT q.vec_id, q.label, q.qe,
         sqrt(CAST(list_dot_product(q.qe, q.qe) AS DOUBLE)) AS v_nrm,
         CAST(vdot.dotc AS DOUBLE)
           / (sqrt(CAST(list_dot_product(q.qe, q.qe) AS DOUBLE))
              * cnorm.c_nrm) AS csim
  FROM q JOIN vdot USING (vec_id) JOIN cnorm ON q.label = cnorm.label
),
sp AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, a.csim AS ca, b.csim AS cb
  FROM cs a JOIN cs b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE CAST(list_dot_product(a.qe, b.qe) AS DOUBLE) / (a.v_nrm * b.v_nrm)
        >= {dedup.SEM_TAU}
),
sdrop AS (
  SELECT DISTINCT CASE WHEN ca < cb THEN vb
                       WHEN cb < ca THEN va
                       ELSE vb END AS vec_id
  FROM sp
),
keep4 AS (
  SELECT doc_id FROM keep3
  WHERE doc_id NOT IN (SELECT vec_id FROM sdrop)
),
assigned AS (
  SELECT doc_id, {h_sql} AS h,
         CAST({h_sql} % {N_TRAIN_SHARDS} AS BIGINT) AS shard
  FROM keep4
),
seeded AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com now'
           WHEN 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR),
                       3, '0') || '-0199 today'
           ELSE ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 host'
         END AS text
  FROM documents
),
scrub AS (
  SELECT doc_id,
         md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{text.PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{text.PII_PHONE_RE}', '<PHONE>', 'g'),
               '{text.PII_IPV4_RE}', '<IP>', 'g')) AS scrubbed_md5
  FROM seeded
)
SELECT a.doc_id, a.shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY a.shard ORDER BY a.h, a.doc_id)
            AS BIGINT) AS pos,
       scrub.scrubbed_md5
FROM assigned a JOIN scrub USING (doc_id)
"""


@register("corpus_curation_full", oracle=_curation_sql())
def corpus_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data curation stack as ONE lazy plan (VERDICT
    r7 #7): Gopher quality rules → exact-substring gate → MinHash LSH
    dedup → SemDeDup → epoch-salted shard assignment, with the PII
    scrub's redacted-text md5 carried on every surviving document. Each
    gate runs over the PREVIOUS gate's survivors — the corpus-dependent
    gates (window frequencies, cluster centroids) genuinely change
    under composition, which is what the single-gate queries cannot
    attest. No materialization between stages: one DataFrame chain,
    Catalyst fuses the per-doc projections and reuses the doc_id
    exchanges.

    Dedup rule: a doc is dropped when an LSH candidate pair links it to
    ANY lower doc_id among substring-gate survivors (keep-lowest,
    non-iterative — the one-pass rule, not connected components, so the
    DuckDB twin is closed-form). MinHash signatures are per-doc and
    corpus-independent, so pairs-over-survivors equals pairs-over-all
    filtered to survivor endpoints — the oracle exploits that; the
    Spark side's mega-bucket/mega-cluster caps coincide with the
    uncapped oracle below the cap thresholds exactly as in
    ``dedup_minhash_pairs`` / ``dedup_semdedup``.

    Scale: the union of the parts — every shuffle is keyed on doc_id,
    a window hash, a band key, or (label, salt); survivor filters are
    semi-joins on doc_id; the shard rank is the bucketed distributed
    rank, not a per-shard window. The four survivor-id frames are
    LAZILY localCheckpointed (doc_id-only rows, computed by the same
    driving action): Catalyst has no cross-reference common-
    subexpression reuse, so without the barriers every downstream
    reference re-plans the entire upstream gate stack — measured 797
    shuffle exchanges in the naive fully-inlined plan. With them, each
    gate's subplan is planned and executed exactly once (their shuffle
    counts are the single-gate queries' own PLANS.md rows) and the
    final frame's plan is just the post-dedup tail (5 exchanges). At
    100 TB that plan duplication is the difference between one corpus
    pass per gate and exponential recomputation — the checkpoint-
    between-stages shape every production curation DAG runs."""
    from deg04_local_data_lake_spark.functions.portable import md5_long
    from deg04_local_data_lake_spark.operators import rankdist
    from deg04_local_data_lake_spark.operators.dedup import (
        exact_substring_metrics,
        minhash_candidate_pairs,
        minhash_signatures,
        semdedup_dropped,
        shingle_rows,
    )
    from deg04_local_data_lake_spark.operators.text import (
        gopher_metrics,
        pii_scrub_column,
        pii_seeded,
    )

    docs = load_table(spark, sf_dir, "documents")
    keep1 = (
        gopher_metrics(docs)
        .filter("keep")
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    s1 = docs.join(keep1, "doc_id")
    keep2 = (
        exact_substring_metrics(s1)
        .filter("keep")
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    s2 = docs.join(keep2, "doc_id")
    pairs = minhash_candidate_pairs(minhash_signatures(shingle_rows(s2)))
    keep3 = (
        s2.select("doc_id")
        .join(
            pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        .localCheckpoint(eager=False)
    )
    emb = load_table(spark, sf_dir, "embeddings").join(
        keep3.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    s4 = keep3.join(
        semdedup_dropped(emb).select(F.col("vec_id").alias("doc_id")),
        "doc_id",
        "left_anti",
    ).localCheckpoint(eager=False)
    h = md5_long(F.col("doc_id").cast("string"), salt=SHARD_EPOCH_SALT)
    assigned = s4.select(
        "doc_id",
        h.alias("h"),
        F.pmod(h, F.lit(N_TRAIN_SHARDS)).cast("bigint").alias("shard"),
    )
    ranked = rankdist.with_global_ranks(
        assigned, ["h", "doc_id"], group_by=["shard"]
    )
    scrub = pii_seeded(docs).select(
        "doc_id", F.md5(pii_scrub_column(F.col("text"))).alias("scrubbed_md5")
    )
    return ranked.join(scrub, "doc_id").select(
        "doc_id",
        "shard",
        F.col("_rsel_rank").cast("bigint").alias("pos"),
        "scrubbed_md5",
    )


# ---------------------------------------------------------------------------
# Lloyd's k-means iterated to three full reassignment rounds
# ---------------------------------------------------------------------------

_KMEANS_ITERS = 3


def _kmeans_iter_oracle(iters: int) -> str:
    """Chained-CTE DuckDB twin of ``embedding_kmeans_iterated``: a0 is the
    label column, then (cent → cnorm → dots → a) once per Lloyd round —
    the same exact-integer update rule the Spark loop applies."""
    ctes = [
        f"q AS ({_QUANT_SQL})",
        """ex AS (SELECT vec_id, i AS pos, qe[i] AS v
       FROM q, LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i) u)""",
        "a0 AS (SELECT vec_id, label AS lbl FROM q)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""cent{t} AS (
  SELECT a.lbl AS c_label, ex.pos, CAST(SUM(ex.v) AS BIGINT) AS c
  FROM ex JOIN a{t - 1} a USING (vec_id) GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""cnorm{t} AS (
  SELECT c_label, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS c_nrm
  FROM cent{t} GROUP BY 1
)"""
        )
        ctes.append(
            f"""dots{t} AS (
  SELECT ex.vec_id, c.c_label, SUM(ex.v * c.c) AS dot
  FROM ex JOIN cent{t} c USING (pos) GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""a{t} AS (
  SELECT vec_id, c_label AS lbl FROM (
    SELECT d.vec_id, d.c_label,
           row_number() OVER (PARTITION BY d.vec_id
                              ORDER BY CAST(d.dot AS DOUBLE) / n.c_nrm DESC,
                                       d.c_label) AS rn
    FROM dots{t} d JOIN cnorm{t} n USING (c_label)
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT q.label AS init_label, a{iters}.lbl AS final_label,
       COUNT(*) AS n_vecs
FROM a{iters} JOIN q USING (vec_id)
GROUP BY 1, 2
"""
    )


@register(
    "embedding_kmeans_iterated", oracle=_kmeans_iter_oracle(_KMEANS_ITERS)
)
def embedding_kmeans_iterated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three full Lloyd rounds over the embedding table — the clustering
    counterpart of ``pagerank_iterated``, locking that the k-means UPDATE
    RULE composes across iterations (``embedding_kmeans_step`` attests a
    single application).

    The iteration stays EXACT the whole way, which is what makes a
    distributed k-means hash-comparable at all:

    - cosine assignment is scale-invariant, so the centroid can be the
      per-cluster component SUM (never divided by the member count) —
      an exact BIGINT at every round, no float centroid drift;
    - the only doubles are each round's ranking key dot/‖c‖ — single
      operations on exact integers, bitwise identical in both engines —
      with ties broken on the cluster id;
    - dot products and norms fold through decimal(38,0) (the SemDeDup
      convention, operators/dedup.py) so member counts in the billions
      can't overflow the int64 partial sums.

    Plan per round: centroids are k×dim rows (broadcast); the dot
    aggregate is the round's one real shuffle, keyed (vec_id, cell); the
    exploded component table is built once, persisted, and re-joined by
    all three rounds — persist-the-data / re-shuffle-the-assignment,
    the same split ``pagerank_iterated`` uses for its edge list."""
    from deg04_local_data_lake_spark.caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000000).cast("long")
        ).alias("qe"),
    )
    ex = (
        q.select("vec_id", F.posexplode("qe").alias("pos0", "v"))
        .select("vec_id", (F.col("pos0") + 1).alias("pos"), "v")
    )
    # consumed 2x per round (centroid build + dot fanout) x 3 rounds
    ex = persist_tracked(ex)
    assign = q.select("vec_id", F.col("label").alias("lbl"))
    dec38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    # per-round centroid norm attached IN the centroid frame by a window
    # (the round-11 single-consumer move, see similarity_ivf_topk /
    # semdedup_dropped): cnorm's separate aggregate + broadcast join per
    # round collapse away, and c_nrm rides the dot aggregate's group key
    # (constant within a cluster label)
    wl = Window.partitionBy("c_label")
    for _ in range(_KMEANS_ITERS):
        cent = (
            ex.join(assign, "vec_id")
            .groupBy(F.col("lbl").alias("c_label"), "pos")
            .agg(F.sum("v").cast("bigint").alias("c"))
            .withColumn(
                "c_nrm",
                F.sqrt(F.sum(dec38("c") * dec38("c")).over(wl).cast("double")),
            )
        )
        dots = (
            ex.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "c_label", "c_nrm")
            .agg(F.sum(dec38("v") * dec38("c")).alias("dot"))
        )
        assign = (
            dots.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy(
                        (F.col("dot").cast("double") / F.col("c_nrm")).desc(),
                        F.col("c_label"),
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("c_label").alias("lbl"))
        )
    return (
        assign.join(q.select("vec_id", "label"), "vec_id")
        .groupBy(
            F.col("label").alias("init_label"),
            F.col("lbl").alias("final_label"),
        )
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


@register(
    "lm_trigram_familiarity",
    oracle="""
WITH docs AS (SELECT doc_id, text FROM documents WHERE length(text) >= 3),
tris AS (
  SELECT doc_id, substr(text, i, 3) AS tri, substr(text, i, 2) AS bi
  FROM docs,
       LATERAL (SELECT unnest(generate_series(1, length(text) - 2)) AS i) u
),
tc AS (SELECT tri, COUNT(*) AS tc FROM tris GROUP BY 1),
bc AS (SELECT bi, COUNT(*) AS bc FROM tris GROUP BY 1),
v AS (
  SELECT COUNT(DISTINCT substr(text, i, 1)) AS v
  FROM docs,
       LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) u
),
scored AS (
  SELECT t.doc_id,
         (1000000000000 * (tc.tc + 1)) // (bc.bc + v.v) AS q
  FROM tris t JOIN tc USING (tri) JOIN bc USING (bi) CROSS JOIN v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(SUM(q) AS BIGINT) AS fam_q,
       CAST(SUM(q) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e12)
         AS familiarity
FROM scored GROUP BY doc_id
""",
)
def lm_trigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-model scoring — the perplexity-filter
    stage of CCNet/Gopher-style curation (score each document by how
    well an n-gram LM trained ON THE CORPUS predicts it; outliers are
    boilerplate, wrong-language, or garbled text), reformulated log-free
    so the distributed fold is bitwise deterministic:

    - the LM is add-one-smoothed P(c3|c1c2) = (tc+1)/(bc+V), all exact
      integer counts (tc = trigram count, bc = trigram-CONTEXT count —
      the same explode feeds both — V = corpus character vocabulary);
    - a log-probability sum would make the result depend on float
      addition ORDER (and on each engine's libm: log is not required to
      be correctly rounded, unlike +,*,/,sqrt) — so each trigram's
      probability is quantized to ``(1e12·(tc+1)) div (bc+V)`` (exact
      integer division) and the per-doc fold is an exact BIGINT SUM;
    - ``familiarity`` = the average smoothed trigram probability — one
      identically-shaped double expression over exact integers at the
      very end. Low familiarity plays the same filtering role as high
      perplexity (both rank by how unexpected the doc's trigrams are),
      without a transcendental anywhere.

    Plan: one explode feeds the tc/bc aggregates and the scoring join;
    both count tables are CHARSET-bounded (≤ |Σ|³ rows however large
    the corpus) so they broadcast, V rides a 1-row broadcast, and the
    only data-scale shuffle is the per-doc SUM — the same
    train-broadcast/score-local split a real KenLM-scoring stage uses
    at 100 TB."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 3)
        .select("doc_id", "text")
    )
    tris = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> struct(substring(text, i, 3) AS tri,"
                "             substring(text, i, 2) AS bi))"
            )
        ).alias("t"),
    ).select("doc_id", "t.tri", "t.bi")
    from deg04_local_data_lake_spark.caching import persist_tracked

    tris = persist_tracked(tris)  # feeds tc, bc, and the scoring join
    tc = tris.groupBy("tri").agg(F.count(F.lit(1)).alias("tc"))
    bc = tris.groupBy("bi").agg(F.count(F.lit(1)).alias("bc"))
    v = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)), i -> substring(text, i, 1))"
            )
        ).alias("c")
    ).agg(F.countDistinct("c").alias("v"))
    scored = (
        tris.join(F.broadcast(tc), "tri")
        .join(F.broadcast(bc), "bi")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.expr("(1000000000000 * (tc + 1)) div (bc + v)").alias("q"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        F.sum("q").cast("bigint").alias("fam_q"),
        (
            F.sum("q").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e12))
        ).alias("familiarity"),
    )
