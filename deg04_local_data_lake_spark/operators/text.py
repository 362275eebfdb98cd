"""Text-analysis operators for LLM training-data pipelines
(north star, BASELINE.json; not present in the reference — SURVEY.md §7 P3).

Language-ID (stopword n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting over the
``documents`` table.

All four are *pure per-row expression pipelines* — no shuffle, no UDFs, no
Python: at 100 TB they run at parquet scan speed inside whole-stage codegen,
and the only cost is the regex engine. Ratios are computed as int/int
divisions (exact inputs → identical IEEE doubles in the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

STOPWORDS = {
    "en": ["the", "a", "is", "of", "and", "to", "in", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "des", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "los", "de", "que", "y", "en", "un", "una", "por", "con"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
# Kept to syntax with identical semantics in Java regex and RE2.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def words_col(text: Column) -> Column:
    """Whitespace tokens, empties dropped (Spark split keeps trailing
    empties with limit -1; DuckDB string_split keeps them too — filtering
    makes both agree)."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def _stop_hits(words: Column, lang: str) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(stop, w)))


def _words_sql(expr: str = "text") -> str:
    return f"list_filter(string_split({expr}, ' '), w -> w <> '')"


def _stop_hits_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(w, x -> list_contains([{lst}], x)))"


@register(
    "text_quality",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, text, {_words_sql()} AS w,
         length(replace(text, ' ', '')) AS n_alpha
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         len(w) AS n_words,
         len(list_distinct(w)) AS n_uniq,
         n_alpha,
         {_stop_hits_sql("en")} AS stop_hits
  FROM t
)
SELECT doc_id, lang, n_words, n_uniq,
       n_alpha / n_words AS avg_word_len,
       n_uniq / n_words AS uniq_ratio,
       stop_hits / n_words AS stop_ratio,
       0.4 * least(1.0, n_words / 50.0)
         + 0.3 * (n_uniq / n_words)
         + 0.3 * (1 - stop_hits / n_words) AS quality_score
FROM m
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length saturation, lexical diversity,
    stopword density — the standard pre-training filter trio."""
    return quality_metrics(load_table(spark, sf_dir, "documents"))


def quality_metrics(docs: DataFrame) -> DataFrame:
    """Quality-score projections for an arbitrary ``(doc_id, lang,
    text)`` frame — stateless per-row expressions, so the same core
    serves the batch query and the streaming ingest gate
    (``stream_text_quality``)."""
    w = words_col(F.col("text"))
    m = docs.select(
        "doc_id",
        "lang",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_uniq"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_alpha"),
        _stop_hits(w, "en").alias("stop_hits"),
    )
    n_words = F.col("n_words")
    return m.select(
        "doc_id",
        "lang",
        "n_words",
        "n_uniq",
        (F.col("n_alpha") / n_words).alias("avg_word_len"),
        (F.col("n_uniq") / n_words).alias("uniq_ratio"),
        (F.col("stop_hits") / n_words).alias("stop_ratio"),
        (
            0.4 * F.least(F.lit(1.0), n_words / 50.0)
            + 0.3 * (F.col("n_uniq") / n_words)
            + 0.3 * (1 - F.col("stop_hits") / n_words)
        ).alias("quality_score"),
    )


@register(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       len({_words_sql()}) AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens,
       len(regexp_extract_all(text, '{BPE_RE}'))
         / len({_words_sql()}) AS tokens_per_word
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    pre-tokenization (letter runs / digit runs / punctuation) — the cheap
    proxy for LLM token budgeting."""
    docs = load_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        F.size(w).alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (bpe / F.size(w)).alias("tokens_per_word"),
    )


@register(
    "text_langid",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, {_words_sql()} AS w FROM documents),
s AS (
  SELECT doc_id, lang,
         {_stop_hits_sql("en")} AS s_en,
         {_stop_hits_sql("de")} AS s_de,
         {_stop_hits_sql("fr")} AS s_fr,
         {_stop_hits_sql("es")} AS s_es
  FROM t
)
SELECT doc_id, lang AS labeled_lang, s_en, s_de, s_fr, s_es,
       CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
            WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS predicted_lang
FROM s
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID with a fixed argmax tiebreak order
    (en > de > fr > es) so prediction is total and deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    s = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[_stop_hits(w, lg).alias(f"s_{lg}") for lg in ("en", "de", "fr", "es")],
    )
    return s.select(
        "*",
        F.when(
            F.col("s_en") >= F.greatest("s_de", "s_fr", "s_es"), F.lit("en")
        )
        .when(F.col("s_de") >= F.greatest("s_fr", "s_es"), F.lit("de"))
        .when(F.col("s_fr") >= F.col("s_es"), F.lit("fr"))
        .otherwise(F.lit("es"))
        .alias("predicted_lang"),
    )


@register(
    "text_repetition",
    oracle="""
WITH sh AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) u
),
counts AS (SELECT doc_id, s, COUNT(*) AS c FROM sh GROUP BY doc_id, s)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_shingles,
       CAST(max(c) AS BIGINT) AS max_repeat,
       max(c) / SUM(c) AS repetition_ratio
FROM counts GROUP BY doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/repetition filter: the most frequent 3-gram's share of
    all 3-grams per document — high values flag templated or looping text
    (a standard pre-training quality gate alongside ``text_quality``).
    Two aggregations over the same doc_id partitioning — one exchange."""
    from deg04_local_data_lake_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    counts = shingle_rows(docs).groupBy("doc_id", "s").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_shingles"),
        F.max("c").cast("bigint").alias("max_repeat"),
        (F.max("c") / F.sum("c")).alias("repetition_ratio"),
    )


ROLL_P = 9007199254740881  # largest prime < 2^53: acc*31 stays in int64


@register(
    "text_rolling_hash",
    oracle=f"""
SELECT doc_id,
       list_reduce(
         list_transform(string_split(lower(trim(text)), ''), x -> ascii(x)::BIGINT),
         (acc, c) -> (acc * 31 + c) % {ROLL_P}) AS rolling_hash,
       length(text) AS n_chars
FROM documents
""",
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash (h = h·31 + c mod p) over the normalized
    text — the incremental-update fingerprint family (Rabin-Karp style)
    used for chunk-level dedup, computed as a higher-order fold in both
    engines with identical int64 arithmetic (p < 2^53 keeps acc·31 exact).
    """
    docs = load_table(spark, sf_dir, "documents")
    chars = F.split(F.lower(F.trim(F.col("text"))), "")
    roll = F.aggregate(
        F.transform(chars, lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % ROLL_P,
    )
    return docs.select(
        "doc_id", roll.alias("rolling_hash"), F.length("text").alias("n_chars")
    )


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
       length(text) AS n_chars,
       (length(text) // 100) * 100 AS length_bucket
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization fingerprint (whitespace-collapse → lower → md5) — the
    first-line exact-dedup key for near-identical formatting variants."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length("text").alias("n_chars"),
        # integer division on both sides — a double-division + int cast
        # would round in DuckDB but truncate in Spark
        F.expr("(length(text) DIV 100) * 100").alias("length_bucket"),
    )


@register(
    "tfidf_top_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         (CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
           / CAST(df.df AS DOUBLE) AS score
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tf, df, score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM scored)
WHERE rn <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document by tf-idf with a RATIONAL
    idf (``tf · N/df``): the textbook ``ln(N/df)`` is a libm call whose
    last ulp differs across engines, which would break bitwise parity and
    can even flip near-tie rankings — the rational form is two IEEE ops in
    a fixed association over exact integers, bitwise identical everywhere,
    and induces the same ranking as log-idf within a document whenever df
    differs (both are strictly decreasing in df; ties broken by term).

    Plan at 100 TB: tf is one (doc,term) shuffle; df is one term-keyed
    aggregate REUSED from tf's output (aggregate of an aggregate — never
    re-scan the corpus); the df join is vocabulary-sized (usually
    broadcastable after the Zipf head, and head terms have high df → low
    score anyway, so a frequency-capped broadcast dictionary is the skew
    fix); the final top-k is a per-doc window over ≤|terms-per-doc| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(df, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        "df",
        (
            (F.col("tf").cast("double") * F.col("n_docs").cast("double"))
            / F.col("df").cast("double")
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


@register(
    "inverted_index_postings",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS token
  FROM documents
),
agg AS (
  SELECT token,
         list_sort(list(DISTINCT doc_id)) AS postings,
         CAST(count(*) AS BIGINT) AS tf_total
  FROM toks GROUP BY 1
)
SELECT token,
       CAST(len(postings) AS BIGINT) AS df,
       tf_total,
       array_to_string(postings[1:8], ',') AS postings_head
FROM agg WHERE len(postings) >= 25
""",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → document frequency, total term
    frequency, and the head of the sorted posting list — the core batch
    job behind corpus search / contamination lookup / tf-idf serving.

    Bounded-memory build: tokens explode into (token, doc) postings that
    aggregate to per-posting term frequencies — never into one giant
    per-token array (a stopword's full posting list collected into a
    single row is the classic 100 TB OOM). df/tf come from a plain
    re-aggregate of those postings; the fixed-size head is rank-selected
    (row_number ≤ 8) BEFORE any collect, so no operator ever holds more
    than 8 doc ids per token. The posting aggregate, the stats aggregate,
    the head window, and the final join all hash on ``token``, so Spark
    reuses one exchange layout throughout. At full scale the complete
    posting table would be *written* bucketed-by-token rather than
    returned; the statistics here are exact either way. The df ≥ 25 floor
    keeps the long tail out of the result without changing the statistics.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("token")
    )
    postings = toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = postings.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("tf_total"),
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    # The head is emitted as a comma-joined string, not array<bigint>:
    # integer-to-string rendering is identical cross-engine, and scalar
    # columns keep the output canonicalizable by pandas-based harnesses
    # (raw array columns crash their sort_values hash path).
    head = (
        postings.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head")
        )
    )
    return (
        stats.filter(F.col("df") >= 25)
        .join(head, "token")
        .select("token", "df", "tf_total", "postings_head")
    )


@register(
    "text_normalize_clean",
    oracle="""
WITH cleaned AS (
  SELECT doc_id, n_chars,
         trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           '  +', ' ', 'g')) AS clean
  FROM documents
)
SELECT doc_id,
       CAST(len(clean) AS BIGINT) AS clean_chars,
       CAST(n_chars - len(clean) AS BIGINT) AS removed_chars,
       CAST(len(clean) AS DOUBLE) / n_chars AS kept_ratio
FROM cleaned WHERE n_chars > 0
""",
)
def text_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (the boilerplate-strip step of every pretraining
    pipeline): case-fold, drop non-alphanumerics, collapse whitespace
    runs, trim — reporting kept/removed character counts and the keep
    ratio (a cheap garbage detector: low keep ratio ⇒ markup/binary
    junk). Pure per-row regex codegen — scan-speed, zero shuffle; the
    regex subset used ('[^a-z0-9 ]', '  +') behaves identically in Java
    regex and RE2."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            "  +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length(clean).cast("bigint").alias("clean_chars"),
        (F.col("n_chars") - F.length(clean)).cast("bigint").alias("removed_chars"),
        (F.length(clean).cast("double") / F.col("n_chars")).alias("kept_ratio"),
    )


@register(
    "langid_confusion",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, {_words_sql()} AS w FROM documents),
s AS (
  SELECT doc_id, lang,
         {_stop_hits_sql("en")} AS s_en,
         {_stop_hits_sql("de")} AS s_de,
         {_stop_hits_sql("fr")} AS s_fr,
         {_stop_hits_sql("es")} AS s_es
  FROM t
),
pred AS (
  SELECT lang AS labeled_lang,
         CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
              WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END AS predicted_lang
  FROM s
),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM pred)
SELECT labeled_lang, predicted_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS DOUBLE) / n_total AS cell_share
FROM pred, total
GROUP BY 1, 2, n_total
""",
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the heuristic language classifier
    (``text_langid``): labeled × predicted counts with corpus shares —
    the classifier-evaluation pattern every model-in-the-pipeline needs
    (per-class precision/recall derive directly from these cells).

    The prediction is the same deterministic stopword argmax; the matrix
    is a ≤16-cell aggregate that collapses map-side; the total rides a
    window-free 1-row broadcast. At 100 TB evaluation cost equals one
    classifier pass — the matrix itself is constant-size."""
    docs = load_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    s = docs.select(
        F.col("lang").alias("labeled_lang"),
        *[_stop_hits(w, lg).alias(f"s_{lg}") for lg in ("en", "de", "fr", "es")],
    )
    pred = s.select(
        "labeled_lang",
        F.when(F.col("s_en") >= F.greatest("s_de", "s_fr", "s_es"), F.lit("en"))
        .when(F.col("s_de") >= F.greatest("s_fr", "s_es"), F.lit("de"))
        .when(F.col("s_fr") >= F.col("s_es"), F.lit("fr"))
        .otherwise(F.lit("es"))
        .alias("predicted_lang"),
    )
    total = pred.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        pred.crossJoin(F.broadcast(total))
        .groupBy("labeled_lang", "predicted_lang", "n_total")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(
            "labeled_lang",
            "predicted_lang",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("n_total")).alias("cell_share"),
        )
    )


# ------------------------------------------------- character diversity

#: a-z plus space — the full character inventory of the synthetic corpus;
#: anything outside it (real-corpus punctuation, digits, unicode) falls
#: into the residual bucket, which participates in the index like any
#: other symbol.
_DIVERSITY_ALPHABET = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" "]


def _char_counts(text: Column) -> list[Column]:
    """Per-character occurrence counts via the length-difference trick —
    one string traversal per alphabet symbol, zero explode, zero shuffle."""
    # bigint from the start: the squares below overflow 32-bit int for
    # documents past ~46k chars (DuckDB's length is already BIGINT)
    return [
        (F.length(text) - F.length(F.replace(text, F.lit(c), F.lit("")))).cast(
            "bigint"
        )
        for c in _DIVERSITY_ALPHABET
    ]


def _char_counts_sql(expr: str = "text") -> list[str]:
    return [
        f"length({expr}) - length(replace({expr}, '{c}', ''))"
        for c in _DIVERSITY_ALPHABET
    ]


def char_diversity_col(text: Column) -> Column:
    """Simpson character diversity ``1 - Σ pᵢ²`` of ``text`` as a pure
    column expression: exact-integer ``Σcᵢ²`` / ``len²`` with a single
    double division at the end (see ``text_char_diversity``). Requires
    non-empty input (empty text divides by zero)."""
    counts = _char_counts(text)
    alpha_sq = counts[0] * counts[0]
    for c in counts[1:]:
        alpha_sq = alpha_sq + c * c
    alpha_total = counts[0]
    for c in counts[1:]:
        alpha_total = alpha_total + c
    other = F.length(text).cast("bigint") - alpha_total
    length = F.length(text).cast("bigint")
    return F.lit(1).cast("double") - (
        (alpha_sq + other * other).cast("double")
        / (length * length).cast("double")
    )


@register(
    "text_char_diversity",
    oracle=f"""
WITH c AS (
  SELECT source,
         length(text) AS len,
         {" + ".join(f"({e}) * ({e})" for e in _char_counts_sql())}
           AS alpha_sq,
         length(text) - ({" + ".join(_char_counts_sql())}) AS other
  FROM documents
  WHERE length(text) > 0
),
d AS (
  SELECT source,
         CAST(1 AS DOUBLE)
           - CAST(alpha_sq + other * other AS DOUBLE)
             / CAST(len * len AS DOUBLE) AS diversity
  FROM c
)
SELECT source,
       CAST(floor(diversity * 20) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(diversity) AS min_diversity,
       max(diversity) AS max_diversity
FROM d GROUP BY 1, 2
""",
)
def text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source histogram of character-level Simpson diversity
    ``1 - Σ pᵢ²`` — the logarithm-free cousin of character entropy used to
    screen boilerplate (low diversity: repeated separators, padding, DOM
    artifacts) and binary-junk pages (diversity pinned at the alphabet
    ceiling) before expensive downstream curation.

    Numerics: counts come from the length-difference trick (one
    ``replace`` per alphabet symbol — 27 map-side string traversals, no
    explode, no tokenize); the index is exact-integer ``Σcᵢ²`` and ``len²``
    with ONE double division and subtraction at the end, so Spark and the
    DuckDB oracle agree bitwise — unlike entropy, whose ``log`` differs in
    the last ulp across libm implementations. Simpson and Shannon induce
    near-identical orderings for screening purposes.

    Plan at 100 TB: the per-document score is pure whole-stage-codegen
    expression work at parquet scan speed; the only shuffle is the final
    (source, bin) aggregate — ≤ 20·|sources| rows. min/max per bin are
    order-independent, so no float-sum portability hazard.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    d = docs.select("source", char_diversity_col(F.col("text")).alias("diversity"))
    return (
        d.groupBy(
            "source",
            F.floor(F.col("diversity") * 20).cast("int").alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("diversity").alias("min_diversity"),
            F.max("diversity").alias("max_diversity"),
        )
        .select("source", "bin", "n_docs", "min_diversity", "max_diversity")
    )


# --------------------------------------------------------------- BM25

BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "bm25_top_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
t AS (SELECT CAST(sum(tf) AS BIGINT) AS total_dl FROM tf),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ((CAST(n.n_docs - df.df AS DOUBLE) + 0.5)
            / (CAST(df.df AS DOUBLE) + 0.5))
         * ((CAST(tf.tf AS DOUBLE) * 2.2)
            / (CAST(tf.tf AS DOUBLE) + 0.3
               + 0.9 * ((CAST(dl.dl AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
                        / CAST(t.total_dl AS DOUBLE)))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), n, t
)
SELECT doc_id, term, tf, df, score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM scored)
WHERE rn <= 3
""",
)
def bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by BM25 (k1=1.2, b=0.75) with a RATIONAL
    idf — the retrieval-grade upgrade of ``tfidf_top_terms``: term
    frequency saturates at k1+1 (a term repeated 50× isn't 50× as
    relevant) and document length normalizes against the corpus average
    (long docs stop winning on bulk alone).

    Numerics: the textbook ``ln((N-df+0.5)/(df+0.5))`` idf is replaced by
    its log argument — strictly decreasing in df exactly like the log, so
    per-document rankings where df differs are preserved, and the whole
    score is a fixed association of IEEE double ops over exact integers
    (tf, df, dl, N, Σdl): bitwise identical in Spark and DuckDB. The
    oracle SQL mirrors the expression tree parenthesis-for-parenthesis.
    ``dl/avgdl`` is computed as ``(dl·N)/Σdl`` — one division instead of a
    derived avgdl intermediate, same association both engines.

    Plan at 100 TB: tf is the one (doc, term) corpus shuffle; dl and df
    are RE-aggregates of tf's output (never a second corpus scan) reusing
    its exchange layouts; the df join is vocabulary-sized; N and Σdl ride
    a 1-row broadcast; the final top-k is a per-doc window over
    ≤ terms-per-doc rows. Identical shuffle count to tf-idf — BM25's
    extra quality is free at the plan level.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    t = tf.agg(F.sum("tf").cast("bigint").alias("total_dl"))
    consts = n.crossJoin(t)
    idf = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    norm = (
        F.col("tf").cast("double")
        + F.lit(0.3)
        + F.lit(0.9)
        * (
            (F.col("dl").cast("double") * F.col("n_docs").cast("double"))
            / F.col("total_dl").cast("double")
        )
    )
    score = idf * ((F.col("tf").cast("double") * F.lit(2.2)) / norm)
    scored = (
        tf.join(df, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .select("doc_id", "term", "tf", "df", score.alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


#: Vocabulary size for the OOV-rate screen. Tiny here; at production
#: scale this is the tokenizer's actual vocab (a plan-shipped dictionary).
VOCAB_TOP_K = 50


@register(
    "vocab_oov_rate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_words_sql()}) AS w FROM documents
),
vocab AS (
  SELECT w FROM tok GROUP BY w
  ORDER BY count(*) DESC, w LIMIT {VOCAB_TOP_K}
),
scored AS (
  SELECT t.doc_id,
         count(*) AS n_tokens,
         count(*) FILTER (v.w IS NULL) AS n_oov
  FROM tok t LEFT JOIN vocab v ON t.w = v.w
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_oov, n_oov / n_tokens AS oov_rate
FROM scored
""",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary token rate per document against a corpus-derived
    top-k vocabulary — the tokenizer-coverage screen that catches
    wrong-language, encoding-damaged, or synthetic-gibberish documents
    before they hit the (expensive) real tokenizer.

    Two-phase: the vocabulary is a distributed top-k over global token
    counts (TakeOrderedAndProject — per-partition partial top-k, merge of
    k-row lists, never a global sort), deterministically tie-broken by
    (count DESC, token ASC); then one broadcast hash join tags each token
    occurrence. At 100 TB the vocab is a fixed-size broadcast (a real
    tokenizer vocab is ~10^5 entries ≈ 2 MB) and the scan stays
    shuffle-free except the per-doc count aggregate. OOV is counted over
    token OCCURRENCES (the multiset), matching how a tokenizer meets the
    text."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(VOCAB_TOP_K)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    n_oov = F.sum(F.col("in_vocab").isNull().cast("bigint"))
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            n_oov.alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


# ----------------------------------------------- Gopher quality rules

#: Rae et al. 2021 (Gopher, arXiv:2112.11446 §A1.1) document filters,
#: adapted to this corpus's scale (the paper's 50-100k word bounds are
#: for web pages; the synthetic docs are short, so the bounds here keep
#: the rules' SHAPE while every branch stays exercised). All thresholds
#: compare exact integers or exact-integer ratios — bitwise portable.
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 10_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 12.0
GOPHER_MAX_TOP2GRAM_FRAC = 0.20
GOPHER_MAX_DUP3GRAM_FRAC = 0.60
GOPHER_MIN_STOPWORD_HITS = 1


@register(
    "quality_gopher_rules",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
base AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(words, x -> length(x)))
              AS BIGINT) AS n_word_chars,
         CAST(len(list_filter(words, x -> list_contains(
              ['the','a','is','of','and','to','in','that','it','for'], x)))
              AS BIGINT) AS stopword_hits
  FROM w
),
g2 AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] AS g
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 1)) AS i) u
),
g2c AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
g2m AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top2, CAST(SUM(c) AS BIGINT) AS n2
  FROM g2c GROUP BY 1
),
g3 AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS g
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) u
),
g3c AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
g3m AS (
  SELECT doc_id,
         CAST(SUM(c) FILTER (WHERE c > 1) AS BIGINT) AS dup3,
         CAST(SUM(c) AS BIGINT) AS n3
  FROM g3c GROUP BY 1
)
SELECT base.doc_id,
       n_words,
       n_word_chars / n_words AS mean_word_len,
       stopword_hits,
       top2 / n2 AS top2gram_frac,
       COALESCE(dup3, CAST(0 AS BIGINT)) / n3 AS dup3gram_frac,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
         AND n_word_chars / n_words BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                                        AND {GOPHER_MAX_MEAN_WORD_LEN}
         AND stopword_hits >= {GOPHER_MIN_STOPWORD_HITS}
         AND top2 / n2 <= {GOPHER_MAX_TOP2GRAM_FRAC}
         AND COALESCE(dup3, CAST(0 AS BIGINT)) / n3
               <= {GOPHER_MAX_DUP3GRAM_FRAC}
         AS keep
FROM base JOIN g2m USING (doc_id) JOIN g3m USING (doc_id)
""",
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, §A1.1) as one
    keep/drop verdict per document: word-count bounds, mean-word-length
    bounds, stopword presence, the most-frequent 2-gram's share, and
    the fraction of 3-grams occurring more than once (the paper's
    duplicate-n-gram family, the repetition gate ``text_repetition``'s
    single metric generalizes from). Complements ``text_quality``'s
    char-class ratios — together they are the standard pre-training
    heuristic filter stack.

    Scale: per-doc array metrics are one projection (no shuffle); each
    n-gram family is one doc_id-partitioned window chain (shingle_rows)
    plus a two-level aggregate sharing the same doc_id exchange. No
    joins wider than doc_id; nothing quadratic.

    Determinism: every ratio is one IEEE division of exact BIGINTs —
    bitwise identical in DuckDB.
    """
    return gopher_metrics(load_table(spark, sf_dir, "documents"))


def gopher_metrics(docs: DataFrame) -> DataFrame:
    """Gopher rule metrics + keep verdict for an arbitrary ``(doc_id,
    text)`` frame — the composable core ``quality_gopher_rules`` and the
    end-to-end curation pipeline share."""
    from deg04_local_data_lake_spark.operators.dedup import shingle_rows

    words = words_col(F.col("text"))
    stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    base = docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("n_word_chars"),
        F.size(
            F.filter(words, lambda x: F.array_contains(stop, x))
        ).cast("bigint").alias("stopword_hits"),
    )
    g2c = (
        shingle_rows(docs, k=2)
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g2m = g2c.groupBy("doc_id").agg(
        F.max("c").cast("bigint").alias("top2"),
        F.sum("c").cast("bigint").alias("n2"),
    )
    g3c = (
        shingle_rows(docs, k=3)
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g3m = g3c.groupBy("doc_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
        ).cast("bigint").alias("dup3"),
        F.sum("c").cast("bigint").alias("n3"),
    )
    mean_len = F.col("n_word_chars") / F.col("n_words")
    top2f = F.col("top2") / F.col("n2")
    dup3f = F.col("dup3") / F.col("n3")
    keep = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_len.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
        & (top2f <= GOPHER_MAX_TOP2GRAM_FRAC)
        & (dup3f <= GOPHER_MAX_DUP3GRAM_FRAC)
    )
    return (
        base.join(g2m, "doc_id")
        .join(g3m, "doc_id")
        .select(
            "doc_id",
            "n_words",
            mean_len.alias("mean_word_len"),
            "stopword_hits",
            top2f.alias("top2gram_frac"),
            dup3f.alias("dup3gram_frac"),
            keep.alias("keep"),
        )
    )


# ------------------------------------------------------- PII scrubbing

#: Redaction regexes kept to syntax with identical semantics in Java
#: regex (Spark) and RE2 (DuckDB): no backreferences, no lookaround.
PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


@register(
    "text_pii_scrub",
    oracle=f"""
WITH seeded AS (
  -- the synthetic corpus carries no PII, so the query INJECTS a
  -- deterministic instance per doc (email / phone / IPv4 by doc_id
  -- mod 3) and must then find and redact exactly what it planted
  SELECT doc_id,
         text || CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com now'
           WHEN 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR),
                       3, '0') || '-0199 today'
           ELSE ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 host'
         END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS BIGINT)
         AS n_phones,
       CAST(len(regexp_extract_all(text, '{PII_IPV4_RE}')) AS BIGINT)
         AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{PII_PHONE_RE}', '<PHONE>', 'g'),
             '{PII_IPV4_RE}', '<IP>', 'g')) AS scrubbed_md5
FROM seeded
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the compliance gate every training
    corpus passes before release: count and replace emails, phone
    numbers, and IPv4 addresses per document. The corpus is synthetic
    word soup with no real PII, so the query PLANTS one deterministic
    instance per document (keyed by doc_id) and both engines must find
    and redact exactly the planted set — the md5 of the redacted text
    attests the replacement byte-for-byte, not just the counts.

    Scale: one projection — regexp_count + three chained regexp_replace
    per row, zero shuffles, codegen'd JVM regex (never a Python UDF).
    Patterns avoid backreferences/lookaround so Java regex and RE2
    agree symbol-for-symbol."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = pii_seeded(docs)
    scrubbed = pii_scrub_column(F.col("text"))
    return seeded.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL_RE))
        .cast("bigint")
        .alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE_RE))
        .cast("bigint")
        .alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(PII_IPV4_RE))
        .cast("bigint")
        .alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def pii_seeded(docs: DataFrame) -> DataFrame:
    """Plant one deterministic PII instance per document (email / phone /
    IPv4 keyed by ``doc_id % 3``) — the shared fixture both
    ``text_pii_scrub`` and the curation pipeline scrub back out."""
    seeded_text = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-0199 today"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 host"),
            )
        ),
    )
    return docs.select("doc_id", seeded_text.alias("text"))


def pii_scrub_column(text):
    """Chained redaction expression (email → phone → IPv4), all
    codegen'd JVM regex."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IPV4_RE,
        "<IP>",
    )


# --------------------------------------------- chunking (round 10)

CHUNK_TOKENS = 64  # window size, whitespace tokens
CHUNK_STRIDE = 48  # overlap = CHUNK_TOKENS - CHUNK_STRIDE = 16 tokens


@register(
    "text_chunk_windows",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
base AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
),
chunks AS (
  SELECT doc_id, n,
         unnest(generate_series(0, CAST((n - 1) // {CHUNK_STRIDE} AS BIGINT)))
             AS chunk_id,
         t
  FROM base
)
SELECT doc_id,
       chunk_id,
       len(list_slice(t, chunk_id * {CHUNK_STRIDE} + 1,
                      chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}))
           AS n_tokens,
       md5(array_to_string(
           list_slice(t, chunk_id * {CHUNK_STRIDE} + 1,
                      chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' '))
           AS chunk_hash
FROM chunks
""",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token windows — the chunking primitive a
    RAG indexer or a context-window packer runs over every document
    (64-token windows, stride 48 ⇒ 16-token overlap; the final window
    per doc is the natural remainder). Emits stable (doc_id, chunk_id)
    plus the chunk's token count and content hash, so downstream
    embedding/indexing stages can join back deterministically.

    Plan shape: tokens + window starts are per-row higher-order
    expressions (split / sequence / posexplode / slice) — ZERO shuffles,
    no Python; at 100 TB this runs at parquet scan speed and the output
    is partition-parallel with its input, exactly what feeds a
    downstream embedding stage without a repartition. The DuckDB twin
    recomputes every window with list_slice, so the hash match pins the
    boundary arithmetic (stride, remainder window, 1-based slice ends)
    token-for-token."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    ).filter(F.size("t") > 0)
    chunks = toks.select(
        "doc_id",
        "t",
        F.posexplode(
            F.sequence(
                F.lit(0),
                ((F.size("t") - 1) / CHUNK_STRIDE).cast("long"),
            )
        ).alias("_pos", "chunk_id"),
    )
    window = F.slice(
        F.col("t"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(window).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", window)).alias("chunk_hash"),
    )
