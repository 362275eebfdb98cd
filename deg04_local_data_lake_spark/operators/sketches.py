"""Portable cross-engine sketches (SURVEY.md §2 diagnostics extension;
no counterpart in the reference — its only distinct counts are exact
``COUNT(DISTINCT …)`` passes, e.g. ``mage_demo/scratchpads/
financial_dl_etl.py`` daily summaries).

``approx_count_distinct`` (Spark) and ``approx_count_distinct`` (DuckDB)
are both HyperLogLog, but different variants with different hashes — the
sketch VALUES can never hash-match across engines, which is why
``approx_distinct_calibration`` (operators/extras.py) only compares a
within-tolerance flag. This module instead implements HLL *from scratch*
with arithmetic both engines evaluate bit-identically, so the estimate
itself is oracle-checkable:

* **Hash**: the repo's portable-hash idiom — 48-bit integer from md5 hex
  chars 1-12 (same construction as MinHash, ``operators/dedup.py:250``).
* **Register rank**: rather than leading-zero counts (which need a
  bit-length primitive with engine-specific semantics), we use the
  TRAILING-zero geometric — ``w & -w`` isolates the lowest set bit as an
  exact power of two 2^tz, and P[tz ≥ r] = 2^-r for a uniform hash, the
  same geometric Flajolet's estimator assumes. The register stores
  ``max(w & -w)`` — a plain integer ``max`` aggregate, monotone in rank.
* **Estimator term**: rank r = tz+1 contributes 2^-r = 1/(2·(w&-w)) — an
  IEEE division by a power of two, EXACT in binary floating point.
* **Order-independent sum**: with m = 64 registers and ranks capped at
  43, every term is 2^-r with r ∈ [0, 43]; any partial sum of ≤64 such
  terms spans ≤ 6+43+1 = 50 mantissa bits < 53, so EVERY intermediate
  sum is exactly representable and the total is independent of addition
  order — Spark's parallel partial aggregation and DuckDB's sequential
  sum produce the same double, bit for bit.

At 100 TB this is THE distinct-count path: fixed 64·8-byte state per
group, map-side combinable (``max`` per register), one narrow shuffle of
(group, register, max) rows instead of count-distinct's two-level
expansion of every distinct value. ``hll_portable_merge`` demonstrates
the mergeability contract directly: a register-wise ``max`` over
per-group sketches IS the sketch of the union — the property that lets
sketches roll up across partitions, days, or datacenters without
touching raw data again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

#: Number of HLL registers (2^6). alpha_64 is Flajolet's bias constant
#: for m = 64 (alpha_m = 0.7213/(1 + 1.079/m) rounds to 0.709 at m=64,
#: the value the original paper tabulates for this register count).
HLL_M = 64
HLL_ALPHA = 0.709

#: Sentinel for w == 0 (all 42 post-register hash bits zero, p = 2^-42):
#: rank 43, i.e. lowest-set-bit value 2^42.
_W_ZERO = 1 << 42


def _hll_registers(df: DataFrame, group: str, col: str) -> DataFrame:
    """(group, register j, max lowest-set-bit) — the mergeable sketch rows.

    One md5 per row, register index from the low 6 bits, rank material
    from the remaining 42. The groupBy is map-side combinable: each
    partition emits at most |groups|·64 rows regardless of input size.
    """
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    w = F.shiftright(h, 6)  # h // 64; h is non-negative so shift == floor-div
    lowbit = F.when(w == 0, F.lit(_W_ZERO)).otherwise(
        w.bitwiseAND(-w)
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.col(group), F.pmod(h, F.lit(HLL_M)).alias("j"), lowbit.alias("lb"))
        .groupBy(group, "j")
        .agg(F.max("lb").alias("max_lb"))
    )


def _hll_estimate(regs: DataFrame, group: str) -> DataFrame:
    """Register rows → (group, v_empty, s_sum, hll_estimate).

    Empty registers contribute 2^0 = 1 each (rank 0); present register
    with max lowest-set-bit L contributes 1/(2·L) — exact powers of two
    throughout, so s_sum is bitwise engine-independent (see module doc).
    """
    per_group = regs.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.lit(1.0) / (2.0 * F.col("max_lb"))).alias("s_present"),
    )
    v_empty = F.lit(HLL_M) - F.col("n_present")
    s_sum = F.col("s_present") + v_empty.cast("double")
    est = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) / s_sum
    return per_group.select(
        F.col(group),
        v_empty.alias("v_empty"),
        s_sum.alias("s_sum"),
        est.alias("hll_estimate"),
    )


_HLL_REG_SQL = f"""
SELECT event_type,
       h % {HLL_M} AS j,
       max(CASE WHEN w = 0 THEN {_W_ZERO} ELSE w & (-w) END) AS max_lb
FROM (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT // {HLL_M} AS w
  FROM events WHERE user_id IS NOT NULL
)
GROUP BY event_type, h % {HLL_M}
"""

_HLL_EST_SQL = f"""
SELECT event_type,
       {HLL_M} - count(*) AS v_empty,
       sum(1.0 / (2.0 * max_lb)) + ({HLL_M} - count(*))::DOUBLE AS s_sum,
       {HLL_ALPHA} * {float(HLL_M * HLL_M)}
         / (sum(1.0 / (2.0 * max_lb)) + ({HLL_M} - count(*))::DOUBLE)
         AS hll_estimate
FROM regs
GROUP BY event_type
"""


@register(
    "hll_portable_distinct",
    oracle=f"""
WITH regs AS ({_HLL_REG_SQL}),
est AS ({_HLL_EST_SQL}),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events WHERE user_id IS NOT NULL GROUP BY event_type
)
SELECT e.event_type, n_exact, v_empty, s_sum, hll_estimate,
       abs(hll_estimate - n_exact) / n_exact AS rel_err
FROM est e JOIN exact USING (event_type)
""",
)
def hll_portable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via the portable HLL, published
    alongside the exact count and the realized relative error.

    The estimate column itself hash-matches the DuckDB oracle — both
    engines run the same register construction and the same
    exact-powers-of-two estimator (module doc explains why the float
    sum is order-independent). The exact count is a separate aggregate
    joined on the (tiny) group key — at 100 TB you would DROP that
    column; here it pins the accuracy the sketch actually achieves."""
    events = load_table(spark, sf_dir, "events")
    regs = _hll_registers(events, "event_type", "user_id")
    est = _hll_estimate(regs, "event_type")
    exact = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n_exact",
        "v_empty",
        "s_sum",
        "hll_estimate",
        (F.abs(F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact")).alias(
            "rel_err"
        ),
    )


@register(
    "hll_portable_merge",
    oracle=f"""
WITH regs AS ({_HLL_REG_SQL}),
merged AS (
  SELECT j, max(max_lb) AS max_lb FROM regs GROUP BY j
),
est AS (
  SELECT {HLL_M} - count(*) AS v_empty,
         sum(1.0 / (2.0 * max_lb)) + ({HLL_M} - count(*))::DOUBLE AS s_sum
  FROM merged
),
exact AS (
  SELECT count(DISTINCT user_id) AS n_exact
  FROM events WHERE user_id IS NOT NULL
)
SELECT n_exact, v_empty, s_sum,
       {HLL_ALPHA} * {float(HLL_M * HLL_M)} / s_sum AS hll_estimate
FROM est, exact
""",
)
def hll_portable_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE: register-wise ``max`` over the per-event-type
    sketches yields exactly the sketch of the union of users — estimated
    global distinct count without re-scanning raw data.

    This is the property that makes HLL the 100 TB distinct-count
    answer: per-day / per-partition sketches (64 longs each) roll up by
    ``max`` to any coarser grain. The oracle performs the identical
    merge, so even the merged estimate hash-matches."""
    events = load_table(spark, sf_dir, "events")
    regs = _hll_registers(events, "event_type", "user_id")
    merged = regs.groupBy("j").agg(F.max("max_lb").alias("max_lb"))
    per = merged.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.lit(1.0) / (2.0 * F.col("max_lb"))).alias("s_present"),
    )
    v_empty = F.lit(HLL_M) - F.col("n_present")
    s_sum = F.col("s_present") + v_empty.cast("double")
    exact = events.filter(F.col("user_id").isNotNull()).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return per.crossJoin(F.broadcast(exact)).select(
        "n_exact",
        v_empty.alias("v_empty"),
        s_sum.alias("s_sum"),
        (F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) / s_sum).alias(
            "hll_estimate"
        ),
    )


@register(
    "hll_daily_rollup",
    oracle=f"""
WITH regs AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         h % {HLL_M} AS j,
         max(CASE WHEN w = 0 THEN {_W_ZERO} ELSE w & (-w) END) AS max_lb
  FROM (
    SELECT ts,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT // {HLL_M} AS w
    FROM events WHERE user_id IS NOT NULL
  )
  GROUP BY 1, 2
),
weekly AS (
  SELECT CAST(date_trunc('week', day) AS DATE) AS week_start, j,
         max(max_lb) AS max_lb
  FROM regs GROUP BY 1, 2
),
est AS (
  SELECT week_start,
         {HLL_M} - count(*) AS v_empty,
         sum(1.0 / (2.0 * max_lb)) + ({HLL_M} - count(*))::DOUBLE AS s_sum
  FROM weekly GROUP BY week_start
),
exact AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
         count(DISTINCT user_id) AS n_exact
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT week_start, n_exact, v_empty,
       {HLL_ALPHA} * {float(HLL_M * HLL_M)} / s_sum AS hll_estimate,
       abs({HLL_ALPHA} * {float(HLL_M * HLL_M)} / s_sum - n_exact) / n_exact
         AS rel_err
FROM est JOIN exact USING (week_start)
""",
)
def hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grain sketch rollup: DAILY HLL registers merged (register-wise
    max) into WEEKLY distinct-user estimates — the materialized-sketch
    pattern where finer-grain sketches answer every coarser grain without
    re-touching raw events.

    At 100 TB this is the whole point of sketch columns in a lakehouse:
    persist 64 longs per (day, dimension) at ingest, and weekly / monthly
    / trailing-28-day distinct counts become metadata-sized merges. The
    exact per-week count here exists only to pin the realized error;
    production drops it. Every arithmetic step is the module's exact
    power-of-two contract, so even the rolled-up estimates hash-match."""
    events = load_table(spark, sf_dir, "events")
    daily = _hll_registers(
        events.withColumn("day", F.date_trunc("DAY", "ts").cast("date")),
        "day",
        "user_id",
    )
    weekly = daily.groupBy(
        F.date_trunc("WEEK", "day").cast("date").alias("week_start"), "j"
    ).agg(F.max("max_lb").alias("max_lb"))
    est = _hll_estimate(weekly, "week_start")
    exact = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy(F.date_trunc("WEEK", "ts").cast("date").alias("week_start"))
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return est.join(F.broadcast(exact), "week_start").select(
        "week_start",
        "n_exact",
        "v_empty",
        "hll_estimate",
        (F.abs(F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact")).alias(
            "rel_err"
        ),
    )


# ----------------------------------------------------- Bitmap indexes

#: Bitmap geometry: 32 bits per word (positions from the low 5 id bits,
#: word ids from the rest) — keeps every shifted value far from int64
#: sign territory in both engines.
_BM_BITS = 32


@register(
    "bitmap_distinct_users",
    oracle=f"""
WITH words AS (
  SELECT event_type,
         user_id // {_BM_BITS} AS word_id,
         bit_or(1::BIGINT << CAST(user_id % {_BM_BITS} AS INTEGER)) AS bits
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct
FROM words GROUP BY event_type
""",
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via bitmap words — the
    Druid/ClickHouse-style bitmap-index aggregate, sitting between naive
    count-distinct and the HLL sketch: exact like the former, mergeable
    like the latter.

    Each user id sets one bit in word ``id // 32``; ``bit_or`` is the
    per-(group, word) combiner (associative, commutative, map-side
    combinable — Spark plans the same partial/final HashAggregate as a
    sum) and popcount-of-words yields the exact distinct count. State is
    proportional to the distinct-id RANGE per group, not to row count —
    for dense id spaces (dimension keys, user ids from a sequence) it
    beats count-distinct's expansion by the duplication factor while
    staying exact, and persisted word tables roll up across groups by
    ``bit_or`` just like HLL registers roll up by max. All integer ops —
    trivially hash-identical across engines."""
    events = load_table(spark, sf_dir, "events")
    bit = F.expr(f"shiftleft(1L, CAST(user_id % {_BM_BITS} AS INT))")
    words = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy(
            "event_type",
            (F.col("user_id") / _BM_BITS).cast("long").alias("word_id"),
        )
        .agg(F.bit_or(bit).alias("bits"))
    )
    return words.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct"),
    )


@register(
    "bitmap_user_overlap",
    oracle=f"""
WITH words AS (
  SELECT event_type,
         user_id // {_BM_BITS} AS word_id,
         bit_or(1::BIGINT << CAST(user_id % {_BM_BITS} AS INTEGER)) AS bits
  FROM events WHERE user_id IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
c AS (SELECT word_id, bits FROM words WHERE event_type = 'click'),
p AS (SELECT word_id, bits FROM words WHERE event_type = 'purchase')
SELECT
  (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM c) AS n_click,
  (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM p) AS n_purchase,
  CAST(coalesce(sum(bit_count(c.bits & p.bits)), 0) AS BIGINT) AS n_both
FROM c JOIN p USING (word_id)
""",
)
def bitmap_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap (clickers ∩ purchasers) as bitmap algebra:
    word-aligned AND + popcount — the set-intersection path that needs
    neither a distinct-distinct join nor two count-distinct passes.

    The per-type word tables join on word_id (both sides already reduced
    to |id-range|/32 rows), so intersection cost is independent of event
    volume — the reason bitmap indexes are THE audience-segmentation
    structure in OLAP stores. Scale note: persisted per-segment word
    tables make any boolean audience combination (AND/OR/NOT of
    segments) a word-wise integer expression."""
    events = load_table(spark, sf_dir, "events")
    bit = F.expr(f"shiftleft(1L, CAST(user_id % {_BM_BITS} AS INT))")
    words = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isin("click", "purchase")
        )
        .groupBy(
            "event_type",
            (F.col("user_id") / _BM_BITS).cast("long").alias("word_id"),
        )
        .agg(F.bit_or(bit).alias("bits"))
    )
    c = words.filter(F.col("event_type") == "click").select(
        "word_id", F.col("bits").alias("c_bits")
    )
    p = words.filter(F.col("event_type") == "purchase").select(
        "word_id", F.col("bits").alias("p_bits")
    )
    n_click = c.agg(F.sum(F.bit_count("c_bits")).cast("bigint").alias("n_click"))
    n_purchase = p.agg(
        F.sum(F.bit_count("p_bits")).cast("bigint").alias("n_purchase")
    )
    both = c.join(p, "word_id").agg(
        F.coalesce(
            F.sum(F.bit_count(F.col("c_bits").bitwiseAND(F.col("p_bits")))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_both")
    )
    return n_click.crossJoin(F.broadcast(n_purchase)).crossJoin(
        F.broadcast(both)
    )


@register(
    "hll_user_overlap",
    oracle=f"""
WITH regs AS (
  SELECT event_type,
         h % {HLL_M} AS j,
         max(CASE WHEN w = 0 THEN {_W_ZERO} ELSE w & (-w) END) AS max_lb
  FROM (
    SELECT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT // {HLL_M} AS w
    FROM events
    WHERE user_id IS NOT NULL AND event_type IN ('click', 'purchase')
  )
  GROUP BY 1, 2
),
est AS (
  SELECT event_type,
         {HLL_ALPHA} * {float(HLL_M * HLL_M)}
           / (sum(1.0 / (2.0 * max_lb)) + ({HLL_M} - count(*))::DOUBLE) AS e
  FROM regs GROUP BY event_type
),
u AS (
  SELECT {HLL_ALPHA} * {float(HLL_M * HLL_M)}
           / (sum(1.0 / (2.0 * max_lb)) + ({HLL_M} - count(*))::DOUBLE) AS e_union
  FROM (SELECT j, max(max_lb) AS max_lb FROM regs GROUP BY j)
)
SELECT c.e AS est_click, p.e AS est_purchase, u.e_union AS est_union,
       c.e + p.e - u.e_union AS est_overlap
FROM (SELECT e FROM est WHERE event_type = 'click') c,
     (SELECT e FROM est WHERE event_type = 'purchase') p, u
""",
)
def hll_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra audience overlap: |click ∩ purchase| estimated by
    inclusion-exclusion over three HLL estimates — the two per-type
    sketches plus their register-max merge (= union sketch). The approx
    twin of ``bitmap_user_overlap``: same question, O(m) state per
    segment instead of O(id-range/32), at HLL error rates (which
    inclusion-exclusion compounds — the documented trade; theta sketches
    fix it at the cost of a heavier state, noted not implemented).

    Everything reuses the module's exact power-of-two arithmetic, so all
    four published doubles hash-match the oracle."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    regs = _hll_registers(events, "event_type", "user_id")
    est = _hll_estimate(regs, "event_type").select(
        "event_type", F.col("hll_estimate").alias("e")
    )
    c = est.filter(F.col("event_type") == "click").select(
        F.col("e").alias("est_click")
    )
    p = est.filter(F.col("event_type") == "purchase").select(
        F.col("e").alias("est_purchase")
    )
    merged = (
        regs.groupBy("j")
        .agg(F.max("max_lb").alias("max_lb"))
        .withColumn("g", F.lit("all"))
    )
    u = _hll_estimate(merged, "g").select(
        F.col("hll_estimate").alias("est_union")
    )
    return (
        c.crossJoin(F.broadcast(p))
        .crossJoin(F.broadcast(u))
        .select(
            "est_click",
            "est_purchase",
            "est_union",
            (
                F.col("est_click") + F.col("est_purchase") - F.col("est_union")
            ).alias("est_overlap"),
        )
    )


# --------------------------------------------- Two-phase exact heavy hitters

#: φ = 1/HH_DENOM: a token is a heavy hitter when it carries at least
#: 1/32 of all token occurrences. Integer cross-multiplication on both
#: engines — no float threshold anywhere.
HH_DENOM = 32


@register(
    "heavy_hitters_tokens",
    oracle=f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS tok
  FROM documents
),
tot AS (SELECT COUNT(*) AS n_total FROM toks)
SELECT tok, COUNT(*) AS n_tok,
       (SELECT n_total FROM tot) AS n_total,
       CAST(COUNT(*) AS DOUBLE) / (SELECT n_total FROM tot) AS share
FROM toks
GROUP BY tok
HAVING COUNT(*) * {HH_DENOM} >= (SELECT n_total FROM tot)
""",
)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ-heavy hitters over the token stream, two-phase (the scalable
    shape for HIGH-CARDINALITY keys, where a plain groupBy+HAVING must
    shuffle one partial row per distinct key — at 100 TB of web-crawl
    vocabulary that shuffle IS the bottleneck).

    Phase 1 — candidates, zero shuffle: each partition counts its own
    tokens (vectorized ``value_counts`` over Arrow batches, merged across
    batches) and emits only tokens with local_count·32 ≥ local_rows.
    Averaging guarantees the superset with PURELY LOCAL knowledge: if
    globally c·32 ≥ N = Σ rows_p but every partition had c_p·32 < rows_p
    (i.e. ≤ rows_p − 1), summing gives 32c ≤ N − P < N — contradiction.
    So every true heavy hitter survives, and the shuffle that follows
    moves only locally-frequent tokens (≤ 32 per partition), not the
    vocabulary.

    Phase 2 — exact: broadcast the candidate set back as a semi-join
    filter, count candidates exactly, and apply the global φ·N cut with
    integer cross-multiplication. Output counts are exact — the sketch
    phase only PRUNES, never estimates, so the result is identical to
    the naive single-pass oracle (which is the point the green hash
    proves). φ is exact on both engines by construction (no float
    threshold; ``share`` is a single int/int division, bit-identical).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr("filter(split(text, ' '), w -> w <> '')")).alias("tok")
    )

    def local_candidates(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        rows = 0
        for pdf in batches:
            rows += len(pdf)
            for tok, c in pdf["tok"].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
        keep = [t for t, c in counts.items() if c * HH_DENOM >= rows]
        yield pd.DataFrame({"tok": pd.Series(keep, dtype="object")})

    cand = toks.mapInPandas(local_candidates, "tok string").distinct()
    total = toks.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("n_tok") * HH_DENOM >= F.col("n_total"))
        .select(
            "tok",
            "n_tok",
            "n_total",
            (F.col("n_tok").cast("double") / F.col("n_total")).alias("share"),
        )
    )


# --------------------------------------------------- Count-min sketch

CM_DEPTH = 4
CM_WIDTH = 64


@register(
    "cm_sketch_user_counts",
    oracle=f"""
WITH keyed AS (
  SELECT user_id, d.d,
         ('0x' || substr(md5('cm' || CAST(d.d AS VARCHAR) || ':'
                              || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
           % {CM_WIDTH} AS bucket
  FROM events, (SELECT unnest(generate_series(0, {CM_DEPTH - 1})) AS d) d
),
cells AS (SELECT d, bucket, COUNT(*) AS cell FROM keyed GROUP BY 1, 2),
per_user AS (SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY 1),
probes AS (
  SELECT p.user_id, p.n_exact, d.d,
         ('0x' || substr(md5('cm' || CAST(d.d AS VARCHAR) || ':'
                              || CAST(p.user_id AS VARCHAR)), 1, 12))::BIGINT
           % {CM_WIDTH} AS bucket
  FROM per_user p, (SELECT unnest(generate_series(0, {CM_DEPTH - 1})) AS d) d
)
SELECT k.user_id, k.n_exact,
       MIN(c.cell) AS cm_estimate,
       MIN(c.cell) - k.n_exact AS overcount
FROM probes k JOIN cells c ON k.d = c.d AND k.bucket = c.bucket
GROUP BY k.user_id, k.n_exact
""",
)
def cm_sketch_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan) with the portable md5
    hash family, plus a full-key audit — the frequency-estimation member
    of the sketch layer (HLL = distinct, bitmap = exact sets,
    heavy-hitters = exact top mass, CM = per-key counts in fixed memory).

    Build path is the 100 TB shape: each row maps to CM_DEPTH (row,
    bucket) cells and the groupBy collapses map-side to at most
    DEPTH·WIDTH = {CM_DEPTH}·{CM_WIDTH} = 256 partial cells PER PARTITION
    — the shuffle is 256 rows × partitions no matter how many events or
    distinct keys exist, and register-wise SUM of two sketches is the
    sketch of the union (same mergeability contract as the HLL).

    Point query: estimate(key) = min over depth rows of the key's cell.
    Collisions only ADD mass, so cm_estimate ≥ n_exact always
    (``overcount`` ≥ 0 — asserted in tests); the audit join against the
    exact per-key counts makes the estimate/exact trade measurable, and
    every quantity is an integer aggregate — bit-identical cross-engine,
    so the sketch VALUES hash-match the oracle, not just a tolerance
    flag.
    """
    ev = load_table(spark, sf_dir, "events")
    depths = F.array(*[F.lit(i) for i in range(CM_DEPTH)])

    def bucket(key_col):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cm"),
                        F.col("d").cast("string"),
                        F.lit(":"),
                        key_col.cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(CM_WIDTH))

    keyed = ev.select("user_id", F.explode(depths).alias("d")).select(
        "d", bucket(F.col("user_id")).alias("bucket")
    )
    cells = keyed.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cell"))
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    probes = per_user.select(
        "user_id", "n_exact", F.explode(depths).alias("d")
    ).select("user_id", "n_exact", "d", bucket(F.col("user_id")).alias("bucket"))
    return (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cell").alias("cm_estimate"))
        .select(
            "user_id",
            "n_exact",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("n_exact")).alias("overcount"),
        )
    )
