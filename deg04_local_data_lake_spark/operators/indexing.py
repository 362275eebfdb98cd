"""File-level Bloom secondary index: point lookups that skip data files.

Min/max zone stats (``delta_log_data_skipping``) prune range predicates but
are useless for point lookups on a HIGH-CARDINALITY, UNSORTED key — every
file's [min, max] spans the probe. The lakehouse answer (Parquet column
bloom filters, Databricks bloom index) is a per-file Bloom filter sidecar:
at 100 TB a needle-in-haystack lookup consults kilobytes of index instead
of scanning terabytes of data.

This module builds that index with PLAIN DataFrame ops — no UDF, no
driver-side hashing:

- each row contributes K deterministic bit positions
  (``xxhash64(key, seed) pmod M``) tagged with its source file
  (``_metadata.file_path``);
- positions fold to sparse ``(file, word_idx, word)`` rows via a
  map-side-combinable ``bit_or`` — one shuffle keyed on (file, word),
  index size ≤ files × M/64 rows regardless of data volume;
- a probe key survives a file iff ALL K of its bits are set — checked by
  joining probe bit positions against the sparse words (a missing word row
  means the bit is 0, so the inner join's hit count carries the AND).

False positives cost one extra file read; false negatives are impossible
(every row's bits were OR-ed in), which is the invariant
``tests/test_indexing.py`` attests alongside the actual pruning.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

#: Bloom geometry. M_BITS=2^15 per file / K=5 hashes holds the false-
#: positive rate ≈ (1-e^{-5n/M})^5 below 1e-4 up to n≈1k keys per file;
#: at real file sizes (≈1M keys per 128 MB file) you scale M with the
#: file row count — the shapes below never materialize M bits, only the
#: words actually set, so a larger M costs nothing extra to build.
M_BITS = 1 << 15
K_HASHES = 5
N_FILES = 16

_FIXTURE_CACHE: dict[tuple[str, str], str] = {}


def _orders_multifile(spark: SparkSession, sf_dir: str) -> str:
    """Materialize orders as ``N_FILES`` hash-partitioned parquet files —
    the multi-file layout any real table has and the single-file testdata
    lacks. Deterministic shared location keyed by the source's identity
    (same publish-by-rename idiom as the stream-source rewrite,
    streaming/ingest.py) so benches/tests/driver reuse one copy."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _FIXTURE_CACHE.get(key)
    if cached is not None:
        return cached
    table = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(table)
    tag = hashlib.sha256(
        f"bloomidx:{table}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    dst = os.path.join(tempfile.gettempdir(), f"deg04_bloomidx_{tag}")
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        stage = tempfile.mkdtemp(prefix=f"deg04_bloomidx_stage_{tag}_")
        stage_out = os.path.join(stage, "out")
        (
            load_table(spark, sf_dir, "orders")
            .withColumn("o_orderkey", F.col("o_orderkey").cast("bigint"))
            .repartition(N_FILES, "o_orderkey")
            .write.mode("overwrite")
            .parquet(stage_out)
        )
        try:
            os.rename(stage_out, dst)
        except OSError:
            if not os.path.exists(os.path.join(dst, "_SUCCESS")):
                shutil.rmtree(stage, ignore_errors=True)
                raise
        shutil.rmtree(stage, ignore_errors=True)
    _FIXTURE_CACHE[key] = dst
    return dst


def _bit_positions(key_col: F.Column) -> F.Column:
    """Array of the K Bloom bit positions for one key value. The key must
    already be BIGINT: xxhash64 hashes the Spark TYPE, so index and probe
    sides must agree on it."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(M_BITS))
            for i in range(K_HASHES)
        ]
    )


def build_bloom_index(df_with_file: DataFrame, key: str) -> DataFrame:
    """Sparse Bloom sidecar: one ``(file, word_idx, word)`` row per 64-bit
    word with any bit set. ONE shuffle (the groupBy), partial ``bit_or``
    folds map-side; never wider than files × M_BITS/64 rows."""
    return (
        df_with_file.select(
            "file", F.explode(_bit_positions(F.col(key))).alias("bitpos")
        )
        .groupBy("file", F.expr("bitpos div 64").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 64 AS INT))")
            ).alias("word")
        )
    )


def bloom_candidate_files(index: DataFrame, probes: DataFrame) -> DataFrame:
    """Files a probe set cannot rule out: for each (probe key, file), the
    key survives iff all K of its bit positions hit a set bit. The join is
    index-sized (tiny) × K·|probes| — metadata scale, not data scale."""
    probe_bits = probes.select(
        "k", F.explode(_bit_positions(F.col("k"))).alias("bitpos")
    ).select(
        "k",
        F.expr("bitpos div 64").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 64 AS INT))").alias("bit"),
    )
    hits = probe_bits.join(index, "word_idx").filter(
        (F.col("word").bitwiseAND(F.col("bit"))) != 0
    )
    return (
        hits.groupBy("k", "file")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") == K_HASHES)
        .select("file")
        .distinct()
    )


def _probe_keys(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """Five keys known present (the smallest orderkeys — stable at every
    SF) plus two keys absent at every SF (orderkeys are ≥ 0)."""
    present = (
        orders.select(F.col("o_orderkey").cast("bigint").alias("k"))
        .orderBy("k")
        .limit(5)
    )
    absent = spark.range(1).select(
        F.explode(F.array(F.lit(-1).cast("bigint"), F.lit(-2).cast("bigint"))).alias("k")
    )
    return present.unionByName(absent)


@register(
    "bloom_index_point_lookup",
    oracle="""
WITH probes AS (
  SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 5
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
       o.o_totalprice, o.o_orderdate, o.o_orderpriority
FROM orders o JOIN probes p ON o.o_orderkey = p.k
""",
)
def bloom_index_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup through the Bloom sidecar: build the per-file index
    over a 16-file copy of orders, prune the file list with a 7-key probe
    set (5 present + 2 absent), and read ONLY the surviving files.

    The collect() here is the index answer — a pruned FILE LIST, which is
    driver metadata by definition (every skipping index, zone map, and
    catalog works this way); it is bounded by the file count, never the
    row count. The final semi-join against the probe frame removes Bloom
    false positives, so the result is exact regardless of the index's
    false-positive rate — the index only decides how few files get read.
    ``tests/test_indexing.py`` attests the other half of the contract on
    the same fixture: zero false negatives, and real pruning (the 7
    probes touch well under half of the 16 files)."""
    path = _orders_multifile(spark, sf_dir)
    orders = spark.read.parquet(path)
    with_file = orders.select(
        F.col("_metadata.file_path").alias("file"), "o_orderkey"
    )
    index = build_bloom_index(with_file, "o_orderkey")
    probes = _probe_keys(spark, orders)
    files = [r.file for r in bloom_candidate_files(index, probes).collect()]
    if not files:  # absent-only probe set: nothing to read
        return orders.filter(F.lit(False)).select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    pruned = spark.read.parquet(*files)
    return pruned.join(probes, pruned.o_orderkey == probes.k, "left_semi").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    )
