"""Bloom file-index contract: zero false negatives, real pruning.

The registered query's DuckDB parity (tests/test_parity.py) proves the
LOOKUP RESULT is exact; these tests attest the index-specific halves the
oracle can't see — that every file truly containing a probe key survives
pruning (a false negative would silently drop result rows on a different
probe set), and that the index actually skips files (otherwise it's a
full scan with extra steps).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from deg04_local_data_lake_spark.operators import indexing as ix


@pytest.fixture(scope="module")
def fixture(spark, sf_dir):
    path = ix._orders_multifile(spark, sf_dir)
    orders = spark.read.parquet(path)
    with_file = orders.select(
        F.col("_metadata.file_path").alias("file"), "o_orderkey"
    )
    index = ix.build_bloom_index(with_file, "o_orderkey").cache()
    index.count()
    return orders, with_file, index


def test_no_false_negatives_across_key_range(spark, fixture):
    """Every file that truly contains a probe key must survive pruning —
    checked over a 64-key probe sweep spread across the key range (not
    just the registered query's 7), since a false negative is the failure
    mode that silently corrupts results."""
    orders, with_file, index = fixture
    probes = (
        orders.select(F.col("o_orderkey").cast("bigint").alias("k"))
        .filter(F.col("o_orderkey") % 97 == 0)
        .limit(64)
    ).cache()
    truth = {
        r.file
        for r in with_file.join(
            probes, with_file.o_orderkey == probes.k, "left_semi"
        )
        .select("file")
        .distinct()
        .collect()
    }
    survivors = {
        r.file for r in ix.bloom_candidate_files(index, probes).collect()
    }
    assert truth <= survivors, sorted(truth - survivors)


def test_prunes_most_files_for_point_probe(spark, fixture):
    """A small probe set must touch well under the full file count —
    the reason the index exists. 7 probes over 16 hash-partitioned files
    can truly live in at most 7; allow +2 false-positive slack."""
    orders, _, index = fixture
    probes = ix._probe_keys(spark, orders)
    n = ix.bloom_candidate_files(index, probes).count()
    assert n <= 9, f"expected <=9 candidate files, bloom kept {n} of {ix.N_FILES}"


def test_absent_keys_prune_everything_or_fp_only(spark, fixture):
    """Probes outside the key domain should survive almost nowhere: with
    M=2^15/K=5 at ~1k keys per file the per-file FP odds are ~1e-4, so 2
    absent keys x 16 files should essentially always prune to zero."""
    _, _, index = fixture
    absent = spark.range(1).select(
        F.explode(
            F.array(F.lit(-1).cast("bigint"), F.lit(-2).cast("bigint"))
        ).alias("k")
    )
    n = ix.bloom_candidate_files(index, absent).count()
    assert n <= 1, f"absent keys matched {n} files — FP rate far above design"


def test_index_is_sparse_and_bounded(fixture):
    """Index cardinality is bounded by files x M/64 words regardless of
    row count — the property that keeps the sidecar metadata-sized."""
    _, _, index = fixture
    n_rows = index.count()
    assert n_rows <= ix.N_FILES * (ix.M_BITS // 64)
    n_files = index.select("file").distinct().count()
    assert n_files == ix.N_FILES
