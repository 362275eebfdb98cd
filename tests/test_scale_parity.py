"""Correctness at scale (round 8): the driver's oracle comparison,
re-run against the scale-up study's derived sf1 dataset (10× sf0.1,
join-consistent key offsets — see scripts/scaleup.py).

Round 10 (VERDICT r9 task #3): the sf1 and sf1skew datasets are now
AUTO-DERIVED by a session-scoped fixture when absent, so a fresh
container runs the 10× gates with zero manual steps instead of silently
skipping 37+ tests (/tmp is wiped between containers). The derive is
bounded (~2-3 min each on local[8], done once per container). Only the
100× tier stays opt-in: set SPARK_GRAFT_SF10=1 to derive it (minutes
and ~6 GB of parquet), or pre-build with
`python scripts/scaleup.py derive --factor 100 --out /tmp/scaleup/sf10`.

This is the value-hash gate at 10× the size the driver checks — it
catches scale-dependent wrong answers (overflow, skew-cap divergence,
partition-order sensitivity) that sf0.01 cannot."""

from __future__ import annotations

import importlib.util
import os

import pytest

from deg04_local_data_lake_spark import oracle

SF1_DIR = "/tmp/scaleup/sf1"
SRC_DIR = os.environ.get("SPARK_GRAFT_SCALEUP_SRC", "/root/testdata/sf0.1")


def _scaleup_module():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "scaleup.py",
    )
    spec = importlib.util.spec_from_file_location("scaleup", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _dataset_ready(path: str) -> bool:
    # the marker is written LAST by scaleup.derive — a partial directory
    # from a crashed derive must trigger a re-derive, not a wrong pass.
    # Datasets derived before round 10 predate the marker; accept them
    # when every table carries Spark's own _SUCCESS commit marker.
    if os.path.isfile(os.path.join(path, "_DERIVED_OK")):
        return True
    return all(
        os.path.isfile(os.path.join(path, f"{t}.parquet", "_SUCCESS"))
        for t in _TABLES
    )


def _ensure_derived(spark, out: str, factor: int, skew: bool) -> None:
    if _dataset_ready(out):
        return
    _scaleup_module().derive(SRC_DIR, out, factor, skew=skew, spark=spark)


@pytest.fixture(scope="session")
def sf1_dir(spark) -> str:
    _ensure_derived(spark, SF1_DIR, 10, skew=False)
    return SF1_DIR

# one representative per family; excludes queries whose oracle
# intentionally diverges above the skew caps (SemDeDup at mega-cluster
# scale — the documented trade)
NAMES = [
    "q1_pricing_summary",
    "q5_nation_revenue",
    "silver_asset_performance",
    "gold_monthly_summary",
    "window_topk_orders",
    "events_sessionize",
    "rollup_revenue",
    "cdc_upsert_customer",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_exact_substring",
    "quality_gopher_rules",
    "text_pii_scrub",
    "training_shard_assignment",
    "similarity_topk",
    "text_token_stats",
    "corpus_curation",
    "asof_purchase_click",
    "range_join_error_burst",
    "mm_decode_wav",
    # round 9: the iterative algorithms and the file index — the paths
    # whose determinism claims (quantized folds, bloom completeness)
    # most need re-proving as the data grows
    "pagerank_iterated",
    "embedding_kmeans_iterated",
    "bloom_index_point_lookup",
    # round 10: the maintenance-lifecycle contract (checkpoint replay,
    # grace-0 vacuum, CDF horizon) and the lossy JPEG tolerance claim —
    # both must hold as the data grows, not just at sf0.01
    "delta_log_maintenance_lifecycle",
    "mm_decode_jpeg",
    "text_chunk_windows",
]

SF10_DIR = "/tmp/scaleup/sf10"

# the 100x tier trims to the queries whose DuckDB side stays fast at
# 60M-row lineitem / 10M events / 500k docs (the n-gram-explode oracles
# take minutes there; parity is attested at 10x above)
NAMES_100X = [
    "q1_pricing_summary",
    "q5_nation_revenue",
    "gold_monthly_summary",
    "window_topk_orders",
    "events_sessionize",
    "rollup_revenue",
    "cdc_upsert_customer",
    "training_shard_assignment",
    "text_pii_scrub",
    "text_token_stats",
    "mm_decode_wav",
    "dedup_minhash_signatures",
    # round 9: bloom lookup stays cheap on both engines at 100x; the
    # iterated pagerank/k-means oracles are chained-CTE joins DuckDB
    # re-materializes per round — attested at 10x above instead
    "bloom_index_point_lookup",
]

@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_at_10x(spark, sf1_dir, name):
    ok, msg = oracle.check_query(spark, sf1_dir, name)
    assert ok, f"{name} at 10x: {msg}"


@pytest.fixture(scope="session")
def sf10_dir(spark) -> str:
    if not _dataset_ready(SF10_DIR) and not os.environ.get(
        "SPARK_GRAFT_SF10"
    ):
        pytest.skip(
            "sf10 (100x) is opt-in: set SPARK_GRAFT_SF10=1 or pre-build "
            "with scripts/scaleup.py derive --factor 100"
        )
    _ensure_derived(spark, SF10_DIR, 100, skew=False)
    return SF10_DIR


@pytest.mark.parametrize("name", NAMES_100X)
def test_oracle_parity_at_100x(spark, sf10_dir, name):
    ok, msg = oracle.check_query(spark, sf10_dir, name)
    assert ok, f"{name} at 100x: {msg}"


SF1_SKEW_DIR = "/tmp/scaleup/sf1skew"

# Adversarial-skew twin (round 9): same 10x volume, worst realistic key
# shapes — 90% one event_type, Zipf(1.2) user_ids, a 60% boilerplate
# corpus collapsing into one LSH band bucket and one SemDeDup cluster
# (scripts/scaleup.py derive --skew). Parity here covers the CAP-FREE
# salted paths; the capped pair-generators (dedup_minhash_pairs,
# dedup_semdedup) intentionally diverge from their all-pairs oracles
# once a bucket exceeds its cap — for those the skew study asserts
# bounded wall-clock and straggler ratio instead (scaleup.py skewbench,
# recorded in SCALE.md).
NAMES_SKEW = [
    "events_value_by_type_salted",
    "events_tier_salted_join",
    "training_shard_assignment",
    "events_sessionize",
    "latest_event_per_user",
]


@pytest.fixture(scope="session")
def sf1skew_dir(spark) -> str:
    _ensure_derived(spark, SF1_SKEW_DIR, 10, skew=True)
    return SF1_SKEW_DIR


@pytest.mark.parametrize("name", NAMES_SKEW)
def test_oracle_parity_at_10x_skewed(spark, sf1skew_dir, name):
    ok, msg = oracle.check_query(spark, sf1skew_dir, name)
    assert ok, f"{name} at 10x skewed: {msg}"
