"""Mega-bucket cap property tests for MinHash-LSH candidate pairs.

The cap (``operators/dedup.py MEGA_BUCKET_CAP``) must (a) leave the pair
set bit-identical to the uncapped expansion on normal corpora, and
(b) bound the in-bucket pair expansion on an adversarial corpus where
every document collides into one giant band bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.operators.dedup import (
    MEGA_BUCKET_CAP,
    dedup_minhash_signatures,
    minhash_candidate_pairs,
    shingle_rows,
    minhash_signatures,
)


def _pair_set(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_cap_is_noop_on_normal_corpus(spark, smoke_dir):
    sig = dedup_minhash_signatures(spark, smoke_dir)
    capped = _pair_set(minhash_candidate_pairs(sig))
    uncapped = _pair_set(minhash_candidate_pairs(sig, cap=1_000_000_000))
    assert capped == uncapped and len(capped) > 0


@pytest.fixture(scope="module")
def adversarial_sig(spark):
    """500 near-identical documents — boilerplate-heavy crawl shape: every
    doc shares the same shingle set (one word of drift), so all 500 land
    in the same bucket in every band."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{base} token{i % 3}") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return minhash_signatures(shingle_rows(docs))


def test_adversarial_corpus_expansion_is_bounded(adversarial_sig):
    """Uncapped, ~3 distinct shingle-sets of ~167 docs each would expand
    ~3 * 167²/2 ≈ 41k pairs per band. The cap splits each bucket into
    ceil(|bucket|/cap) salted groups, bounding expansion to ~|bucket|*cap.
    Assert the bound and that every emitted pair is from the uncapped set.
    """
    capped = minhash_candidate_pairs(adversarial_sig)
    uncapped = minhash_candidate_pairs(adversarial_sig, cap=1_000_000_000)
    capped_set, uncapped_set = _pair_set(capped), _pair_set(uncapped)
    assert capped_set <= uncapped_set
    assert len(capped_set) > 0
    # per sub-group at most cap*(cap-1)/2 pairs; a 167-doc bucket splits
    # into ceil(167/64)=3 groups -> <= 3 * 64*63/2 = 6048 pairs/bucket,
    # vs 13861 uncapped — assert the emitted set is materially smaller
    # and within the structural bound.
    n_buckets = 3  # distinct shingle-sets in the adversarial corpus
    per_bucket_bound = -(-167 // MEGA_BUCKET_CAP) * (
        MEGA_BUCKET_CAP * (MEGA_BUCKET_CAP - 1) // 2
    )
    assert len(capped_set) <= n_buckets * per_bucket_bound
    assert len(capped_set) < len(uncapped_set)


def test_capped_pairs_deterministic(adversarial_sig):
    a = _pair_set(minhash_candidate_pairs(adversarial_sig))
    b = _pair_set(minhash_candidate_pairs(adversarial_sig))
    assert a == b


def test_semdedup_every_duplicate_group_keeps_a_survivor(spark, sf_dir):
    """The drop rule ('drop x iff a peer with cosine >= tau is strictly
    lower in (centroid-cosine, vec_id) order') must never empty a
    duplicate group: the group's global minimum under that order has no
    dominating peer.  Cross-check dedup_semdedup's per-label kept counts
    against the pair graph from dedup_embedding_pairs (same tau, same
    label blocking): every label that has at least one pair must still
    keep >= 1 item, and labels with no pairs must keep everything.
    """
    from deg04_local_data_lake_spark.operators.dedup import (
        dedup_embedding_pairs,
        dedup_semdedup,
    )

    sem = {r["label"]: r for r in dedup_semdedup(spark, sf_dir).collect()}
    pairs = dedup_embedding_pairs(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lbl = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    labels_with_pairs = {lbl[r["vec_a"]] for r in pairs.collect()}
    assert sem, "semdedup returned no rows"
    for label, row in sem.items():
        assert row["n_kept"] >= 1, f"label {label} lost every member"
        assert row["n_kept"] + row["n_dropped"] == row["n_items"]
        if label not in labels_with_pairs:
            assert row["n_dropped"] == 0, f"label {label} dropped without pairs"
    # the synthetic corpus at this tau must actually exercise the drop path
    assert any(row["n_dropped"] > 0 for row in sem.values())


# ---------------------------------------------------- SemDeDup cluster cap


@pytest.fixture(scope="module")
def mega_cluster_emb(spark):
    """500 near-identical embeddings in ONE cluster — the degenerate
    corpus (near-constant embeddings / a k-means that never separated)
    whose in-cluster pair join would go quadratic without the cap."""
    dim = 8
    rows = [
        (i, 0, [1.0] * (dim - 1) + [1.0 + (i % 5) * 1e-4])
        for i in range(500)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )


def test_semdedup_cap_is_noop_on_normal_corpus(spark, sf_dir):
    from deg04_local_data_lake_spark.operators.dedup import (
        semdedup_drop_counts,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    capped = {tuple(r) for r in semdedup_drop_counts(emb).collect()}
    uncapped = {
        tuple(r)
        for r in semdedup_drop_counts(
            emb, cluster_cap=1_000_000_000
        ).collect()
    }
    assert capped == uncapped and len(capped) > 0


def test_semdedup_mega_cluster_is_salted_and_bounded(mega_cluster_emb):
    """Above the cap the 500-vector cluster splits into ceil(500/cap)
    sub-groups: every sub-group keeps >= 1 survivor (so n_kept is at
    least nsub, at most nsub * distinct-duplicate-groups), dropped
    strictly exceeds zero (the corpus is all near-dups), and the result
    is deterministic across runs."""
    from deg04_local_data_lake_spark.operators.dedup import (
        SEM_CLUSTER_CAP,
        semdedup_drop_counts,
    )

    cap = 64  # force several sub-groups without a 500² join
    rows = semdedup_drop_counts(mega_cluster_emb, cluster_cap=cap).collect()
    assert len(rows) == 1
    row = rows[0]
    nsub = -(-500 // cap)
    assert row["n_items"] == 500
    assert row["n_dropped"] > 0, "near-dup corpus must drop members"
    assert row["n_kept"] >= 1
    # each of the nsub salted sub-groups independently keeps at least
    # its own (csim, vec_id)-minimum, and at most its 5 drift variants
    assert nsub <= row["n_kept"] <= nsub * 5
    again = semdedup_drop_counts(
        mega_cluster_emb, cluster_cap=cap
    ).collect()[0]
    assert tuple(row) == tuple(again)


def test_semdedup_capped_drops_subset_of_uncapped(mega_cluster_emb):
    """Salting only REMOVES cross-sub-group pairs: the capped drop count
    never exceeds the uncapped one (lossy-but-bounded, exactly the
    MinHash mega-bucket trade)."""
    from deg04_local_data_lake_spark.operators.dedup import (
        semdedup_drop_counts,
    )

    capped = semdedup_drop_counts(
        mega_cluster_emb, cluster_cap=64
    ).collect()[0]
    uncapped = semdedup_drop_counts(
        mega_cluster_emb, cluster_cap=1_000_000_000
    ).collect()[0]
    assert capped["n_dropped"] <= uncapped["n_dropped"]
    assert capped["n_kept"] >= uncapped["n_kept"]
    assert uncapped["n_kept"] >= 1
