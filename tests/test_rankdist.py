"""Equivalence tests for the distributed rank-selection machinery.

``operators/rankdist.py`` must produce bit-identical ranks / running sums
/ NTILE assignments to the single-partition ``Window.orderBy`` it
replaces — on real testdata, on adversarial point-mass data (every
leading key equal, so all rows share one cutpoint bucket), and on
degenerate sizes (empty, N < n_tiles)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.operators import rankdist as R


@pytest.fixture(scope="module")
def events(spark, smoke_dir):
    return spark.read.parquet(f"{smoke_dir}/events.parquet").select(
        "event_type", "event_id", "value"
    )


def _mismatches(got, want, on, cols):
    cond = None
    for g, w in cols:
        c = F.col(g) != F.col(w)
        cond = c if cond is None else (cond | c)
    return got.join(want, on).filter(cond).count()


def test_ungrouped_rank_matches_global_window(events):
    got = R.with_global_ranks(events, ["value", "event_id"]).select(
        "event_id", R.RANK, R.N
    )
    w = Window.orderBy("value", "event_id")
    want = events.select(
        "event_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    assert _mismatches(got, want, "event_id", [(R.RANK, "rn"), (R.N, "n")]) == 0


def test_grouped_rank_matches_partitioned_window(events):
    got = R.with_global_ranks(
        events, ["value", "event_id"], group_by=["event_type"]
    ).select("event_id", R.RANK, R.N)
    w = Window.partitionBy("event_type")
    want = events.select(
        "event_id",
        F.row_number().over(w.orderBy("value", "event_id")).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
    )
    assert _mismatches(got, want, "event_id", [(R.RANK, "rn"), (R.N, "n")]) == 0


def test_weighted_cumsum_matches_global_window(events):
    ev = events.withColumn("wt", (F.col("value") * 100).cast("bigint"))
    got = R.with_global_ranks(ev, ["value", "event_id"], weight="wt").select(
        "event_id", R.CUMW, R.TOTW
    )
    w = Window.orderBy("value", "event_id")
    want = ev.select(
        "event_id",
        F.sum("wt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cumw"),
        F.sum("wt").over(Window.partitionBy()).alias("tot"),
    )
    assert _mismatches(got, want, "event_id", [(R.CUMW, "cumw"), (R.TOTW, "tot")]) == 0


def test_descending_order_with_bucket_expr(events):
    got = R.with_global_ranks(
        events,
        [F.col("value").desc(), "event_id"],
        bucket_by=-F.col("value"),
    ).select("event_id", R.RANK)
    want = events.select(
        "event_id",
        F.row_number()
        .over(Window.orderBy(F.col("value").desc(), "event_id"))
        .cast("bigint")
        .alias("rn"),
    )
    assert _mismatches(got, want, "event_id", [(R.RANK, "rn")]) == 0


def test_ntile_matches_window_ntile(events):
    for k in (4, 10, 7):
        got = R.with_global_ntile(events, ["value", "event_id"], k, "tile").select(
            "event_id", "tile"
        )
        want = events.select(
            "event_id",
            F.ntile(k).over(Window.orderBy("value", "event_id")).alias("nt"),
        )
        assert _mismatches(got, want, "event_id", [("tile", "nt")]) == 0, k


def test_point_mass_ties_still_exact(spark):
    """Adversarial corpus: ONE leading-key value for every row — all rows
    land in a single cutpoint bucket (the documented skew bound), yet the
    tiebreak keeps ranks exact."""
    df = spark.range(500).select(
        F.lit(1.0).alias("v"), F.col("id").alias("tiebreak")
    )
    got = R.with_global_ranks(df, ["v", "tiebreak"]).select("tiebreak", R.RANK, R.N)
    rows = got.collect()
    assert len(rows) == 500
    assert all(r[R.N] == 500 for r in rows)
    assert sorted(r[R.RANK] for r in rows) == list(range(1, 501))
    by_tiebreak = sorted(rows, key=lambda r: r["tiebreak"])
    assert [r[R.RANK] for r in by_tiebreak] == list(range(1, 501))


def test_small_and_empty_frames(spark, events):
    small = events.limit(3)
    got = R.with_global_ntile(small, ["value", "event_id"], 10, "tile").select(
        "event_id", "tile"
    )
    want = small.select(
        "event_id", F.ntile(10).over(Window.orderBy("value", "event_id")).alias("nt")
    )
    assert _mismatches(got, want, "event_id", [("tile", "nt")]) == 0
    empty = events.filter(F.lit(False))
    assert R.with_global_ranks(empty, ["value", "event_id"]).count() == 0


def test_no_rsel_columns_leak(events):
    out = R.with_global_ntile(events, ["value", "event_id"], 4, "tile")
    leaked = [c for c in out.columns if c.startswith("_rsel_")]
    assert not leaked, leaked
