"""Distributed exact rank selection — no single-partition sorts.

An unpartitioned ``Window.orderBy`` (global NTILE / row_number / running
sum) forces every row into ONE task: correct at test scale, fatal at
100 TB. This module provides the bucketed two-level replacement used by
every rank-selection query in the registry — the "approx-quantile
cutpoints + exact refine" design:

1. **Cutpoints** (approximate, cheap): ``percentile_approx`` of the
   leading sort key yields ``n_buckets - 1`` split values per group — a
   kilobyte-sized frame, broadcast. Cut *values* only affect load
   balance, never results (step 3 refines exactly), so the sketch's
   approximation is harmless.
2. **Map-side bucketing**: each row's bucket id is the number of cuts
   ≤ its key — a monotone function of the leading sort key, so bucket
   order is consistent with the total order and each bucket holds one
   contiguous key range of ~N/n_buckets rows.
3. **Exact local rank** per ``(group, bucket)``: an ordinary partitioned
   window — every task sorts only its own bucket.
4. **Offsets**: per-bucket row counts reduce to a tiny frame
   (|groups| x |buckets| rows); a prefix sum in bucket order gives each
   bucket's global offset, broadcast-joined back.
   ``global rank = offset + local rank`` — exact and deterministic.

Why cutpoints instead of ``repartitionByRange`` + partition ids: the
bucket id is a *deterministic expression over row values*, so the two
plan branches that consume the bucketed frame (the rank window and the
counts aggregate) can never disagree — Spark reuses the broadcast cuts
exchange (canonically equal deterministic subplans; asserted as
``ReusedExchange`` in ``tests/test_plans.py``), and even an independent
recomputation yields identical buckets for ranking purposes.
``spark_partition_id()`` by contrast is nondeterministic, which both
defeats exchange reuse *and* lets the branches see different ids — the
failure mode this module exists to avoid.

Requirements: ``order_by`` must be a total order (include a unique
tiebreak column) on non-null columns, and its leading key (or the
explicit ``bucket_by`` expression) must be numeric. Skew bound: rows
with *equal* leading-key values share a bucket, so a point mass of M
duplicates bounds one task at M rows (the tiebreak cannot split them
without giving up deterministic bucketing) — acceptable for continuous
keys (prices, values, timestamps); for tie-heavy domains pre-aggregate
per key first (weights), which every caller with such a domain does.

Reference anchor: the reference delegates all execution to Spark and
ships no ranking operators (SURVEY.md §2.7); this module keeps the
engine's exact-selection oracles scale-safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Column names are prefixed ``_rsel_`` so plan tests can recognize the
#: machinery; none of them survive into caller-visible output.
BUCKET = "_rsel_b"
GRP = "_rsel_g"
RANK = "_rsel_rank"
N = "_rsel_n"
CUMW = "_rsel_cumw"
TOTW = "_rsel_totw"
_CUTS = "_rsel_cuts"
_LRANK = "_rsel_lrank"
_LCUMW = "_rsel_lcumw"
_CNT = "_rsel_cnt"
_W = "_rsel_w"
_OFF = "_rsel_off"
_WOFF = "_rsel_woff"


def _cols(spec: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in spec]


#: Target rows per bucket for the adaptive bucket count: below this,
#: extra buckets only add per-partition and broadcast-row overhead.
ROWS_PER_BUCKET = 50_000


def with_global_ranks(
    df: DataFrame,
    order_by: Sequence[str | Column],
    *,
    bucket_by: str | Column | None = None,
    group_by: Sequence[str] = (),
    weight: str | None = None,
    n_buckets: int = 256,
    accuracy: int = 2_000,
) -> DataFrame:
    """Add exact global-order rank columns without a global sort.

    Appends to ``df``:

    - ``_rsel_rank`` (bigint): ``row_number()`` over ``order_by`` within
      each ``group_by`` group (1-based, exact).
    - ``_rsel_n`` (bigint): the group's total row count.
    - ``_rsel_cumw`` / ``_rsel_totw`` (if ``weight``): running and total
      sum of ``weight`` in the same order.

    ``bucket_by`` is a numeric expression whose ascending order agrees
    with ``order_by``'s total order (defaults to ``order_by[0]``, which
    must then be an ascending column; pass e.g. ``-F.col(k)`` for a
    descending leading key). ``group_by`` is for low-cardinality
    skew-prone groups whose members must not land on one task
    (high-cardinality groups should use a plain partitioned window —
    no skew, one shuffle).

    **Adaptive bucket count, zero extra passes**: the cuts aggregation
    also computes ``count(*)``, and the number of cuts actually USED is
    ``min(n_buckets, max(8, ⌈count/ROWS_PER_BUCKET⌉))`` — selected from
    the full cut array by pure column expressions over the (broadcast,
    ≤|groups|-row) cuts frame. Small inputs skip most of the bucketing
    overhead (the r3 wide bench measured 3–5 s of constant factor at
    sf0.1); at scale the count grows and the full ``n_buckets``
    resolution kicks back in. Everything stays deterministic
    expressions, so the two consumers of the bucketed frame still
    canonically agree and the exchange is still reused.
    """
    group_cols = list(group_by)
    order_cols = _cols(order_by)
    if bucket_by is None:
        first = order_by[0]
        if not isinstance(first, str):
            raise ValueError("bucket_by is required when order_by[0] is an expression")
        bucket_by = first
    bkey = (F.col(bucket_by) if isinstance(bucket_by, str) else bucket_by).cast("double")

    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_aggs = [
        F.percentile_approx(bkey, probs, accuracy).alias(_CUTS),
        F.count(F.lit(1)).alias(_CNT),
    ]
    # Adaptive cut selection (see docstring): every ⌈n_buckets/nb⌉-th cut
    # of the full array, where nb derives from the group's row count —
    # all expressions over the tiny cuts frame, no driver round-trip.
    nb = F.least(
        F.lit(n_buckets),
        F.greatest(F.lit(8), F.ceil(F.col(_CNT) / F.lit(ROWS_PER_BUCKET))),
    )
    used_cuts = F.transform(
        F.sequence(F.lit(1).cast("bigint"), nb - 1),
        lambda i: F.element_at(
            F.col(_CUTS), F.floor(i * n_buckets / nb).cast("int")
        ),
    )
    if group_cols:
        cuts = df.groupBy(*group_cols).agg(*cuts_aggs)
        bucketed = df.join(F.broadcast(cuts), on=group_cols)
    else:
        # Constant equi-join key keeps this a BroadcastHashJoin (a 1-row
        # crossJoin would plan a nested-loop join).
        cuts = df.agg(*cuts_aggs).withColumn(GRP, F.lit(1))
        bucketed = df.withColumn(GRP, F.lit(1)).join(F.broadcast(cuts), on=GRP)
    bucketed = bucketed.withColumn(
        BUCKET,
        F.coalesce(F.size(F.filter(used_cuts, lambda c: c <= bkey)), F.lit(0)),
    ).drop(_CUTS, _CNT, *([] if group_cols else [GRP]))

    w_local = Window.partitionBy(*(group_cols + [BUCKET])).orderBy(*order_cols)
    ranked = bucketed.withColumn(_LRANK, F.row_number().over(w_local).cast("bigint"))
    if weight is not None:
        ranked = ranked.withColumn(
            _LCUMW,
            F.sum(weight).over(w_local.rowsBetween(Window.unboundedPreceding, 0)),
        )

    aggs = [F.count(F.lit(1)).cast("bigint").alias(_CNT)]
    if weight is not None:
        aggs.append(F.sum(weight).alias(_W))
    counts = bucketed.groupBy(*(group_cols + [BUCKET])).agg(*aggs)

    # Tiny frame (|groups| x |buckets| rows): prefix-sum offsets per
    # group in bucket order. GRP=lit(1) keeps the window partitioned
    # even ungrouped (no unpartitioned Window node anywhere).
    gkey = group_cols or [GRP]
    if not group_cols:
        counts = counts.withColumn(GRP, F.lit(1))
    w_off = Window.partitionBy(*gkey).orderBy(BUCKET)
    w_grp = Window.partitionBy(*gkey)
    zero = F.lit(0).cast("bigint")
    off_cols = [
        F.coalesce(
            F.sum(_CNT).over(w_off.rowsBetween(Window.unboundedPreceding, -1)), zero
        ).alias(_OFF),
        F.sum(_CNT).over(w_grp).cast("bigint").alias(N),
    ]
    if weight is not None:
        off_cols += [
            F.sum(_W).over(w_off.rowsBetween(Window.unboundedPreceding, -1)).alias(
                _WOFF
            ),
            F.sum(_W).over(w_grp).alias(TOTW),
        ]
    offsets = counts.select(*group_cols, BUCKET, *off_cols)

    out = (
        ranked.join(F.broadcast(offsets), on=group_cols + [BUCKET])
        .withColumn(RANK, F.col(_OFF) + F.col(_LRANK))
        .drop(BUCKET, _LRANK, _OFF)
    )
    if weight is not None:
        out = out.withColumn(
            CUMW, F.coalesce(F.col(_WOFF), F.lit(0)) + F.col(_LCUMW)
        ).drop(_LCUMW, _WOFF)
    return out


def with_global_ntile(
    df: DataFrame,
    order_by: Sequence[str | Column],
    n_tiles: int,
    out_col: str,
    *,
    bucket_by: str | Column | None = None,
    group_by: Sequence[str] = (),
    n_buckets: int = 256,
) -> DataFrame:
    """Exact ``NTILE(n)`` over a total order, distributed; with
    ``group_by``, an independent NTILE per group (several metrics can
    share ONE rank pass by melting to (group, value) rows).

    Standard NTILE semantics (first ``N % n`` tiles get the extra row),
    computed map-side from the exact global rank: with ``q = N div n``
    and ``rem = N mod n``, ranks up to ``(q+1)*rem`` fall in tile
    ``ceil(r / (q+1))``, the rest in ``rem + ceil((r - (q+1)*rem) / q)``.
    ``floor`` on a double division is exact here (ranks < 2^52).
    """
    ranked = with_global_ranks(
        df, order_by, bucket_by=bucket_by, group_by=group_by, n_buckets=n_buckets
    )
    r, n = F.col(RANK), F.col(N)
    q = F.floor(n / n_tiles)
    rem = n % n_tiles
    big = q + F.lit(1)
    small = F.greatest(q, F.lit(1))  # guard the unused branch when N < n
    tile = (
        F.when(r <= big * rem, F.floor((r + big - F.lit(1)) / big))
        .otherwise(rem + F.floor((r - big * rem + small - F.lit(1)) / small))
        .cast("int")
    )
    return ranked.withColumn(out_col, tile).drop(RANK, N)
