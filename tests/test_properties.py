"""Property-based tests (hypothesis) for the composite operators —
invariants that hold for ANY input, not just the fixtures:

- CDC upsert: idempotent; empty increment is identity; result keys =
  base ∪ inc keys.
- as-of join: matches a pure-Python reference implementation.

Examples are kept small and few — each example is a Spark job.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from deg04_local_data_lake_spark.operators.asof import asof_join
from deg04_local_data_lake_spark.operators.cdc import cdc_upsert

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(0, 6),                      # id
        st.one_of(st.none(), st.text("ab", max_size=2)),  # name
        st.integers(0, 100),                    # v
    ),
    max_size=6,
    unique_by=lambda r: r[0],
)


@given(base=rows, inc=rows)
@settings(**_SETTINGS)
def test_cdc_upsert_properties(spark, base, inc):
    schema = "id int, name string, v int"
    bdf = spark.createDataFrame(base, schema)
    idf = spark.createDataFrame(inc, schema)
    cols = ["name", "v"]

    once = sorted(map(tuple, cdc_upsert(bdf, idf, "id", cols).collect()))

    # keys = union of key sets
    assert {r[0] for r in once} == {r[0] for r in base} | {r[0] for r in inc}

    # inc rows win wherever non-null; base fills the rest
    base_by, inc_by = {r[0]: r for r in base}, {r[0]: r for r in inc}
    for rid, name, v in once:
        b, i = base_by.get(rid), inc_by.get(rid)
        if i and b:
            assert name == (i[1] if i[1] is not None else b[1])
            assert v == i[2]
        elif i:
            assert (name, v) == (i[1], i[2])
        else:
            assert (name, v) == (b[1], b[2])

    # idempotence: applying the same increment again changes nothing
    merged = spark.createDataFrame([tuple(r) for r in once], schema)
    twice = sorted(map(tuple, cdc_upsert(merged, idf, "id", cols).collect()))
    assert twice == once

    # empty increment is identity on the base
    empty = spark.createDataFrame([], schema)
    same = sorted(map(tuple, cdc_upsert(bdf, empty, "id", cols).collect()))
    assert same == sorted(map(tuple, base))


ts_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 99)),
    max_size=8,
    unique_by=lambda r: (r[0], r[1]),
)


@given(left=ts_rows, right=ts_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_reference(spark, left, right):
    def t(m):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)

    ldf = spark.createDataFrame(
        [(k, t(m), v) for k, m, v in left], "k int, ts timestamp, lv int"
    )
    rdf = spark.createDataFrame(
        [(k, t(m), v) for k, m, v in right], "k int, ts timestamp, rv int"
    )
    got = {
        (r["k"], r["ts"]): r["asof_rv"]
        for r in asof_join(ldf, rdf, key="k").collect()
    }
    for k, m, _ in left:
        candidates = [(rm, rv) for rk, rm, rv in right if rk == k and rm <= m]
        want = max(candidates)[1] if candidates else None
        assert got[(k, t(m))] == want, (k, m, candidates)


corr_rows = st.lists(
    st.tuples(
        st.floats(-1e4, 1e4, allow_nan=False, width=32),
        st.floats(-1e4, 1e4, allow_nan=False, width=32),
    ),
    min_size=3,
    max_size=40,
)


@given(data=corr_rows, n_parts=st.integers(1, 6))
@settings(**_SETTINGS)
def test_exact_corr_partition_invariant_and_close_to_numpy(
    spark, data, n_parts
):
    """exact_corr must (a) return the SAME bits under any partitioning —
    the property SQL CORR lacks — and (b) agree with numpy's float64
    corrcoef up to quantization error (inputs are quantized at 1e-4)."""
    import math

    import numpy as np

    from deg04_local_data_lake_spark.functions.portable import exact_corr

    df = spark.createDataFrame(data, "x double, y double")
    vals = [
        df.repartition(p).agg(exact_corr("x", "y").alias("c")).first()["c"]
        for p in (1, n_parts)
    ]
    assert repr(vals[0]) == repr(vals[1])  # bitwise partition invariance

    # half-AWAY-from-zero, matching Spark/DuckDB round semantics — numpy's
    # np.round is half-even and diverges exactly on .5 landings (hypothesis
    # found x=1.65625: 16562.5 → 16562 banker's vs 16563 half-up)
    def q(vals):
        v = np.array(vals) * 1e4
        return np.copysign(np.floor(np.abs(v) + 0.5), v)

    qx = q([r[0] for r in data])
    qy = q([r[1] for r in data])
    if np.std(qx) == 0 or np.std(qy) == 0:
        assert vals[0] is None
    else:
        want = float(np.corrcoef(qx, qy)[0, 1])
        assert vals[0] is not None and math.isclose(
            vals[0], want, rel_tol=1e-9, abs_tol=1e-12
        )


intervals = st.lists(
    st.tuples(
        st.integers(0, 2),    # user
        st.integers(0, 50),   # start offset, minutes
        st.integers(1, 10),   # length, minutes
    ),
    max_size=8,
)


@given(iv=intervals)
@settings(**_SETTINGS)
def test_merge_intervals_matches_reference(spark, iv):
    """The window-sweep interval union equals the obvious sequential merge
    for ANY interval set — including touching endpoints (which merge: the
    sweep condition is >=), duplicates, and fully-nested intervals."""
    from deg04_local_data_lake_spark.operators.sequence import merge_intervals

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            u,
            i,
            base + datetime.timedelta(minutes=s),
            base + datetime.timedelta(minutes=s + ln),
        )
        for i, (u, s, ln) in enumerate(iv)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, s timestamp, e timestamp"
    )
    got = {
        (r.user_id, r.m_start, r.m_end, r.n_events)
        for r in merge_intervals(df).collect()
    }

    expect = set()
    by_user: dict[int, list[tuple]] = {}
    for u, i, s, e in rows:
        by_user.setdefault(u, []).append((s, i, e))
    for u, ivs in by_user.items():
        cur = None
        for s, _, e in sorted(ivs):
            if cur is None or s > cur[1]:
                if cur is not None:
                    expect.add((u, cur[0], cur[1], cur[2]))
                cur = [s, e, 1]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
        if cur is not None:
            expect.add((u, cur[0], cur[1], cur[2]))
    assert got == expect


event_seqs = st.lists(
    st.tuples(
        st.integers(0, 2),      # user
        st.integers(0, 200),    # minute offset
    ),
    max_size=10,
)


@given(ev=event_seqs)
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, ev):
    """The window-program sessionizer equals the obvious sequential scan
    for ANY event sequence: a session breaks exactly when the gap to the
    previous event of the same user exceeds 30 minutes (boundary: a gap of
    exactly 30 minutes does NOT break)."""
    from deg04_local_data_lake_spark.operators.windows import sessionize

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, i, base + datetime.timedelta(minutes=m)) for i, (u, m) in enumerate(ev)
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in sessionize(df).select("user_id", "event_id", "session_seq").collect()
    }

    expect = {}
    by_user: dict[int, list[tuple]] = {}
    for u, i, ts in rows:
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        seq, prev = 0, None
        for ts, i in sorted(evs):
            if prev is None or (ts - prev).total_seconds() > 1800:
                seq += 1
            expect[(u, i)] = seq
            prev = ts
    assert got == expect


ks_samples = st.tuples(
    st.lists(st.floats(-100, 100, allow_nan=False, width=16), min_size=1, max_size=25),
    st.lists(st.floats(-100, 100, allow_nan=False, width=16), min_size=1, max_size=25),
)


@given(samples=ks_samples)
@settings(**_SETTINGS)
def test_ks_two_sample_matches_reference(spark, samples):
    """ks_two_sample must equal the brute-force exact-integer ECDF-gap
    computation bit for bit (the statistic is one double division over
    exact integers, so there is no tolerance to hide behind)."""
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.operators.extras import ks_two_sample

    xs, ys = samples
    # brute force: scaled gap a_cum*n2 - b_cum*n1 at every distinct value
    n1, n2 = len(xs), len(ys)
    ks_num = 0
    for v in sorted(set(xs) | set(ys)):
        a_cum = sum(1 for x in xs if x <= v)
        b_cum = sum(1 for y in ys if y <= v)
        ks_num = max(ks_num, abs(a_cum * n2 - b_cum * n1))
    want = ks_num / (n1 * n2)

    df = spark.createDataFrame(
        [(float(v), "a") for v in xs] + [(float(v), "b") for v in ys],
        "value double, grp string",
    )
    row = ks_two_sample(df, "value", F.col("grp") == "a").first()
    assert (row["n1"], row["n2"], row["ks_num"]) == (n1, n2, ks_num)
    assert repr(row["ks_stat"]) == repr(want)


@given(texts=st.lists(st.text("abcxyz .!7", min_size=1, max_size=60), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_char_diversity_matches_reference(spark, texts):
    """char_diversity_col must equal the Counter-based reference bit for
    bit — including characters outside the a-z/space alphabet, which fold
    into the residual bucket — and always land in [0, 1)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.operators.text import (
        _DIVERSITY_ALPHABET,
        char_diversity_col,
    )

    def ref(t: str) -> float:
        counts = Counter(t)
        alpha = {c: counts.get(c, 0) for c in _DIVERSITY_ALPHABET}
        other = len(t) - sum(alpha.values())
        num = sum(v * v for v in alpha.values()) + other * other
        return 1.0 - num / (len(t) * len(t))

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: r["d"]
        for r in df.select("text", char_diversity_col(F.col("text")).alias("d")).collect()
    }
    for t in texts:
        assert repr(got[t]) == repr(ref(t)), t
        assert 0.0 <= got[t] < 1.0


sky_rows = st.lists(
    st.tuples(
        st.integers(0, 30),   # day offset → o_orderdate
        st.integers(0, 20),   # price (small ints force plenty of ties)
    ),
    min_size=1,
    max_size=14,
)


@given(pts=sky_rows)
@settings(**_SETTINGS)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    """pareto_frontier must return exactly the non-dominated rows under
    (date <=, price >=, strict somewhere) dominance — including same-day
    and same-price ties, where neither point dominates the other."""
    from deg04_local_data_lake_spark.operators.extras import pareto_frontier

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d), float(p))
        for i, (d, p) in enumerate(pts)
    ]

    def dominated(a, b):  # does b dominate a?
        return (
            b[1] <= a[1]
            and b[2] >= a[2]
            and (b[1] < a[1] or b[2] > a[2])
        )

    want = sorted(
        r[0] for r in rows if not any(dominated(r, o) for o in rows if o is not r)
    )

    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    got = sorted(r["o_orderkey"] for r in pareto_frontier(df).collect())
    assert got == want


corpus = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=8),
    min_size=2,
    max_size=6,
)


@given(docs=corpus, t=st.sampled_from([0.3, 0.5, 0.6, 0.8]))
# regression pin: Jaccard EXACTLY t with t·n integer — the boundary where
# the old n − floor(t·n) prefix length was one token short
@example(docs=[["a"], ["a", "b"]], t=0.5)
@settings(**_SETTINGS)
def test_prefix_jaccard_lossless_vs_bruteforce(spark, docs, t):
    """Prefix filtering must be LOSSLESS: the pair set equals brute-force
    exact Jaccard over all pairs at the same threshold, for any corpus
    and any threshold — the property the registered oracle checks on one
    corpus, here checked on many."""
    from deg04_local_data_lake_spark.operators.dedup import prefix_jaccard_pairs

    sets = {i: set(d) for i, d in enumerate(docs)}
    want = set()
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                if inter / (len(sets[a]) + len(sets[b]) - inter) >= t:
                    want.add((a, b))

    rows = [(i, tok) for i, d in enumerate(docs) for tok in sets[i]]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_jaccard_pairs(df, t).collect()
    }
    assert got == want


hll_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 40)),
    min_size=1,
    max_size=30,
)


@given(data=hll_rows)
@settings(**_SETTINGS)
def test_hll_merge_equals_recompute(spark, data):
    """Register-wise max over per-group sketches must equal the sketch
    computed directly on the union — bitwise, including the estimate —
    for ANY grouping of the input (the mergeability contract)."""
    from pyspark.sql import functions as F

    from deg04_local_data_lake_spark.operators.sketches import (
        _hll_estimate,
        _hll_registers,
    )

    df = spark.createDataFrame(data, "grp string, uid long")
    regs = _hll_registers(df, "grp", "uid")
    merged = (
        regs.groupBy("j")
        .agg(F.max("max_lb").alias("max_lb"))
        .withColumn("all", F.lit("all"))
    )
    via_merge = _hll_estimate(merged, "all").first()

    direct = _hll_estimate(
        _hll_registers(df.withColumn("all", F.lit("all")), "all", "uid"), "all"
    ).first()
    assert repr(via_merge["s_sum"]) == repr(direct["s_sum"])
    assert repr(via_merge["hll_estimate"]) == repr(direct["hll_estimate"])
    assert via_merge["v_empty"] == direct["v_empty"]


ewma_vals = st.lists(
    st.floats(0, 1000, allow_nan=False, width=32), min_size=1, max_size=12
)


@given(vals=ewma_vals)
@settings(**_SETTINGS)
def test_ewma_fold_matches_sequential_reference(spark, vals):
    """The distributed ordered fold must equal the sequential Python
    EWMA bit for bit for any value sequence — alpha=1/2 halving is exact
    in IEEE, so there is no tolerance to hide behind."""
    from deg04_local_data_lake_spark.operators.finance import ewma_halving

    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "order_date date, revenue double")
    got = {
        r["order_date"]: r["ewma"] for r in ewma_halving(df).collect()
    }

    acc = 0.0
    for d, v in rows:
        acc = acc * 0.5 + v
        assert repr(got[d]) == repr(acc)


# --------------------------------------------------------------------------
# Heavy hitters: the phase-1 local threshold (keep tok iff local_count·32 ≥
# local_rows) must never lose a TRUE global heavy hitter, for ANY way the
# rows are split across partitions — the averaging argument
# (operators/sketches.py heavy_hitters_tokens) as executable spec. Pure
# Python: the property is about the pruning rule, not the Spark plumbing
# (which tests/test_parity.py checks end-to-end against the naive oracle).
# --------------------------------------------------------------------------

hh_tokens = st.lists(st.integers(0, 5), min_size=1, max_size=60)
hh_cuts = st.lists(st.integers(0, 59), max_size=4)


@given(toks=hh_tokens, cuts=hh_cuts)
@settings(max_examples=200, deadline=None)
def test_heavy_hitter_local_threshold_is_superset(toks, cuts):
    from collections import Counter

    from deg04_local_data_lake_spark.operators.sketches import HH_DENOM

    n = len(toks)
    true_hh = {t for t, c in Counter(toks).items() if c * HH_DENOM >= n}

    bounds = sorted({0, n, *[c for c in cuts if c <= n]})
    candidates = set()
    for lo, hi in zip(bounds, bounds[1:]):
        part = toks[lo:hi]
        rows = len(part)
        for t, c in Counter(part).items():
            if c * HH_DENOM >= rows:
                candidates.add(t)
    assert true_hh <= candidates


# --------------------------------------------------------------------------
# Bloom decontamination: no false negatives for ANY train/eval corpus —
# pure-Python replication of the md5 bit positions (the exact logic in
# operators/llm_extras.py bloom_decontamination_audit).
# --------------------------------------------------------------------------

def _bloom_positions(text: str, k: int, m: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"b{i}:{text}".encode()).hexdigest()[:12], 16) % m
        for i in range(k)
    ]


bloom_texts = st.lists(st.text("abcd ", min_size=0, max_size=8), min_size=1, max_size=30)


@given(train=bloom_texts, eval_=bloom_texts)
@settings(max_examples=100, deadline=None)
def test_bloom_no_false_negatives_pure(train, eval_):
    from deg04_local_data_lake_spark.operators.llm_extras import BLOOM_K, BLOOM_M

    bits = set()
    for t in train:
        bits.update(_bloom_positions(t, BLOOM_K, BLOOM_M))
    for e in eval_:
        if e in set(train):  # exact member ⇒ all its bits are set
            assert all(p in bits for p in _bloom_positions(e, BLOOM_K, BLOOM_M))


# --------------------------------------------------------------------------
# Count-min: estimate ≥ exact for any key set, and cell-wise SUM of
# per-partition sketches equals the whole sketch, for ANY partitioning —
# pure-Python replication of the md5 bucket (operators/sketches.py).
# --------------------------------------------------------------------------

def _cm_bucket(d: int, key: int, width: int) -> int:
    import hashlib

    return int(hashlib.md5(f"cm{d}:{key}".encode()).hexdigest()[:12], 16) % width


cm_keys = st.lists(st.integers(0, 9), min_size=1, max_size=60)
cm_cut = st.integers(0, 59)


@given(keys=cm_keys, cut=cm_cut)
@settings(max_examples=100, deadline=None)
def test_cm_sketch_invariants_pure(keys, cut):
    from collections import Counter

    from deg04_local_data_lake_spark.operators.sketches import CM_DEPTH, CM_WIDTH

    def cells(ks):
        c: dict = {}
        for k in ks:
            for d in range(CM_DEPTH):
                cell = (d, _cm_bucket(d, k, CM_WIDTH))
                c[cell] = c.get(cell, 0) + 1
        return c

    whole = cells(keys)
    # merge = cell-wise sum over any split
    lo, hi = cells(keys[: min(cut, len(keys))]), cells(keys[min(cut, len(keys)):])
    merged: dict = dict(lo)
    for cell, n in hi.items():
        merged[cell] = merged.get(cell, 0) + n
    assert merged == whole
    # never undercount
    exact = Counter(keys)
    for k, n in exact.items():
        est = min(whole[(d, _cm_bucket(d, k, CM_WIDTH))] for d in range(CM_DEPTH))
        assert est >= n


# --------------------------------------------------------------------------
# SCD2 temporal join: the half-open version intervals partition each
# user's timeline, so EVERY fact at/after the user's first change matches
# exactly ONE version — for any event set, including equal-timestamp
# changes (zero-length versions match nothing).
# --------------------------------------------------------------------------

scd_events = st.lists(
    st.tuples(
        st.integers(0, 2),          # user
        st.integers(0, 5),          # coarse ts (collisions likely)
        st.sampled_from(["a", "b", "p"]),  # state stream incl. 'p' facts
    ),
    min_size=1,
    max_size=12,
)


@given(ev=scd_events)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_interval_partition_unique_match(spark, ev):
    import datetime

    from pyspark.sql import functions as F

    rows = [
        (i, u, datetime.datetime(2024, 1, 1, 0, t), typ)
        for i, (u, t, typ) in enumerate(ev)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    w_rows = df.collect()
    # reference: per user, ordered changes (compact consecutive dups)
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in sorted(w_rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        per_user[r.user_id].append(r)
    SENTINEL = datetime.datetime(2099, 1, 1)
    versions = defaultdict(list)  # user -> [(from, to)]
    for u, rs in per_user.items():
        changes = []
        prev = None
        for r in rs:
            if prev is None or r.event_type != prev:
                changes.append(r)
            prev = r.event_type
        for i, c in enumerate(changes):
            end = changes[i + 1].ts if i + 1 < len(changes) else SENTINEL
            versions[u].append((c.ts, end))
    # property: every event matches exactly one [from, to) interval
    for r in w_rows:
        n = sum(1 for lo, hi in versions[r.user_id] if lo <= r.ts < hi)
        assert n == 1, (r, versions[r.user_id])
