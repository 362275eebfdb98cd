"""Tests for oracle.py's driver-mirror canonicalization gate.

Round 3 post-mortem: the local gate normalized list cells to tuples, so a
query emitting a raw ``array<double>`` column passed locally but crashed
the external driver's pandas ``sort_values`` canonicalization
(``TypeError: unhashable type: 'list'`` — CORRECTNESS_r03
``normalize_embeddings``). ``driver_canonical_hash`` now replays the
driver's exact pipeline; these tests pin the behaviors that closed the gap.
"""

from __future__ import annotations

import datetime

import pytest

from deg04_local_data_lake_spark.oracle import driver_canonical_hash


def test_list_cell_raises_like_the_driver():
    with pytest.raises(TypeError):
        driver_canonical_hash(["a", "vec"], [(1, [0.1, 0.2]), (2, [0.3])])


def test_scalar_rows_hash_order_insensitively():
    rows = [(2, "y"), (1, "x"), (3, None)]
    a = driver_canonical_hash(["k", "s"], rows)
    b = driver_canonical_hash(["k", "s"], list(reversed(rows)))
    assert a == b


def test_hash_detects_value_difference():
    a = driver_canonical_hash(["k"], [(1,), (2,)])
    b = driver_canonical_hash(["k"], [(1,), (3,)])
    assert a != b


def test_nan_and_datetime_normalize_deterministically():
    rows = [
        (float("nan"), datetime.datetime(2024, 1, 1, 12)),
        (1.5, datetime.datetime(2024, 1, 2, 0)),
    ]
    assert driver_canonical_hash(["v", "ts"], rows) == driver_canonical_hash(
        ["v", "ts"], [rows[1], rows[0]]
    )


def test_bytearray_cells_hash_as_bytes():
    a = driver_canonical_hash(["b"], [(bytearray(b"ab"),)])
    b = driver_canonical_hash(["b"], [(b"ab",)])
    assert a == b


def test_empty_result_hashes():
    assert driver_canonical_hash(["k", "v"], []) == driver_canonical_hash(
        ["k", "v"], []
    )


# ---------------------------------------------------------------------------
# Result-type lint (round 6): both round-5 reds were HUGEINT/DECIMAL output
# columns that materialize as float64 on DuckDB's pandas path but
# object-dtype Decimal on Spark's Arrow path — equal values, different hash.
# The lint rejects the class at bind time, on either engine's side.
# ---------------------------------------------------------------------------


def test_lint_rejects_hugeint_oracle(spark):
    import duckdb

    from deg04_local_data_lake_spark.oracle import lint_result_types

    con = duckdb.connect()
    df = spark.range(1).selectExpr("CAST(id AS BIGINT) AS s")
    # DuckDB SUM over integers yields HUGEINT — the exact q12 red.
    msg = lint_result_types(df, con, "SELECT SUM(x) AS s FROM (SELECT 1 AS x)")
    assert msg is not None and "HUGEINT" in msg
    # DECIMAL output — the exact orders_filter_project red.
    msg = lint_result_types(df, con, "SELECT CAST(1.5 AS DECIMAL(18,4)) AS s")
    assert msg is not None and "DECIMAL" in msg
    # Casting to BIGINT/DOUBLE clears both.
    ok = lint_result_types(
        df, con, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT 1 AS x)"
    )
    assert ok is None
    con.close()


def test_lint_rejects_spark_decimal_schema(spark):
    import duckdb

    from deg04_local_data_lake_spark.oracle import lint_result_types

    con = duckdb.connect()
    df = spark.range(1).selectExpr("CAST(id AS DECIMAL(18,4)) AS amount")
    msg = lint_result_types(df, con, "SELECT 1 AS amount")
    assert msg is not None and "DecimalType" in msg
    # Nested decimal is caught too.
    df2 = spark.range(1).selectExpr(
        "named_struct('a', CAST(id AS DECIMAL(10,2))) AS s"
    )
    assert lint_result_types(df2, con, None) is not None
    con.close()


def test_all_registered_oracles_pass_type_lint():
    """Bind-time sweep: no registered oracle emits HUGEINT/DECIMAL."""
    from deg04_local_data_lake_spark import registry
    from deg04_local_data_lake_spark.oracle import (
        _banned_duckdb_type,
        duckdb_connect,
    )

    con = duckdb_connect("/root/testdata/sf0.001")
    offenders = []
    for name, sql in registry.oracles().items():
        rel = con.sql(sql)
        off = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, map(str, rel.types))
            if _banned_duckdb_type(str(t))
        ]
        if off:
            offenders.append((name, off))
    con.close()
    assert offenders == []


def test_priority_is_computed():
    """VERDICT r9 task #5 (+ r10 task #2): the PRIORITY rotation list
    must BE the computation over the CORRECTNESS history it was frozen
    against — never-attested additions first, then ascending last-green
    round, ties alphabetical. The computation is pinned to rounds <
    PRIORITY_AS_OF so the driver dropping the CURRENT round's recording
    does not retroactively redefine the frozen window (that made the
    suite red at every handoff through round 10). A hand edit that
    drifts from history fails here instead of surfacing as a judge
    finding."""
    from deg04_local_data_lake_spark import registry

    computed = registry.compute_priority()  # pinned to PRIORITY_AS_OF
    assert registry.PRIORITY == computed[:len(registry.PRIORITY)]
    assert len(registry.PRIORITY) >= 50  # must cover the driver's sample
    # the window really is the stalest: everything in the front 50 is
    # either never-attested or no fresher than anything outside it
    hist = registry.last_green_rounds(max_round=registry.PRIORITY_AS_OF)
    window = set(computed[:50])
    newest_inside = max(hist.get(n, 0) for n in window)
    oldest_outside = min(hist[n] for n in computed[50:] if n in hist)
    assert newest_inside <= oldest_outside


def test_every_query_has_an_oracle_or_documented_exception():
    """308/308: every registered query ships an oracle twin."""
    from deg04_local_data_lake_spark import registry

    qs, os_ = registry.queries(), registry.oracles()
    assert set(qs) == set(os_), sorted(set(qs) ^ set(os_))


def test_priority_stable_when_driver_drops_next_recording(tmp_path):
    """The handoff property itself (VERDICT r10 task #2): shipping a
    CORRECTNESS file from round PRIORITY_AS_OF (or later) must not
    change the computation the frozen literal is checked against —
    that's exactly what happened at every handoff through round 10."""
    import glob
    import json
    import os
    import shutil

    from deg04_local_data_lake_spark import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / os.path.basename(p))
    before = registry.compute_priority(repo_root=str(tmp_path))
    # simulate the driver dropping this round's recording: every query
    # in the current window goes green in round PRIORITY_AS_OF
    fake = {
        name: {"err": None, "rows_match": True, "hash_match": True}
        for name in registry.PRIORITY
    }
    (tmp_path / f"CORRECTNESS_r{registry.PRIORITY_AS_OF}.json").write_text(
        json.dumps(fake)
    )
    after = registry.compute_priority(repo_root=str(tmp_path))
    assert after == before, (
        "a recording from round >= PRIORITY_AS_OF changed the pinned "
        "computation — the handoff would be red again"
    )
    # while an UNPINNED view (next round's refreeze) must see it
    unpinned = registry.compute_priority(
        repo_root=str(tmp_path), as_of=registry.PRIORITY_AS_OF + 1
    )
    assert unpinned != before
