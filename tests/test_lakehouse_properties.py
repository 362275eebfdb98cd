"""Model-based property tests for the jar-less table formats.

Hypothesis drives random sequences of table operations (append /
overwrite / merge / optimize / checkpoint) against BOTH the real
implementation (sources/delta_log.py, sources/iceberg_tables.py) and a
trivial pure-Python model (a dict of id → value plus a version history).
After every operation the table must read back exactly the model state,
and every historical version must still read back exactly its recorded
snapshot — i.e. time travel is total over the table's life, whatever
the operation order. This is the strongest correctness statement the
unit tests can't make: the log replay is exercised under arbitrary
interleavings, not hand-picked ones.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deg04_local_data_lake_spark.sources import delta_log as dl
from deg04_local_data_lake_spark.sources import iceberg_tables as ice

# one op = ("append"|"overwrite"|"merge"|"optimize"|"checkpoint", seed)
_OP = st.tuples(
    st.sampled_from(["append", "overwrite", "merge", "optimize", "checkpoint"]),
    st.integers(min_value=0, max_value=6),
)


def _rows(seed: int, lo: int) -> dict[int, float]:
    # small deterministic batch derived from the seed; ids overlap across
    # batches so merges genuinely update
    return {lo + i: float(seed * 100 + i) for i in range(seed % 3 + 1)}


def _to_df(spark, rows: dict[int, float]):
    data = [(k, v) for k, v in sorted(rows.items())]
    return spark.createDataFrame(data, "id long, v double")


def _read_state(spark, table) -> dict[int, float]:
    return {r.id: r.v for r in dl.read_delta_log(spark, table).collect()}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=1, max_size=6))
def test_delta_log_matches_model_under_random_ops(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("dl") / "tbl")
    model: dict[int, float] = {}
    history: list[tuple[int, dict[int, float]]] = []  # (version, state)
    dl.write_delta_commit(_to_df(spark, {0: 0.0}), table)
    model = {0: 0.0}
    history.append((0, dict(model)))
    for op, seed in ops:
        batch = _rows(seed, lo=seed % 4)
        if op == "append":
            # appends must not duplicate ids for the model to be a dict —
            # restrict to ids not present
            batch = {k: v for k, v in batch.items() if k not in model}
            if not batch:
                continue
            v = dl.write_delta_commit(_to_df(spark, batch), table)
            model.update(batch)
        elif op == "overwrite":
            v = dl.write_delta_commit(
                _to_df(spark, batch), table, mode="overwrite"
            )
            model = dict(batch)
        elif op == "merge":
            v = dl.merge_delta(spark, table, _to_df(spark, batch), "id")
            model.update(batch)
        elif op == "optimize":
            v = dl.optimize_delta(spark, table)
            # content unchanged
        else:  # checkpoint
            dl.write_delta_checkpoint(table)
            continue
        history.append((v, dict(model)))
        assert _read_state(spark, table) == model
    # time travel is total: every recorded version reads back exactly
    for v, state in history:
        got = {
            r.id: r.v for r in dl.read_delta_log(spark, table, v).collect()
        }
        assert got == state, f"version {v} diverged"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(st.tuples(st.sampled_from(["append", "overwrite"]),
                              st.integers(min_value=0, max_value=6)),
                    min_size=1, max_size=5))
def test_iceberg_matches_model_under_random_ops(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("ice") / "tbl")
    sid = ice.write_iceberg_commit(_to_df(spark, {0: 0.0}), table)
    model: dict[int, float] = {0: 0.0}
    history = [(sid, dict(model))]
    for op, seed in ops:
        batch = _rows(seed, lo=10 * (seed + 1))  # disjoint id ranges per seed
        if op == "append":
            batch = {k: v for k, v in batch.items() if k not in model}
            if not batch:
                continue
            sid = ice.write_iceberg_commit(_to_df(spark, batch), table)
            model.update(batch)
        else:
            sid = ice.write_iceberg_commit(
                _to_df(spark, batch), table, mode="overwrite"
            )
            model = dict(batch)
        history.append((sid, dict(model)))
        got = {r.id: r.v for r in ice.read_iceberg(spark, table).collect()}
        assert got == model
    for sid, state in history:
        got = {
            r.id: r.v for r in ice.read_iceberg(spark, table, sid).collect()
        }
        assert got == state, f"snapshot {sid} diverged"
