"""Local replica of the driver's t2 correctness gate.

Every registered query runs on Spark and (when an oracle exists) is value-
compared against its DuckDB SQL twin at sf0.01 — the exact dataset and
comparison the driver uses for CORRECTNESS_r{N}.json. Exact equality, no
tolerance: if this passes, the driver's hash comparison passes.
"""

from __future__ import annotations

import pytest

from deg04_local_data_lake_spark import oracle, registry


def _names() -> list[str]:
    return sorted(registry.queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    ok, msg = oracle.check_query(spark, sf_dir, name)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark, smoke_dir):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns


def test_every_query_has_oracle_or_reason(spark):
    """Queries without an oracle get only a weak rows-only check from the
    driver — keep that set deliberate and small."""
    missing = set(registry.queries()) - set(registry.oracles())
    allowed_non_sql = {n for n in missing if n.startswith(("stream_", "mm_"))}
    assert missing == allowed_non_sql, (
        f"queries missing oracle SQL without a declared reason: "
        f"{sorted(missing - allowed_non_sql)}"
    )
