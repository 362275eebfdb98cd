"""Query registry feeding ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (and the LLM-data extensions)
registers, at import time, a callable ``(spark, sf_dir) -> DataFrame`` plus —
whenever the semantics are SQL-expressible — an equivalent DuckDB oracle SQL
string. The driver hash-compares the two at sf0.01; ``tests/test_parity.py``
runs the identical comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL over the testdata views."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    Import order IS registration order IS ``queries()`` iteration order,
    and the external driver correctness-checks a prefix sample of it —
    so modules are ordered to rotate coverage across rounds: families the
    driver has not yet sampled (similarity/ANN, multimodal, LLM sampling,
    text, the rank-selection rewrites) come first; families it has
    green-checked in previous rounds (TPC-H core, CDC, dedup, graph
    analytics) come last. Every query passes the same oracle comparison
    locally regardless of position (tests/test_parity.py runs all of
    them), so rotation only changes which subset gets *driver*-attested
    each round.
    """
    global _LOADED
    if _LOADED:
        return
    # --- never driver-sampled through round 3 (fills the r4 prefix) ---
    import deg04_local_data_lake_spark.operators.windows  # noqa: F401
    import deg04_local_data_lake_spark.operators.sequence  # noqa: F401
    import deg04_local_data_lake_spark.operators.text  # noqa: F401
    import deg04_local_data_lake_spark.operators.finance  # noqa: F401
    import deg04_local_data_lake_spark.operators.tpch_extra  # noqa: F401
    import deg04_local_data_lake_spark.operators.sql_surface  # noqa: F401
    import deg04_local_data_lake_spark.operators.scale  # noqa: F401
    import deg04_local_data_lake_spark.operators.relational  # noqa: F401
    import deg04_local_data_lake_spark.operators.sql_modern  # noqa: F401
    import deg04_local_data_lake_spark.operators.table_functions  # noqa: F401
    import deg04_local_data_lake_spark.pipelines.medallion  # noqa: F401
    # --- partially sampled (their unsampled queries follow the above) ---
    import deg04_local_data_lake_spark.operators.extras  # noqa: F401
    import deg04_local_data_lake_spark.operators.dedup  # noqa: F401
    import deg04_local_data_lake_spark.operators.lakehouse  # noqa: F401
    import deg04_local_data_lake_spark.operators.analytics  # noqa: F401
    # --- fully driver-green in rounds 1-3 ---
    import deg04_local_data_lake_spark.operators.similarity  # noqa: F401
    import deg04_local_data_lake_spark.streaming.ingest  # noqa: F401
    import deg04_local_data_lake_spark.operators.sketches  # noqa: F401
    import deg04_local_data_lake_spark.operators.csv_io  # noqa: F401
    import deg04_local_data_lake_spark.operators.multimodal  # noqa: F401
    import deg04_local_data_lake_spark.operators.llm_extras  # noqa: F401
    import deg04_local_data_lake_spark.operators.aggregates  # noqa: F401
    import deg04_local_data_lake_spark.operators.cdc  # noqa: F401
    import deg04_local_data_lake_spark.operators.asof  # noqa: F401

    _LOADED = True


#: Queries pushed to the FRONT of ``queries()`` iteration order regardless
#: of module import order.  The driver samples the first 50 registered
#: queries each round.  Round 7 window = (a) the 19 queries never
#: driver-sampled across rounds 1-6 (diff of CORRECTNESS_r0*.json keys vs
#: the registry — the round-6 verdict's task #2, verbatim); (b) everything
#: NEW this round.  A full-window round leaves every registered query
#: driver-attested at least once (272 pre-round-7 queries, 253 attested).
PRIORITY: list[str] = [
    # --- never driver-sampled through round 6 (VERDICT r6 "missing" #3) ---
    "dedup_semdedup",
    "sample_dsir_weights",
    "delta_log_concurrent_writers",
    "iceberg_concurrent_writers",
    "iceberg_sort_order_skipping",
    "iceberg_update",
    "iceberg_change_feed",
    "delta_log_column_defaults",
    "time_travel_timestamp_lockstep",
    "alter_add_column_lockstep",
    "alter_drop_column_lockstep",
    "stream_iceberg_sink_exactly_once",
    "xml_scan_roundtrip",
    "ewma_daily_revenue",
    "max_drawdown",
    "price_momentum",
    "revenue_autocorr_lag1",
    "rolling_trend_daily_revenue",
    "weekday_seasonality",
    # --- new in round 7 (each attests a round-6 ADVICE/VERDICT fix) ---
    "time_travel_monotonized_mutations",
    "stream_epoch_survives_expiry",
    "delta_protocol_feature_preservation",
    "changelog_lockstep_delete_update",
    "iceberg_wap_publish",
    "iceberg_cherry_pick_recovery",
    "rollback_lockstep",
    "delta_optimize_where",
    "quality_gopher_rules",
    "dedup_exact_substring",
    "text_pii_scrub",
    "training_shard_assignment",
    "vacuum_lockstep",
    "iceberg_type_promotion",
]


def _ordered(d: dict) -> dict:
    front = {n: d[n] for n in PRIORITY if n in d}
    front.update((k, v) for k, v in d.items() if k not in front)
    return front


def queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)
