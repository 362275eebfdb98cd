"""Session cache lifecycle for query builders that persist subtrees.

A few iterative/multi-consumer operators (``pagerank_step``,
``triangle_count``, ``dedup_minhash_estimate``) persist a reduced
intermediate (edge list / signatures) because it is consumed by several
downstream branches. Queries are *lazy* — the builder cannot unpersist
after "the" action because the caller owns the action — so the contract
is explicit instead of leaky:

- builders register every persisted frame via :func:`persist_tracked`;
- harnesses (bench, the oracle runner, tests) call
  :func:`release_caches` between queries / at teardown.

Without this, caches would accumulate for the session lifetime and
splice ``InMemoryRelation`` nodes into *other* queries' plans (the
pre-r3 behavior that forced ``spark.catalog.clearCache()`` workarounds
in tests).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []
_INVALIDATE: list[Callable[[], None]] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_caches`."""
    out = df.persist(level)
    _PERSISTED.append(out)
    return out


def on_release(cb: Callable[[], None]) -> None:
    """Register a callback run by :func:`release_caches` — for modules
    that MEMOIZE persisted DataFrames (e.g. the shared triangle subtree):
    after an unpersist their memo would silently hand out unpersisted
    frames, so the memo must be dropped together with the cache.
    Registration is idempotent; callbacks stay registered for the
    session lifetime."""
    if cb not in _INVALIDATE:
        _INVALIDATE.append(cb)


def release_caches() -> int:
    """Unpersist every QUERY-SCOPED tracked frame; returns how many were
    released. Session FIXTURES (see :func:`persist_fixture`) survive —
    harnesses call this between queries, and fixtures are exactly the
    subtrees meant to be shared across queries in one session."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    for cb in _INVALIDATE:
        cb()
    return n


# ------------------------------------------------- session-fixture tier
#
# Some subtrees are FIXTURES of the whole session, not of one query: the
# co-purchase edge graph (two graph queries), the dedup signature/pair
# chain (six consumers). Releasing those between queries — the honest
# thing for query-scoped persists — just forces every consumer to pay
# the build again, which is NOT how a real session behaves. Fixtures are
# keyed by applicationId over immutable parquet inputs, so there is no
# staleness to protect against; they live until release_all (test
# teardown / session stop).

_FIXTURES: list[DataFrame] = []
_FIXTURE_INVALIDATE: list[Callable[[], None]] = []


def persist_fixture(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist a per-SESSION fixture subtree: survives
    :func:`release_caches`, released only by :func:`release_all`."""
    out = df.persist(level)
    _FIXTURES.append(out)
    return out


def on_release_fixtures(cb: Callable[[], None]) -> None:
    """Register a memo-invalidation callback for the fixture tier (run
    by :func:`release_all` only). Idempotent."""
    if cb not in _FIXTURE_INVALIDATE:
        _FIXTURE_INVALIDATE.append(cb)


def release_all() -> int:
    """Release query-scoped caches AND session fixtures (test teardown /
    session handover)."""
    n = release_caches()
    while _FIXTURES:
        df = _FIXTURES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    for cb in _FIXTURE_INVALIDATE:
        cb()
    return n
