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
    """Unpersist every tracked frame; returns how many were released."""
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
