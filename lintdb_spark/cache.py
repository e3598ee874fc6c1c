"""Bookkeeping for persisted intermediates.

Several operators ``persist()`` a shared subtree because Catalyst
re-plans it on both sides of a broadcast boundary (no ReusedExchange),
e.g. the cascade's token assignment or XTR's retrieval set. Spark's
CacheManager holds those entries for the SESSION lifetime — they are
not freed when the Python DataFrame is garbage-collected — so a
long-lived caller (the REST server, a driver loop issuing thousands of
batches) would accumulate one cached dataset per call until storage
memory thrashes.

Builders therefore tag the DataFrame they return with the
intermediates they persisted (``tag_cached``); a caller that has
materialized the result calls ``release(df)`` to unpersist them.
One-shot callers (the correctness driver, ad-hoc notebooks) may skip
release — the leak only matters when calls repeat within one session.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Mark ``df`` as SESSION-pinned: a frame owned by a session-level
    cache (queries._session_cached) whose lifetime is the application,
    not one call. ``tag_cached`` never records pinned frames and
    ``release`` never unpersists them — otherwise a caller that
    materializes a result built on a session cache and then releases
    it would silently degrade every later cache hit to a recompute
    (the dict still holds the now-unpersisted frame)."""
    df._lintdb_pinned = True
    return df


def tag_cached(out: DataFrame, *deps: DataFrame) -> DataFrame:
    """Attach persisted intermediates to ``out`` for later release.

    Each dep is either a persisted DataFrame or a carrier whose own
    tags propagate (so ``tag_cached(final, topk)`` after a join keeps
    the chain alive through wrapper returns). Session-pinned deps
    (see ``pin``) are skipped.
    """
    cached = list(getattr(out, "_lintdb_cached", ()))
    for d in deps:
        cached.extend(getattr(d, "_lintdb_cached", ()))
        if getattr(d, "_lintdb_pinned", False):
            continue
        lvl = d.storageLevel
        if lvl.useMemory or lvl.useDisk:
            cached.append(d)
    out._lintdb_cached = tuple(cached)
    return out


def release(df: DataFrame) -> None:
    """Unpersist every intermediate cached while building ``df``.

    Call AFTER materializing (collect/write) — unpersisting first just
    forces a recompute, it does not break correctness."""
    for c in getattr(df, "_lintdb_cached", ()):
        if not getattr(c, "_lintdb_pinned", False):
            c.unpersist()
    df._lintdb_cached = ()
