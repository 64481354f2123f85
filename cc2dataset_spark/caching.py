"""Session-lifetime cache bookkeeping for persisted intermediates.

Several operators persist() an intermediate whose lifetime must extend
past their own return — range-partitioned global ranks pin their
boundary sample (operators/rank.py), MinHash pins the shared shingle
set, quality tiers pin the per-doc score frame. The r5/r6 protocol
(stacking handles on a ``_pinned_intermediates`` DataFrame attribute
and hoping callers invoke ``rank.release``) leaked in every production
path: the attribute is lost through any further transformation and
neither bench.py nor the external driver ever called release.

This module replaces that with a process-global registry: operators
``track()`` each persisted handle, and the ``@query`` wrapper
(plans/catalog.py) calls :func:`release_all` at the START of building
the next query — by which point the previous query's final action has
run in every production path (driver, driver_sim, bench, the oracle
test loop all build-then-collect one query at a time). A catalog sweep
therefore holds at most one query's caches at any moment instead of
accumulating MEMORY_AND_DISK entries for the life of the session.

Constraint inherited from the release point: once the NEXT query is
built, the PREVIOUS query's DataFrame must not be recomputed — for
ranked frames the range boundaries would re-sample (operators/rank.py)
and partition attribution would silently shift. Build-then-collect one
query at a time, which is the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an (already-persisted) frame for deferred release and
    return it unchanged."""
    _TRACKED.append(df)
    return df


def release_all() -> None:
    """Unpersist every tracked frame (idempotent per frame — frames an
    operator already unpersisted early are no-ops)."""
    while _TRACKED:
        _TRACKED.pop().unpersist()


def tracked_count() -> int:
    """Number of currently tracked handles (test introspection)."""
    return len(_TRACKED)
