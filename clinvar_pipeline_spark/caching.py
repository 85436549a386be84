"""Session-scoped registry for persisted intermediates.

A ``.persist()`` inside a lazily returned plan cannot unpersist itself:
the blocks only materialize when the caller runs an action, after the
building function has returned. Callers that re-invoke plans in one
session (bench passes, test loops, repeated CLI runs) would otherwise
accumulate cache blocks — each invocation persists a NEW frame — until
the storage pool thrashes (the round-3 bench regressions).

Plan builders route persists through :func:`register_persist`; callers
release everything after the dependent plans materialize via
:func:`release_cached` (re-exported as ``queries.release_cached``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def register_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and remember it for :func:`release_cached`."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every frame registered by :func:`register_persist`;
    returns the count released. Safe to call at any point after the
    dependent plans have materialized (Spark drops blocks
    asynchronously; in-flight jobs recompute from lineage)."""
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
        n += 1
    return n
