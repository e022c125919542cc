"""Tracked persistence for intermediate tables.

Several operators persist a compact intermediate (MinHash signatures, ANN
bucket tables, per-(doc,term) counts) so both sides of a downstream self-join
/ multi-consumer fan-out read one InMemoryRelation instead of recomputing the
most expensive lineage stage (tokenize / scan) per consumer — the round-2/3
100 TB fix pattern.

Because these functions return *lazy* DataFrames, they cannot unpersist
before the caller consumes the result. Instead every persist goes through
:func:`tracked_persist`, and long-running hosts (bench.py, the full oracle
gate, the driver loop if it chooses) call :func:`release_tracked` after
consuming a query's output. Storage level is MEMORY_AND_DISK, so even an
unreleased table degrades to disk-backed blocks rather than evicting hot
executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, level=None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK by default) and register it for later
    :func:`release_tracked` cleanup. Returns the persisted DataFrame."""
    from pyspark import StorageLevel

    out = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(out)
    return out


def release_tracked() -> int:
    """Unpersist every table registered since the last release; returns the
    number released. Safe to call at any time — a consumer that re-runs a
    released query simply recomputes and re-persists."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
