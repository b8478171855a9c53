"""Tracked persists for long-lived sessions.

Operators persist intermediates (the bands/bucket postings tables, the
sketches feeding multi-way joins) whose lifetime extends past the
function that created them — the returned DataFrame still references
them lazily, so the creator can't unpersist. In a one-shot job the
session teardown reclaims everything; in a long-lived session (driver
harness, notebook, service) they would accumulate. ``track`` registers
every such persist; ``release_all`` frees whatever is still pinned —
call it after materializing a query's result (the ``__spark_entry__``
query wrapper and ``bench.py`` do).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def track(df: DataFrame, eager: bool = False) -> DataFrame:
    """persist() + register for later release_all(). ``eager``
    materializes immediately (use when multiple consumers would race a
    cold cache)."""
    df = df.persist()
    with _LOCK:
        _TRACKED.append(df)
    if eager:
        df.count()
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns how many were freed.
    Safe to call at any time — results already materialized are
    unaffected; lazily re-executing a released DataFrame just recomputes."""
    with _LOCK:
        dfs = _TRACKED[:]
        _TRACKED.clear()
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
