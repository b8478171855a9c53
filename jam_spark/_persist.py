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
_TRACKED_CKPT: list[DataFrame] = []


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


def free_local_checkpoint(df: DataFrame) -> None:
    """Drop the block store behind a ``localCheckpoint()``-ed DataFrame.
    ``DataFrame.unpersist()`` is a no-op for these: the blocks belong to
    the internal LogicalRDD, not the cache manager, so iterative
    algorithms that cut lineage every round would otherwise leak one
    corpus-sized RDD per round for the session's lifetime. Safe on
    reliable checkpoints (file-backed; the unpersist is a no-op) and on
    anything else (falls back to plain unpersist)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
        else:
            df.unpersist()
    except Exception:
        pass


def track_checkpoint(df: DataFrame) -> DataFrame:
    """Register an ALREADY-checkpointed DataFrame (local or reliable)
    whose blocks must outlive the creating function — the returned plan
    still reads them lazily — for the next ``release_all()``."""
    with _LOCK:
        _TRACKED_CKPT.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame (persists AND checkpoint
    blocks); returns how many were freed. Safe to call at any time —
    results already materialized are unaffected; lazily re-executing a
    released DataFrame just recomputes."""
    with _LOCK:
        dfs = _TRACKED[:]
        _TRACKED.clear()
        ckpts = _TRACKED_CKPT[:]
        _TRACKED_CKPT.clear()
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    for df in ckpts:
        free_local_checkpoint(df)
        n += 1
    return n
