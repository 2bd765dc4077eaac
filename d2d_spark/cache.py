"""Registry of operator-persisted DataFrames, with a per-corpus
release hook.

Several operators persist a shared intermediate (the minhash
signature stage, the perplexity gram explode, the classifier token
explode, the semantic-dedup assignment) and deliberately do NOT
unpersist it: their results are returned lazily, so there is no safe
point inside the operator, and Spark's CacheManager reuses the entry
across repeated identical calls (~2x steady-state on the bench).
The cost of that policy is accumulation: MEMORY halves evict under
pressure, but the DISK halves of MEMORY_AND_DISK blocks live until
unpersist/clearCache — a long-lived session cycling many corpora
leaks disk without bound.

This module is the middle ground: every such persist registers here
under its operator tag, and pipelines call ``release(tag)`` (or
``release()`` for everything) after consuming a corpus's results.
Release is ALWAYS safe — unpersisting a frame something still needs
just recomputes it on next use (lineage is intact everywhere this
registry is used) — so the worst case of releasing too early is one
recompute, never wrong results. ``spark.catalog.clearCache()``
remains the blunt instrument; release() drops only what the
operators registered, leaving caller-managed caches alone.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_ENTRIES: dict[str, list[DataFrame]] = {}
# r12 (ADVICE): register() runs from concurrent InheritableThreads
# (parallel.run_concurrent suite chains) while release()/deregister()
# may run on the main thread; an unguarded pop-while-append can strand
# a persisted frame this registry exists to reclaim. All _ENTRIES
# mutations and reads take this lock; unpersist() calls happen outside
# it (they only talk to the JVM, never to _ENTRIES).
_LOCK = threading.Lock()


def register(tag: str, df: DataFrame) -> DataFrame:
    """Record a persisted frame under an operator tag; returns it."""
    with _LOCK:
        _ENTRIES.setdefault(tag, []).append(df)
    return df


def entries(tag: str | None = None) -> list[DataFrame]:
    """The registered frames for a tag (or all tags)."""
    with _LOCK:
        if tag is not None:
            return list(_ENTRIES.get(tag, ()))
        return [df for dfs in _ENTRIES.values() for df in dfs]


def tags() -> list[str]:
    with _LOCK:
        return sorted(_ENTRIES)


def deregister(tag: str, frames: list[DataFrame]) -> int:
    """Unpersist and drop ONLY the given frames from ``tag``'s
    registry — the error-path cleanup for operators whose FAILED call
    must not release frames registered by earlier successful calls
    (releasing those is safe but forces a silent recompute on any
    still-pending consumer)."""
    ids = {id(f) for f in frames}
    dropped_frames = []
    with _LOCK:
        lst = _ENTRIES.get(tag)
        if not lst:
            return 0
        keep = []
        for df in lst:
            if id(df) in ids:
                dropped_frames.append(df)
            else:
                keep.append(df)
        if keep:
            _ENTRIES[tag] = keep
        else:
            _ENTRIES.pop(tag, None)
    for df in dropped_frames:
        df.unpersist(blocking=False)
    return len(dropped_frames)


def release(tag: str | None = None) -> int:
    """Unpersist (non-blocking) every frame registered under ``tag``
    — or everything, with ``None`` — and drop the references. Returns
    the number of frames released. Call after a corpus's results are
    consumed; a frame still needed downstream recomputes instead of
    failing."""
    to_drop: list[DataFrame] = []
    with _LOCK:
        keys = [tag] if tag is not None else list(_ENTRIES)
        for k in keys:
            to_drop.extend(_ENTRIES.pop(k, ()))
    for df in to_drop:
        df.unpersist(blocking=False)
    return len(to_drop)
