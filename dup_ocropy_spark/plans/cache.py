"""Tracked persist for shared intermediates (library cache discipline).

Several operators persist() a derived frame that feeds multiple
downstream branches (shingle sets, minhash/simhash signatures, quality
scores, contamination verdicts) — without the persist Spark recomputes
the branch per consumer (2-3x measured, PLANS.md rule 7). But a lazy
library function cannot unpersist before its caller has materialized the
result, so round 3 left the blocks cached for the session lifetime and
jobs worked around it with ``spark.catalog.clearCache()`` — which also
evicts caches the USER owns.

This module is the narrow fix: operators register their persists via
``persist_shared``; the consuming job/test calls ``release_shared()``
after its terminal action and exactly the library's own blocks are
freed. The two-phase job modes (materialize signatures to parquet, then
join from the re-read table) remain the documented 100 TB path — they
never hold executor-memory residency at all.

Scope contract: the tracker is process-global, so a bare
``release_shared()`` assumes ONE pipeline materializes at a time (true
for the jobs/ entrypoints — each is its own spark-submit). Interleaved
consumers in a shared session (threads, notebooks running two jobs)
must scope their release: take ``scope_token()`` BEFORE building, pass
it to ``release_shared(token)`` after the terminal action, and only the
frames persisted inside that span are evicted. All mutation is behind
one lock, so concurrent registrations never corrupt the list.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def persist_shared(df: DataFrame) -> DataFrame:
    """persist() a multi-consumer intermediate and track it for
    ``release_shared``. Returns the persisted frame."""
    df = df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def scope_token() -> int:
    """Snapshot the tracker position. Pass the token to
    ``release_shared`` to free only frames persisted AFTER this call —
    the interleaved-consumer-safe form (module docstring)."""
    with _LOCK:
        return len(_TRACKED)


def release_shared(token: int = 0) -> int:
    """Unpersist tracked intermediates registered at or after ``token``
    (most-recent first; default 0 = everything). Returns how many were
    released. Safe to call repeatedly / with nothing tracked.
    Non-blocking eviction — executors drop blocks async."""
    n = 0
    while True:
        with _LOCK:
            if len(_TRACKED) <= max(token, 0):
                break
            df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n


def n_tracked() -> int:
    return len(_TRACKED)
