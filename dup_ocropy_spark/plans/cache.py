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

Scope contract: frames are tracked PER THREAD (operators run on their
caller's thread), so concurrent pipelines on different threads never
evict each other's intermediates. A bare ``release_shared()`` is the
single-pipeline mode: it frees everything, from every thread — correct
for the jobs/ entrypoints (each is its own spark-submit) and for tests.
Two pipelines interleaved on ONE thread (sequential notebook cells)
additionally need their spans to be LIFO-nested: take ``scope_token()``
BEFORE building and pass it to ``release_shared(token)`` after the
terminal action; only this thread's frames registered after the token
are evicted. All mutation is behind one lock.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: dict[int, list[DataFrame]] = {}


def persist_shared(df: DataFrame) -> DataFrame:
    """persist() a multi-consumer intermediate and track it (under the
    calling thread) for ``release_shared``. Returns the persisted frame."""
    df = df.persist()
    with _LOCK:
        _TRACKED.setdefault(threading.get_ident(), []).append(df)
    return df


def scope_token() -> int:
    """Snapshot this thread's tracker position. Pass the token to
    ``release_shared`` to free only this thread's frames persisted AFTER
    this call — the interleaved-span form (module docstring; spans on
    one thread must be LIFO-nested)."""
    with _LOCK:
        return len(_TRACKED.get(threading.get_ident(), []))


def release_shared(token: int | None = None) -> int:
    """Unpersist tracked intermediates. ``token=None`` (default) is the
    single-pipeline mode: every frame from every thread is freed.
    With a ``scope_token()`` value, only the CALLING thread's frames
    registered at or after the token are freed (most-recent first).
    Returns how many were released; safe to call repeatedly / with
    nothing tracked. Non-blocking eviction — executors drop blocks
    async."""
    n = 0
    while True:
        with _LOCK:
            if token is None:
                bucket = next((b for b in _TRACKED.values() if b), None)
            else:
                bucket = _TRACKED.get(threading.get_ident())
                if bucket is not None and len(bucket) <= max(token, 0):
                    bucket = None
            if not bucket:
                break
            df = bucket.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n


def n_tracked() -> int:
    with _LOCK:
        return sum(len(b) for b in _TRACKED.values())
