"""Library cache discipline: shared-intermediate persists are tracked
and releasable (plans/cache.py) — after a consumer has materialized the
operator outputs, release_shared() must leave NO library-owned block in
executor storage (round-3 defect: persists lived for the session)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _cached_ids(spark) -> set[int]:
    return {info.id() for info in
            spark.sparkContext._jsc.sc().getRDDStorageInfo()}


@pytest.fixture()
def docs(spark):
    rows = [(i, f"doc {i % 7} common words repeated text body number {i % 11} "
             * 4) for i in range(120)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dedup_helpers_release_their_persists(spark, docs):
    from dup_ocropy_spark.operators.dedup import (
        jaccard_pairs, minhash_candidates, simhash_pairs,
    )
    from dup_ocropy_spark.plans.cache import n_tracked, release_shared

    release_shared()  # clean slate (other tests may have left tracked frames)
    # id-set baseline, not a count: unrelated blocks (e.g. another test's
    # localCheckpoint RDDs) can be GC'd asynchronously mid-test by the
    # ContextCleaner, which would shift a count baseline under us
    base = _cached_ids(spark)
    for op in (jaccard_pairs, minhash_candidates, simhash_pairs):
        op(docs).count()  # materialize the consuming action
    assert n_tracked() >= 3
    assert _cached_ids(spark) - base  # the persists really existed
    release_shared()
    assert n_tracked() == 0
    assert not (_cached_ids(spark) - base)  # and really got freed


def test_curate_releases_after_terminal_action(spark):
    from dup_ocropy_spark.plans.cache import release_shared
    from dup_ocropy_spark.plans.curate import curate
    from dup_ocropy_spark.sources.transcripts import synth_transcripts

    release_shared()
    base = _cached_ids(spark)
    curated, stats = curate(synth_transcripts(spark, 30))
    n_rows = curated.count()
    stats.collect()
    assert n_rows > 0
    assert _cached_ids(spark) - base
    released = release_shared()
    assert released >= 2  # scored + near_pairs (+ nested minhash sig)
    assert not (_cached_ids(spark) - base)


def test_release_shared_is_idempotent_and_safe_empty(spark):
    from dup_ocropy_spark.plans.cache import release_shared

    release_shared()
    assert release_shared() == 0
    assert release_shared() == 0


def test_scoped_release_only_frees_own_span(spark):
    """Interleaved consumers in one session scope their release: frames
    persisted before the token survive a release_shared(token); a final
    bare release frees the rest (the single-pipeline default)."""
    from dup_ocropy_spark.plans.cache import (
        n_tracked, persist_shared, release_shared, scope_token,
    )

    release_shared()
    outer = persist_shared(spark.range(100).withColumn("x", F.col("id") * 2))
    outer.count()
    tok = scope_token()
    inner = persist_shared(spark.range(50).withColumn("y", F.col("id") + 1))
    inner.count()
    assert release_shared(tok) == 1          # only the inner span
    assert n_tracked() == 1
    assert outer.storageLevel.useMemory      # outer still persisted
    assert release_shared() == 1             # bare release frees the rest
    assert n_tracked() == 0
