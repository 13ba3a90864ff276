"""Benchmark decontamination — operators/decontaminate.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dup_ocropy_spark.operators.decontaminate import (
    contamination, decontaminate, word_ngrams,
)

EVAL_Q = ("What is the capital of France and why did it become the seat "
          "of government during the medieval consolidation period?")


@pytest.fixture(scope="module")
def frames(spark):
    bench = spark.createDataFrame([("q1", EVAL_Q)], "doc_id string, text string")
    docs = spark.createDataFrame([
        # verbatim leak at an arbitrary offset (and different case)
        ("leak", "Intro text before the question. " + EVAL_Q.upper() + " Trailing."),
        # clean doc, same domain vocabulary but no 8 contiguous shared words
        ("clean", "Paris history: governance moved there over centuries "
                  "for reasons of trade, defense and royal administration."),
        ("short", "Nothing in common with the benchmark at all here."),
    ], "doc_id string, text string")
    return docs, bench


def test_word_ngrams_every_position(spark):
    d = spark.createDataFrame([("d", "a b c d")], "doc_id string, text string")
    got = {r.gram for r in word_ngrams(d, n=3).collect()}
    assert got == {"a b c", "b c d"}
    # shorter than n -> no grams, no crash
    s = spark.createDataFrame([("s", "a b")], "doc_id string, text string")
    assert word_ngrams(s, n=3).count() == 0


def test_verbatim_leak_is_flagged_and_dropped(frames):
    docs, bench = frames
    v = {r.doc_id: r for r in contamination(docs, bench).collect()}
    assert v["leak"].contaminated and v["leak"].n_hits >= 2
    assert not v["clean"].contaminated
    assert not v["short"].contaminated
    clean, stats = decontaminate(docs, bench)
    assert {r.doc_id for r in clean.collect()} == {"clean", "short"}
    s = stats.collect()[0]
    assert s.n_docs == 3 and s.n_contaminated == 1


def test_corpus_side_uses_broadcast_join(frames):
    """The training corpus must reach the verdict through a broadcast
    join — benchmarks are tiny; the corpus is the 100 TB side."""
    docs, bench = frames
    plan = contamination(docs, bench) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_threshold_tunes_sensitivity(spark):
    """Exactly one shared 8-gram stays below the default 2-gram verdict
    but trips min_ngrams=1."""
    bench = spark.createDataFrame(
        [("q", "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id string, text string")
    doc = spark.createDataFrame(
        [("d", "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id string, text string")  # single 8-gram total
    strict = contamination(doc, bench, min_ngrams=1).collect()[0]
    lax = contamination(doc, bench, min_ngrams=2).collect()[0]
    assert strict.n_hits == 1 and strict.contaminated
    assert not lax.contaminated


def test_leading_exotic_whitespace_makes_no_phantom_words(spark):
    """A leading newline/tab must not inject an empty 'word': an n-gram
    must always span n real words (F.trim strips only spaces — the split
    output is filtered instead)."""
    d = spark.createDataFrame(
        [("d", "\nalpha beta gamma")], "doc_id string, text string")
    got = {r.gram for r in word_ngrams(d, n=3).collect()}
    assert got == {"alpha beta gamma"}


def test_corpus_ngrams_dedupe_without_a_shuffle(frames):
    """Per-doc gram dedupe must be array_distinct before the explode —
    a row-level distinct() would exchange every exploded n-gram of the
    100 TB side."""
    docs, bench = frames
    plan = contamination(docs, bench) \
        ._jdf.queryExecution().executedPlan().toString()
    # AQE appends an "== Initial Plan ==" copy — examine the live plan only
    plan = plan.split("== Initial Plan ==")[0]
    # the only gram exchange allowed is the BENCHMARK-side distinct (a
    # tiny relation, printed inside the BroadcastExchange subtree)
    gram_exchanges = plan.count("hashpartitioning(gram")
    assert gram_exchanges <= 1, plan
    if gram_exchanges:
        assert plan.index("BroadcastExchange") \
            < plan.index("hashpartitioning(gram"), plan


def test_shuffle_fallback_for_unbroadcastable_benchmark(spark, frames):
    """broadcast=False (what auto mode picks past BENCH_BROADCAST_MAX_CHARS)
    must plan the gram membership check as a shuffle join — no
    BroadcastExchange feeding it — and produce identical hit counts to
    the broadcast fast path."""
    from dup_ocropy_spark.plans.cache import release_shared

    release_shared()  # drop cached verdicts from earlier tests: the cache
    # manager matches contamination's logical plan regardless of join hints
    docs, bench = frames

    def grab(broadcast):
        df = contamination(docs, bench, broadcast=broadcast)
        plan = df._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        rows = {r.doc_id: (r.n_hits, r.contaminated) for r in df.collect()}
        return plan, rows

    bplan, brows = grab(True)
    splan, srows = grab(False)
    assert "BroadcastExchange" in bplan, bplan
    assert "BroadcastExchange" not in splan, splan
    assert "hashpartitioning(gram" in splan, splan  # real shuffle on the hash
    assert srows == brows  # same verdicts either way


def test_auto_mode_broadcasts_small_sets_and_caps_large(spark, frames):
    """Auto sizing: a tiny eval set broadcasts; a benchmark whose measured
    text size exceeds the cap falls back to the shuffle join (cap lowered
    for the test — the decision logic is what's under test)."""
    import dup_ocropy_spark.operators.decontaminate as d
    from dup_ocropy_spark.plans.cache import release_shared

    release_shared()
    docs, bench = frames
    plan_small = contamination(docs, bench) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan_small

    old = d.BENCH_BROADCAST_MAX_CHARS
    d.BENCH_BROADCAST_MAX_CHARS = 10  # force "too big to broadcast"
    try:
        plan_big = contamination(docs, bench) \
            ._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
    finally:
        d.BENCH_BROADCAST_MAX_CHARS = old
    assert "BroadcastExchange" not in plan_big, plan_big
