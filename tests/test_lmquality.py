"""LM-perplexity quality filter — kernels/charlm.py + operators/lmquality.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dup_ocropy_spark.kernels import charlm
from dup_ocropy_spark.operators.lmquality import (
    fit_char_lm, lm_scores, perplexity_filter,
)

PROSE = ("the quick brown fox jumps over the lazy dog while the rain in "
         "spain stays mainly on the plain and every good sentence keeps "
         "a natural rhythm of letters and spaces")


def _gibberish(i: int) -> str:
    rng = np.random.default_rng([7, i])
    return "".join(chr(c) for c in rng.integers(33, 126, size=120))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, PROSE + f" variation {i} of the corpus text") for i in range(40)]
    rows += [(100 + i, _gibberish(i)) for i in range(4)]
    return spark.createDataFrame(rows, "doc_id bigint, text string").persist()


def test_kernel_bigram_counts_golden():
    M = charlm.count_bigrams(["ab", "ab"])
    a, b = ord("a"), ord("b")
    assert M[charlm.BOS, a] == 2 and M[a, b] == 2 and M.sum() == 4
    # empty input contributes nothing, scores NaN
    assert charlm.count_bigrams([""]).sum() == 0
    L = charlm.logprob_table(M)
    assert np.isnan(charlm.avg_logprob("", L))


def test_prose_scores_above_gibberish(corpus):
    table = fit_char_lm(corpus, sample=32, seed=5)
    got = lm_scores(corpus, table).toPandas()
    prose = got[got.doc_id < 100].lm_logprob
    noise = got[got.doc_id >= 100].lm_logprob
    assert prose.min() > noise.max() + 1.0  # separated by >1 nat/byte


def test_fit_is_deterministic_across_partitionings(corpus):
    a = fit_char_lm(corpus, sample=32, seed=5)
    b = fit_char_lm(corpus.repartition(13), sample=32, seed=5)
    assert np.array_equal(a, b)


def test_perplexity_filter_drops_the_noise_tail(corpus):
    table = fit_char_lm(corpus, sample=32, seed=5)
    clean, stats = perplexity_filter(corpus, table, keep_fraction=0.9)
    s = stats.collect()[0]
    assert s.n_docs == 44
    assert 1 <= s.n_dropped <= 5
    # every gibberish doc is in the dropped tail before any prose doc
    assert clean.where(F.col("doc_id") >= 100).count() == 0


def test_unscorable_docs_are_dropped_and_accounted(spark, corpus):
    """Empty/null text cannot be scored: such docs must be DROPPED and
    COUNTED (n_docs == kept + n_dropped), never kept (NaN would sort
    above any cut) or silently vanished (null comparison)."""
    table = fit_char_lm(corpus, sample=32, seed=5)
    bad = spark.createDataFrame(
        [(900, ""), (901, None)], "doc_id bigint, text string")
    clean, stats = perplexity_filter(corpus.unionByName(bad), table)
    s = stats.collect()[0]
    assert s.n_docs == 46
    assert s.n_docs == clean.count() + s.n_dropped
    assert clean.where(F.col("doc_id") >= 900).count() == 0
