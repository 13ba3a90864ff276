"""BPE codec training — kernels/bpe.py + operators/codec.py (L12 at
corpus scale). The distributed trainer must produce the EXACT merge list
of the single-process kernel."""

from __future__ import annotations

import pytest

from dup_ocropy_spark.kernels import bpe

CORPUS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest wide",
    "the lowest and the newest of the wide words",
]


def test_kernel_bpe_golden():
    wc = bpe.word_counts(["aa ab aa aa ab"])
    merges = bpe.bpe_merges(wc, 10)
    # 'a'+'a</w>' (count 3) beats 'a'+'b</w>' (2); lexicographic after
    assert merges[0] == ("a", "a</w>")
    assert ("a", "b</w>") in merges


def test_kernel_encode_decode_roundtrip():
    wc = bpe.word_counts(CORPUS)
    merges = bpe.bpe_merges(wc, 40)
    for w in "low lowest newest wide unseen_zebra".split():
        assert bpe.decode_symbols(bpe.encode_word(w, merges)) == w
    # frequent whole words collapse to few symbols
    assert len(bpe.encode_word("low", merges)) <= 2


def test_distributed_matches_kernel_exactly(spark):
    from dup_ocropy_spark.operators.codec import train_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    want = bpe.bpe_merges(bpe.word_counts(CORPUS), 25)
    got = train_bpe(docs, n_merges=25)
    assert got == want
    # and under a different partitioning
    got2 = train_bpe(docs.repartition(7), n_merges=25)
    assert got2 == want


def test_distributed_early_stop_on_exhausted_pairs(spark):
    from dup_ocropy_spark.operators.codec import train_bpe

    docs = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    got = train_bpe(docs, n_merges=50)   # no pair repeats -> no merges
    assert got == []


def test_bpe_token_counts_match_kernel(spark):
    from dup_ocropy_spark.operators.codec import bpe_token_counts, train_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=25)
    got = {r.doc_id: r.n_tokens_bpe_learned
           for r in bpe_token_counts(docs, merges).collect()}
    for i, t in enumerate(CORPUS):
        want = sum(len(bpe.encode_word(w, merges)) for w in t.split())
        assert got[i] == want
    # merged codec yields fewer tokens than raw chars, at least one per word
    for i, t in enumerate(CORPUS):
        assert len(t.split()) <= got[i] < sum(len(w) for w in t.split())
