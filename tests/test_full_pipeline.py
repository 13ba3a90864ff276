"""End-to-end curation integration: every stage chained the way a
pretraining-data user runs them, with one planted artifact per stage:

    raw transcripts (+ planted duplicate conv, PII turn, benchmark leak,
                     gibberish-but-gate-passing conv)
      -> curate()              [extract -> reassemble -> redact -> quality
                                gates -> exact dedup]
      -> decontaminate()       [benchmark n-gram overlap]
      -> perplexity_filter()   [char-bigram LM tail drop]
      -> pack_sequences()      [global concat-and-chunk]
      -> deterministic_sample()

Each stage must catch exactly its artifact, and the final packed stream
must be a dense, budget-aligned cover of the survivors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dup_ocropy_spark.operators.decontaminate import decontaminate
from dup_ocropy_spark.operators.lmquality import fit_char_lm, perplexity_filter
from dup_ocropy_spark.operators.packing import pack_sequences
from dup_ocropy_spark.operators.sampling import deterministic_sample
from dup_ocropy_spark.plans.curate import curate
from dup_ocropy_spark.sources.transcripts import synth_transcripts

BENCH_Q = ("name the three estuary ports that anchored the northern grain "
           "trade before the railway era changed the routes forever")


def _gibberish_prose(n_words: int = 80) -> str:
    """Passes the rule gates (stopwords, word shape, no dup lines) but is
    char-bigram garbage."""
    rng = np.random.default_rng(99)
    cons = "qxzvkwjfbg"
    words = []
    for i in range(n_words):
        words.append("the" if i % 4 == 0 else
                     "".join(rng.choice(list(cons), size=6)))
    return " ".join(words)


@pytest.fixture(scope="module")
def curated_corpus(spark):
    base = synth_transcripts(spark, 24)
    # (i) duplicate conversation -> exact dedup's artifact
    dup = (base.where(F.col("conv_id") == "conv00000003")
           .withColumn("conv_id", F.lit("conv_dup")))
    # (ii) PII turn -> redaction's artifact
    pii = (base.where(F.col("conv_id") == "conv00000004")
           .withColumn("text", F.when(
               F.col("turn_idx") == 1,
               F.concat(F.col("text"),
                        F.lit(" Reach me at victim@example.org today.")))
               .otherwise(F.col("text"))))
    base = (base.where(F.col("conv_id") != "conv00000004")
            .unionByName(pii).unionByName(dup))
    # (iii) benchmark leak + (iv) gibberish, as whole extra conversations
    extra = spark.createDataFrame(
        [("conv_leak", 0, "user",
          "Study guide dump. " + BENCH_Q + " Memorize this answer verbatim "
          "because the quiz repeats it with the same wording every year.",
          None, None),
         ("conv_gib", 0, "user", _gibberish_prose(), None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    transcripts = base.unionByName(extra)
    curated, stats = curate(transcripts)
    return curated.persist(), stats.collect()[0]


def test_dedup_and_redaction_stages(curated_corpus):
    curated, stats = curated_corpus
    ids = {r.conv_id for r in curated.select("conv_id").collect()}
    # exact dedup kept one of the identical pair (keep-first: the
    # lexicographically first key wins -> conv00000003)
    assert not ({"conv00000003", "conv_dup"} <= ids)
    assert stats.n_pii_redacted >= 1
    leaked_pii = curated.where(F.col("text").contains("victim@example.org"))
    assert leaked_pii.count() == 0


def test_decontamination_stage(spark, curated_corpus):
    curated, _ = curated_corpus
    docs = curated.select(F.col("conv_id").alias("doc_id"), "text")
    bench = spark.createDataFrame([("b", BENCH_Q)], "doc_id string, text string")
    clean, stats = decontaminate(docs, bench)
    s = stats.collect()[0]
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    assert "conv_leak" not in kept
    assert s.n_contaminated == 1  # ONLY the planted leak


def test_lm_filter_packing_and_sample(spark, curated_corpus):
    curated, _ = curated_corpus
    docs = curated.select(F.col("conv_id").alias("doc_id"), "text", "n_words")
    table = fit_char_lm(docs, sample=64, seed=5)
    clean, stats = perplexity_filter(docs, table, keep_fraction=0.9)
    s = stats.collect()[0]
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    assert "conv_gib" not in kept                     # the worst tail
    assert s.n_docs == clean.count() + s.n_dropped    # accounted
    assert len(kept) >= int(0.85 * s.n_docs)          # prose mostly kept
    # pack the survivors into 512-word training sequences (global stream)
    packed = pack_sequences(clean, 512, n_tokens_col="n_words",
                            order_cols=("doc_id",), num_partitions=4)
    pdf = packed.toPandas().sort_values("doc_id").reset_index(drop=True)
    total = int(pdf.n_words.sum())
    assert int(pdf.seq_id.max()) == (total - int(pdf.n_words.iloc[-1])) // 512
    # offsets are the running cumsum mod budget — dense, no gaps
    cum = 0
    for r in pdf.itertuples():
        assert (r.seq_id, r.seq_offset) == (cum // 512, cum % 512)
        cum += r.n_words
    # a deterministic debugging sample of the final corpus
    sample = deterministic_sample(clean, 5, key_col="doc_id", seed=3)
    again = deterministic_sample(clean.repartition(7), 5, key_col="doc_id", seed=3)
    assert ({r.doc_id for r in sample.collect()}
            == {r.doc_id for r in again.collect()})
