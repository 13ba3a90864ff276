"""Corrupted-markup stress tier, end to end (the linegen-degradation analog,
ocropus-linegen:52-83,128-241: the reference stresses its recognizer with
geometric distortions; we stress the extractor with damaged markup).

Invariants under corruption: the distributed pipeline never crashes, spans
stay in-bounds/ordered, output is deterministic across partitionings, and
the by-construction equality still holds on every UNcorrupted turn."""

from __future__ import annotations

from pyspark.sql import functions as F

from dup_ocropy_spark.plans.extract import extract
from dup_ocropy_spark.sources.transcripts import (
    _corrupt_payload, synth_expected, synth_transcripts,
)

N_CONVS = 40
RATE = 0.5


def test_corruptions_actually_fire():
    import numpy as np

    base = "<p>hello world this is fine</p><p>second paragraph here</p>"
    outs = {_corrupt_payload(np.random.default_rng(i), base) for i in range(30)}
    assert len(outs) > 10  # diverse damage
    assert base not in outs


def test_corrupted_tier_crash_free_and_spans_in_bounds(spark):
    tr = synth_transcripts(spark, N_CONVS, corruption_rate=RATE)
    out = extract(tr)
    joined = (out.join(tr.select("conv_id", "turn_idx",
                                 F.length("text").alias("text_len"),
                                 F.length("tool").alias("tool_len")),
                       ["conv_id", "turn_idx"])
              .select("conv_id", "turn_idx", "payload_len", "text_len",
                      "tool_len", F.explode_outer("spans").alias("s")))
    # the bound is the CHOSEN payload's length (tool wins when non-empty;
    # payload_len == len(chosen)) — greatest(text_len, tool_len) let a
    # span overrunning a short tool payload hide under a longer text
    bad = joined.where(
        F.col("s").isNotNull()
        & ((F.col("s.start") < 0) | (F.col("s.end") < F.col("s.start"))
           | (F.col("s.end") > F.col("payload_len"))))
    assert bad.count() == 0
    assert out.count() == tr.count()  # every turn produced a row


def test_corrupted_tier_deterministic_across_partitionings(spark):
    a = extract(synth_transcripts(spark, N_CONVS, corruption_rate=RATE),
                repartition=2)
    b = extract(synth_transcripts(spark, N_CONVS, corruption_rate=RATE),
                repartition=16)
    ha = a.agg(F.bit_xor(F.xxhash64("conv_id", "turn_idx", "extracted_text",
                                    "reject_reason")).alias("h")).collect()[0].h
    hb = b.agg(F.bit_xor(F.xxhash64("conv_id", "turn_idx", "extracted_text",
                                    "reject_reason")).alias("h")).collect()[0].h
    assert ha == hb


def test_uncorrupted_turns_keep_exact_equality(spark):
    out = extract(synth_transcripts(spark, N_CONVS, corruption_rate=RATE))
    exp = synth_expected(spark, N_CONVS, corruption_rate=RATE)
    n_claimed = exp.where(F.col("expected_text").isNotNull()).count()
    n_corrupted = exp.where(F.col("expected_text").isNull()).count()
    assert n_corrupted > 20, "stress tier must actually corrupt turns"
    mism = (out.join(exp, ["conv_id", "turn_idx"])
            .where(F.col("expected_text").isNotNull()
                   & (F.col("extracted_text") != F.col("expected_text"))))
    assert mism.count() == 0 and n_claimed > 0
