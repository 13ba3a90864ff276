"""Driver-row twins for the rows-only extraction queries.

The driver records only a rows-only check for ``extract_documents_lstm``
(LSTM recurrence is not SQL-expressible) and ``extract_transcripts_synth``
(full HTML path); these tests are their strong local twins — exact
equality against the single-process kernel oracle / construction
invariants.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")


def test_lstm_driver_row_equals_kernel_oracle(spark):
    """The committed TinyBiLSTM artifact drives the SAME decisions through
    Spark as through the single-process kernel: extracted text, block
    counts, and the 6dp-rounded span score agree row-for-row."""
    from dup_ocropy_spark.kernels.oracle import extract_frame
    from dup_ocropy_spark.operators.transcripts_queries import (
        extract_documents_lstm, lstm_config,
    )

    cfg = lstm_config()
    assert cfg.classifier == "lstm" and cfg.weights is not None

    got = (extract_documents_lstm(spark, SF_DIR)
           .orderBy("doc_id").toPandas())

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]] \
        .sort_values("doc_id")
    frame = pd.DataFrame({
        "conv_id": docs.doc_id.astype(str),
        "turn_idx": 0,
        "role": "user",
        "text": docs.text,
        "tool": "",
    })
    want = extract_frame(frame, cfg)
    want_score = [round(s[0]["score"], 6) if len(s) else -1.0
                  for s in want.spans]

    assert len(got) == len(want) > 0
    assert list(got.extracted_text) == list(want.extracted_text)
    assert list(got.n_blocks) == list(want.n_blocks)
    assert list(got.n_content) == list(want.n_content)
    assert list(got.content_score) == want_score
    # the model actually ran: scores are model outputs, not the -1 default
    assert (got.content_score > 0).sum() > 0


def test_lstm_scores_differ_from_logistic_path(spark):
    """Guard against the LSTM row silently falling back to the logistic
    scorer: the two models must produce different score vectors on the
    same corpus (decisions may coincide on clean text — scores cannot)."""
    from dup_ocropy_spark.operators.registry import REGISTRY

    lstm = (REGISTRY["extract_documents_lstm"].spark(spark, SF_DIR)
            .select("doc_id", "content_score").orderBy("doc_id").toPandas())
    logi = (REGISTRY["extract_documents_classified"].spark(spark, SF_DIR)
            .select("doc_id", "content_score").orderBy("doc_id").toPandas())
    both = lstm.merge(logi, on="doc_id", suffixes=("_lstm", "_logi"))
    live = both[(both.content_score_lstm >= 0) & (both.content_score_logi >= 0)]
    assert len(live) > 0
    assert (live.content_score_lstm != live.content_score_logi).any()


def test_synth_family_conv_columns_consistent(spark):
    """The folded synth query's conversation-grain columns must agree with
    its own turn-grain rows: n_turns_with_content == the number of turns
    with non-empty extracted_text per conv, and conv_text_md5 is constant
    within a conversation."""
    from dup_ocropy_spark.operators.registry import REGISTRY

    pdf = REGISTRY["extract_transcripts_synth"].spark(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    for conv_id, grp in pdf.groupby("conv_id"):
        n_content_turns = int((grp.extracted_text != "").sum())
        md5s = set(grp.conv_text_md5.dropna())
        counts = set(grp.n_turns_with_content.dropna())
        if n_content_turns == 0:
            assert not md5s and not counts, conv_id
        else:
            assert counts == {n_content_turns}, conv_id
            assert len(md5s) == 1, conv_id
