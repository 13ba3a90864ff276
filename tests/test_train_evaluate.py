"""Classifier training (L5/L7 analog) + evaluation pipeline (errs/econf)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dup_ocropy_spark.config import ExtractConfig
from dup_ocropy_spark.operators.train import train_classifier
from dup_ocropy_spark.plans.evaluate import confusion_topk, error_rate, per_turn_errors
from dup_ocropy_spark.plans.extract import extract
from dup_ocropy_spark.sources.transcripts import synth_expected, synth_transcripts


@pytest.fixture(scope="module")
def train_convs(spark):
    return synth_transcripts(spark, 40).cache()


def test_trained_logistic_distills_rule_labels(spark, train_convs):
    w, b, acc = train_classifier(train_convs, epochs=200)
    assert acc >= 0.98, f"train accuracy {acc}"
    # trained weights flow through the distributed pipeline end-to-end on
    # HELD-OUT conversations and reproduce the rule pipeline's extraction
    # almost everywhere
    held_out = synth_transcripts(spark, 60).where(F.col("conv_id") > "conv00000039")
    cfg = ExtractConfig(classifier="logistic", weights=tuple(w), bias=float(b))
    got = extract(held_out, cfg).select("conv_id", "turn_idx", "extracted_text")
    want = extract(held_out).select("conv_id", "turn_idx",
                                    F.col("extracted_text").alias("want"))
    j = got.join(want, ["conv_id", "turn_idx"])
    n = j.count()
    n_match = j.where(F.col("extracted_text") == F.col("want")).count()
    assert n_match / n >= 0.97, f"{n_match}/{n} turns match rule pipeline"


def test_pretrained_constants_rederive(spark):
    """The frozen PRETRAINED_LOGISTIC_* literals (shared by the Spark config
    and the DuckDB twin of extract_documents_classified) must be exactly
    what the training code produces — re-derive from scratch with the
    documented recipe and compare to 12dp."""
    import numpy as np

    from dup_ocropy_spark.operators.train import (
        PRETRAINED_LOGISTIC_BIAS, PRETRAINED_LOGISTIC_WEIGHTS,
    )

    w, b, acc = train_classifier(synth_transcripts(spark, 400), seed=42)
    assert acc == 1.0
    np.testing.assert_allclose(w, np.array(PRETRAINED_LOGISTIC_WEIGHTS),
                               rtol=0, atol=5e-13)
    assert abs(b - PRETRAINED_LOGISTIC_BIAS) < 5e-13


def test_classified_margin_guard(spark):
    """Every content decision of the trained classifier on the driver corpus
    must clear the z=0 boundary by a wide margin — engine-vs-oracle float
    summation order can never flip a decision."""
    import dup_ocropy_spark.operators as _ops
    from dup_ocropy_spark.operators.registry import REGISTRY

    _ops.load_all()
    df = REGISTRY["extract_documents_classified"].spark(spark, "/root/testdata/sf0.001")
    scored = df.where(F.col("content_score") >= 0)
    # sigmoid(1.8) ~ 0.858: min margin measured 2.04 at sf0.001
    n_near = scored.where((F.col("content_score") > 0.42)
                          & (F.col("content_score") < 0.58)).count()
    assert n_near == 0, f"{n_near} docs within the decision-flip band"


def test_training_curve_records_and_smooths(spark, train_convs):
    """A7: fit_logistic records a per-epoch (log_loss, error_rate) curve
    that demonstrably converges, and training_curve_frame adds the A6
    MovingStats trailing-mean smoothing."""
    from dup_ocropy_spark.operators.train import (
        block_training_frame, fit_logistic, training_curve_frame,
    )

    curve: list = []
    fit_logistic(block_training_frame(train_convs), epochs=50, curve=curve)
    assert len(curve) == 50
    assert curve[-1][0] < curve[0][0]      # log-loss decreases
    assert curve[-1][1] <= curve[0][1]     # error rate does not regress
    pdf = training_curve_frame(spark, curve).toPandas()
    assert list(pdf["epoch"]) == list(range(50))
    assert pdf["error_rate_ma10"].notna().all()
    # the smoothed curve ends at (or below) its start too
    assert pdf["error_rate_ma10"].iloc[-1] <= pdf["error_rate_ma10"].iloc[0]


def test_calibrate_threshold_distributed(spark, train_convs):
    """N4 analog: the decision threshold estimated from the corpus score
    distribution must (a) reach the rule-label agreement of the best grid
    point, (b) be deterministic, and (c) for the pretrained weights on the
    synthetic corpus, keep distillation agreement at >= the default-0.5
    accuracy."""
    import numpy as np

    from dup_ocropy_spark.operators.train import (
        PRETRAINED_LOGISTIC_BIAS, PRETRAINED_LOGISTIC_WEIGHTS,
        calibrate_threshold, score_label_frame,
    )

    w = np.array(PRETRAINED_LOGISTIC_WEIGHTS)
    b = PRETRAINED_LOGISTIC_BIAS
    t1, acc1 = calibrate_threshold(train_convs, w, b)
    t2, acc2 = calibrate_threshold(train_convs, w, b)
    assert (t1, acc1) == (t2, acc2)                 # deterministic
    assert 0.1 <= t1 <= 0.9 and acc1 >= 0.99
    # calibrated threshold is at least as good as the default 0.5
    sl = score_label_frame(train_convs, w, b).toPandas()
    acc_default = float((((sl["score"] >= 0.5).astype(int))
                         == sl["label"]).mean())
    assert acc1 >= acc_default - 1e-12


def test_eval_zero_cer_against_ground_truth(spark, train_convs):
    pred = extract(train_convs)
    gt = synth_expected(spark, 40)
    errs = per_turn_errors(pred, gt)
    row = error_rate(errs).collect()[0]
    assert row["cer"] == 0.0
    assert row["n_missing"] == 0
    assert row["n_turns"] == gt.count()


def test_eval_missing_and_confusions(spark, train_convs):
    gt = synth_expected(spark, 40)
    # corrupt: drop some predictions, perturb others
    pred = extract(train_convs).where(F.col("turn_idx") % 13 != 5)
    pred = pred.withColumn(
        "extracted_text",
        F.when(F.col("turn_idx") % 11 == 3,
               F.concat(F.col("extracted_text"), F.lit(" xqz")))
        .otherwise(F.col("extracted_text")))
    errs = per_turn_errors(pred, gt)
    row = error_rate(errs).collect()[0]
    assert row["n_missing"] > 0
    assert row["cer"] > 0.0
    conf = confusion_topk(errs, k=5).collect()
    assert conf and conf[0]["n"] >= 1
    # the planted perturbation dominates the confusion table
    assert any("xqz" in (c["pred_part"] or "") for c in conf)
