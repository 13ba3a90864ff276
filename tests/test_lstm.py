"""TinyBiLSTM recognizer (reference L4-L6): gradient correctness,
distillation training, persistence, and end-to-end pipeline use."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dup_ocropy_spark.kernels.classify import FEATURE_NAMES
from dup_ocropy_spark.kernels.lstm import TinyBiLSTM, _sigmoid
from dup_ocropy_spark.operators.train import sequence_training_data, train_lstm
from dup_ocropy_spark.plans.extract import extract
from dup_ocropy_spark.sources.models import config_with_model, save_model
from dup_ocropy_spark.sources.transcripts import synth_transcripts


def _loss(model, X, y):
    p = model.scores(X)
    p = np.clip(p, 1e-9, 1 - 1e-9)
    return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).sum())


def test_bptt_gradient_matches_finite_difference():
    rng = np.random.default_rng(3)
    model = TinyBiLSTM(n_in=4, n_hidden=3, seed=7)
    X = rng.standard_normal((5, 4))
    y = np.array([1.0, 0.0, 1.0, 1.0, 0.0])
    # analytic gradient via one fit step bookkeeping: recompute directly
    Hcat, (cf, cb) = model.hidden(X)
    p = _sigmoid(Hcat @ model.params["Wout"] + model.params["bout"][0])
    dlogit = p - y
    dH = np.outer(dlogit, model.params["Wout"])
    H = model.n_hidden
    dWf, dbf = model._direction_grads(X, cf, dH[:, :H], "f")
    eps = 1e-6
    idxs = [(0, 0), (2, 3), (5, 1)]
    for i, j in idxs:
        orig = model.params["Wf"][i, j]
        model.params["Wf"][i, j] = orig + eps
        lp = _loss(model, X, y)
        model.params["Wf"][i, j] = orig - eps
        lm = _loss(model, X, y)
        model.params["Wf"][i, j] = orig
        num = (lp - lm) / (2 * eps)
        assert abs(num - dWf[i, j]) < 1e-4 * max(1.0, abs(num)), (i, j, num, dWf[i, j])


def test_lstm_distills_rule_labels():
    model, acc = train_lstm(n_convs=30, epochs=60)
    assert acc >= 0.97, acc
    # held-out sequences: conv-bounded split — sequence_training_data(45)
    # begins with EXACTLY the 30 training convs' sequences, so dropping
    # that prefix leaves convs 30-44 only (a tail slice like [-400:]
    # overlapped ~60% with the training set and measured memorization)
    n_train = len(sequence_training_data(30)[0])
    seqs, labs = sequence_training_data(45)
    seqs, labs = seqs[n_train:], labs[n_train:]
    assert len(seqs) > 100
    correct = sum(int(((model.scores(X) >= 0.5) == (y == 1)).sum())
                  for X, y in zip(seqs, labs))
    total = sum(len(y) for y in labs)
    assert correct / total >= 0.95


def test_lstm_flat_roundtrip():
    model = TinyBiLSTM(n_in=len(FEATURE_NAMES), seed=5)
    flat = model.to_flat()
    back = TinyBiLSTM.from_flat(flat, n_in=len(FEATURE_NAMES))
    X = np.random.default_rng(0).standard_normal((7, len(FEATURE_NAMES)))
    assert np.allclose(model.scores(X), back.scores(X))
    with pytest.raises(ValueError):  # short vector: reshape or size check
        TinyBiLSTM.from_flat(flat[:-5], n_in=len(FEATURE_NAMES))


def test_lstm_through_distributed_pipeline(spark, tmp_path):
    model, acc = train_lstm(n_convs=30, epochs=60)
    assert acc >= 0.97
    save_model(str(tmp_path / "lstm.json"), model.to_flat(), 0.0, kind="lstm",
               meta={"train_accuracy": acc})
    cfg = config_with_model(str(tmp_path / "lstm.json"))
    assert cfg.classifier == "lstm"
    held_out = synth_transcripts(spark, 45).where(F.col("conv_id") > "conv00000029")
    got = extract(held_out, cfg).select("conv_id", "turn_idx", "extracted_text")
    want = extract(held_out).select("conv_id", "turn_idx",
                                    F.col("extracted_text").alias("want"))
    j = got.join(want, ["conv_id", "turn_idx"])
    n = j.count()
    n_match = j.where(F.col("extracted_text") == F.col("want")).count()
    assert n_match / n >= 0.95, f"{n_match}/{n}"
