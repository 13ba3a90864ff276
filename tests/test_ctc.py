"""CTC target prep + forward-backward alignment (L9/L10), kernel-level.

Reference behavior: ocrolib/lstm.py:715-838 (make_target,
forward_algorithm/forwardbackward, ctc_align_targets). Gates: exact
make_target layout, alignment recovers a planted class sequence through
collapse(), posterior rows are distributions, and soft-aligned targets are
good enough to train the block classifier from collapsed sequences alone.
"""

from __future__ import annotations

import numpy as np
import pytest

from dup_ocropy_spark.kernels.ctc import (
    align_sequence, collapse, ctc_align_targets, forward_backward, make_target,
)


def test_make_target_layout():
    t = make_target([2, 1], nc=3)
    expected = np.array([
        [1, 0, 0],   # blank
        [0, 0, 2],   # class 2 -> fixed below
        [1, 0, 0],
        [0, 1, 0],   # class 1
        [1, 0, 0],
    ], dtype=float)
    expected[1] = [0, 0, 1]
    assert t.shape == (5, 3)
    np.testing.assert_array_equal(t, expected)
    assert (t.sum(axis=1) == 1).all()


def test_make_target_validates():
    with pytest.raises(ValueError):
        make_target([0], nc=3)      # blank is not a target class
    with pytest.raises(ValueError):
        make_target([3], nc=3)      # out of vocabulary


def _planted_outputs(seq, nc, seg_len=6, noise=0.15, seed=7):
    """Posterior matrix that follows blank/seq[0]/blank/... segments with
    noise — the alignment must undo the noise."""
    rng = np.random.default_rng(seed)
    rows = []
    for cls in [0] + [c for s in seq for c in (s, 0)]:
        for _ in range(seg_len):
            p = np.full(nc, noise / nc)
            p[cls] += 1.0 - noise
            p += rng.uniform(0, noise / 2, nc)
            rows.append(p / p.sum())
    return np.array(rows)


def test_alignment_recovers_planted_sequence():
    seq = [1, 2, 1, 3]
    outputs = _planted_outputs(seq, nc=4)
    aligned = align_sequence(outputs, seq)
    assert aligned.shape == outputs.shape
    np.testing.assert_allclose(aligned.sum(axis=1), 1.0, atol=1e-9)
    assert collapse(aligned.argmax(axis=1)) == seq


def test_alignment_sharpens_ambiguous_posteriors():
    """Where the classifier is 50/50 between the two target classes, the
    state sequence disambiguates by position."""
    nc = 3
    T = 12
    outputs = np.full((T, nc), 1.0 / nc)  # totally uninformative
    aligned = align_sequence(outputs, [1, 2], nc=nc)
    # earlier half must lean class 1, later half class 2
    mid = T // 2
    assert aligned[:mid, 1].sum() > aligned[:mid, 2].sum()
    assert aligned[mid:, 2].sum() > aligned[mid:, 1].sum()
    np.testing.assert_allclose(aligned.sum(axis=1), 1.0, atol=1e-9)


def test_alignment_handles_zero_probability_columns():
    outputs = np.zeros((8, 3))
    outputs[:, 1] = 1.0   # degenerate classifier
    aligned = ctc_align_targets(outputs, make_target([1], 3))
    assert np.isfinite(aligned).all()
    np.testing.assert_allclose(aligned.sum(axis=1), 1.0, atol=1e-9)


def test_forward_backward_monotone_alignment():
    """The max-posterior state index must be non-decreasing over time
    (paths only stay or advance)."""
    seq = [1, 2, 3]
    outputs = _planted_outputs(seq, nc=4)
    lmatch = np.log(np.maximum(outputs @ make_target(seq, 4).T, 1e-9))
    both = forward_backward(lmatch)
    best_state = both.argmax(axis=1)
    assert (np.diff(best_state) >= 0).all()


def test_alignment_invariant_to_posterior_scaling():
    """The aligner renormalizes inputs, so scaling all posteriors by a
    positive constant must not change the result (property of the
    log-domain DP: a constant per-row offset shifts fwd+bwd uniformly)."""
    seq = [1, 2]
    outputs = _planted_outputs(seq, nc=3, seed=11)
    a = align_sequence(outputs, seq)
    b = align_sequence(outputs * 7.3, seq)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_single_class_alignment_emits_only_blank_or_target():
    """Aligning against a one-class sequence can never hallucinate another
    class: every per-timestep soft target is blank or the target (the
    per-timestep argmax may re-enter the class across blank gaps on random
    posteriors — the state posterior is a distribution over paths, not one
    path — so the collapse may repeat, but never invent)."""
    rng = np.random.default_rng(13)
    for trial in range(5):
        outputs = rng.dirichlet(np.ones(4), size=15)
        aligned = align_sequence(outputs, [2])
        classes = set(aligned.argmax(axis=1))
        assert classes <= {0, 2}, (trial, classes)
        assert set(collapse(aligned.argmax(axis=1))) <= {2}, trial


def test_ctc_soft_targets_train_block_classifier():
    """End goal (reference SeqRecognizer.trainSequence): train the
    bidirectional LSTM from COLLAPSED content-segment sequences only —
    per-block supervision comes from the aligner, not from labels."""
    from dup_ocropy_spark.kernels.lstm import TinyBiLSTM

    rng = np.random.default_rng(3)
    n_in = 4
    seqs, soft_labels, true_labels = [], [], []
    for _ in range(24):
        # blocks alternate boilerplate (feature mean 0) / content (mean 2)
        segs = [0, 1, 0] if rng.random() < 0.5 else [0, 1, 0, 1, 0]
        y = np.concatenate([np.full(int(rng.integers(2, 5)), s) for s in segs])
        X = rng.standard_normal((len(y), n_in)) + 2.0 * y[:, None]
        # weak initial scorer: noisy feature mean as p(content)
        p = 1 / (1 + np.exp(-(X.mean(axis=1) - 1.0 + rng.normal(0, 0.5, len(y)))))
        outputs = np.column_stack([1 - p, p])
        cs = [1] * segs.count(1)          # collapsed sequence only
        aligned = align_sequence(outputs, cs, nc=2)
        seqs.append(X)
        soft_labels.append(aligned[:, 1])  # soft per-block targets
        true_labels.append(y.astype(float))
    model = TinyBiLSTM(n_in, seed=11)
    model.fit(seqs, soft_labels, epochs=40, lr=0.08)
    correct = total = 0
    for X, y in zip(seqs, true_labels):
        pred = (model.scores(X) >= 0.5).astype(float)
        correct += int((pred == y).sum())
        total += len(y)
    acc = correct / total
    assert acc >= 0.9, f"CTC-aligned training accuracy {acc:.3f} < 0.9"
