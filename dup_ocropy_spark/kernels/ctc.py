"""CTC-style target preparation and forward-backward alignment (L9/L10).

Reference behavior: ``ocrolib/lstm.py:715-838`` — ``make_target`` builds a
blank-interleaved unary state sequence from a class list; the
forward-backward pass aligns network posteriors against those states and
returns per-timestep soft class targets (so a sequence model can train
from a collapsed label sequence with no per-timestep labels).

Graft recast: "time" is the block index within a turn, classes are the
block-label vocabulary (0 = boilerplate/blank, 1.. = content labels), and
the collapsed sequence is the turn's content-segment order — supervision a
labeling pass produces naturally, without per-block annotations.

Fresh implementation notes (not a port): the DP runs on ``np.logaddexp``
over whole state vectors instead of an elementwise approximate log-add,
and the stay/advance recurrence is expressed as one vectorized update per
timestep. Everything is pure numpy — the distributed layer calls this
inside Arrow batches only (kernels import no Spark).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-5
_SKIP = -5.0  # log-penalty per skipped leading state (reference default)


def make_target(cs: list[int] | np.ndarray, nc: int) -> np.ndarray:
    """Blank-interleaved unary state matrix for class sequence ``cs``:
    states are blank, cs[0], blank, cs[1], ..., blank — shape
    (2*len(cs)+1, nc), one 1.0 per row (class 0 is the blank)."""
    cs = np.asarray(cs, dtype=int)
    if nc < 2:
        raise ValueError("need at least blank + one class")
    if len(cs) and (cs.min() < 1 or cs.max() >= nc):
        raise ValueError("classes must be in [1, nc)")
    states = np.zeros((2 * len(cs) + 1, nc))
    states[::2, 0] = 1.0          # blanks at even states
    if len(cs):
        states[1::2, cs] = 0.0    # (no-op, keeps shape explicit)
        states[np.arange(1, 2 * len(cs), 2), cs] = 1.0
    return states


def _forward(lmatch: np.ndarray, skip: float = _SKIP) -> np.ndarray:
    """Forward DP over log state-match scores (T, S): at each timestep a
    path either stays in its state or advances by one, paying only the
    match cost; skipping s leading states before t=0..i costs skip each."""
    T, S = lmatch.shape
    v = skip * np.arange(S, dtype=float)
    out = np.empty((T, S))
    for t in range(T):
        adv = np.empty(S)
        adv[0] = skip * t          # still parked before the first state
        adv[1:] = v[:-1]           # advanced from the previous state
        v = np.logaddexp(v, adv) + lmatch[t]
        out[t] = v
    return out


def forward_backward(lmatch: np.ndarray, skip: float = _SKIP) -> np.ndarray:
    """Total log path mass through each (timestep, state): forward plus the
    forward pass of the time- and state-reversed problem."""
    fwd = _forward(lmatch, skip)
    bwd = _forward(lmatch[::-1, ::-1], skip)[::-1, ::-1]
    return fwd + bwd


def ctc_align_targets(outputs: np.ndarray, targets: np.ndarray,
                      lo: float = _EPS) -> np.ndarray:
    """Align classifier posteriors (T, nc) to a state sequence (S, nc);
    return per-timestep soft class targets (T, nc), rows summing to 1.

    Same contract as the reference aligner (lstm.py:788-838): floor +
    renormalize the posteriors, score states by log dot-product match,
    run forward-backward, normalize state posteriors per timestep, then
    project back to class space.
    """
    outputs = np.maximum(lo, np.asarray(outputs, dtype=float))
    outputs = outputs / outputs.sum(axis=1, keepdims=True)
    lmatch = np.log(outputs @ targets.T)
    both = forward_backward(lmatch)
    state_post = np.exp(both - both.max())
    denom = state_post.sum(axis=0, keepdims=True)
    state_post = state_post / np.where(denom == 0.0, 1e-9, denom)
    aligned = np.maximum(lo, state_post @ targets)
    return aligned / aligned.sum(axis=1, keepdims=True)


def align_sequence(outputs: np.ndarray, cs: list[int] | np.ndarray,
                   nc: int | None = None) -> np.ndarray:
    """Convenience: collapsed class sequence -> aligned soft targets."""
    nc = nc or outputs.shape[1]
    return ctc_align_targets(outputs, make_target(cs, nc))


def collapse(classes: np.ndarray) -> list[int]:
    """translate_back0 analog: collapse a per-timestep argmax sequence to
    its class string (drop blanks, dedupe repeats) — the inverse check for
    alignment tests (lstm.py:727-740)."""
    result: list[int] = []
    prev = 0
    for c in np.asarray(classes, dtype=int):
        if c != prev and c != 0:
            result.append(int(c))
        prev = c
    return result
