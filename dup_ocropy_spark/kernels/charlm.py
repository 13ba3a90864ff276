"""Character-bigram language model for perplexity-based quality filtering.

The CCNet recipe (Wenzek et al. 2020) scores web documents with a small
LM trained on clean text and drops the worst-perplexity tail — gibberish,
encoding garbage, and machine noise score far from prose. A char-bigram
model is the smallest useful instance: a 257x257 count matrix (256 byte
buckets + BOS) is enough to separate prose from noise by orders of
magnitude, trains from a bounded sample in one pass, and broadcasts in
~0.5 MB to every executor.

Spark-free numpy kernel (the repo kernel rule): ``count_bigrams`` /
``merge_counts`` / ``avg_logprob`` are pure functions; the Spark layer
(operators/lmquality.py) only distributes batches and broadcasts the
fitted table.
"""

from __future__ import annotations

import numpy as np

V = 257          # 256 byte buckets + BOS row
BOS = 256


def _codes(text: str) -> np.ndarray:
    """Text -> uint8 byte-bucket codes (UTF-8 bytes; multi-byte chars
    spread over their bytes, which is fine for a noise discriminator)."""
    return np.frombuffer(text.encode("utf-8"), dtype=np.uint8)


def count_bigrams(texts) -> np.ndarray:
    """(V, V) int64 bigram count matrix over an iterable of strings,
    with a BOS->first-char transition per text. Vectorized: one
    np.add.at per text on flattened (prev, cur) indices."""
    M = np.zeros((V, V), dtype=np.int64)
    for t in texts:
        if not t:
            continue
        c = _codes(t)
        M[BOS, c[0]] += 1
        if len(c) > 1:
            np.add.at(M.reshape(-1), c[:-1].astype(np.int64) * V + c[1:], 1)
    return M


def logprob_table(M: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Counts -> float32 log P(cur | prev) with add-alpha smoothing."""
    sm = M + alpha
    return np.log(sm / sm.sum(axis=1, keepdims=True)).astype(np.float32)


def avg_logprob(text: str, L: np.ndarray) -> float:
    """Mean per-byte log-probability of ``text`` under the table (higher
    = more prose-like; exp(-avg) is the per-byte perplexity)."""
    if not text:
        return float("nan")
    c = _codes(text).astype(np.int64)
    total = L[BOS, c[0]]
    if len(c) > 1:
        total = total + L[c[:-1], c[1:]].sum()
    return float(total / len(c))
