"""Byte-pair-encoding codec training (reference L12, corpus-scale).

The reference's ``Codec`` (``/root/reference/ocrolib/lstm.py:418-464``)
builds a char vocabulary from ground-truth text and round-trips strings
through integer codes. The corpus-scale analog is a learned subword
codec: BPE (Sennrich et al. 2016) — start from characters, repeatedly
merge the most frequent adjacent symbol pair. This module is the
Spark-free reference implementation; ``operators/codec.py`` distributes
the counting and must produce IDENTICAL merges (test-pinned).

Determinism: ties on pair count break by lexicographically smallest
pair — both implementations share this rule, so merge lists compare
exactly.
"""

from __future__ import annotations

from collections import Counter

# end-of-word sentinel so merges can't cross word boundaries and a
# word-final symbol is distinct from a word-internal one (standard BPE)
EOW = "</w>"


def word_counts(texts) -> dict[str, int]:
    """Whitespace word frequency over an iterable of strings (case kept:
    the codec must round-trip the corpus as-is)."""
    c: Counter = Counter()
    for t in texts:
        if isinstance(t, str):
            c.update(t.split())
    return dict(c)


def _symbolize(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,) if word else ()


def pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for syms, c in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += c
    return pairs


def merge_pair(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Left-to-right, non-overlapping merge of adjacent (a, b) -> a+b."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_merges(wc: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """The merge list (the codec artifact). Stops early when no pair
    repeats."""
    vocab = {_symbolize(w): c for w, c in wc.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        vocab = {merge_pair(s, *best): c for s, c in vocab.items()}
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> tuple[str, ...]:
    """Apply the merge list in training order (the BPE encode rule)."""
    syms = _symbolize(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = merge_pair(syms, a, b)
    return syms


def decode_symbols(syms) -> str:
    """Inverse of encode_word — the Codec round-trip contract."""
    return "".join(syms).replace(EOW, "")
