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

import re
from collections import Counter

# end-of-word sentinel so merges can't cross word boundaries and a
# word-final symbol is distinct from a word-internal one (standard BPE)
EOW = "</w>"

# The ONE word-boundary definition, as an explicit character set shared
# by every splitter (kernel, Spark, token counting). Python str.split()
# and Java \s+ disagree at the margins (str.split() takes U+1C-1F and
# U+00A0; default Java \s is ASCII-only), and a codec trained on one
# segmentation while counting tokens under another silently violates the
# 'IDENTICAL merges' contract — so neither engine default is used.
# This set = ASCII whitespace + NEL + the Unicode White_Space spaces.
WS_CHARS = (" \t\n\x0b\f\r\x85\xa0\u1680"
            + "".join(chr(c) for c in range(0x2000, 0x200B))
            + "\u2028\u2029\u202f\u205f\u3000")
_WS_RE = re.compile("[" + re.escape(WS_CHARS) + "]+")


def split_words(text: str) -> list[str]:
    """Split on the shared WS_CHARS class, dropping empties — the single
    word segmentation every BPE consumer uses."""
    return [w for w in _WS_RE.split(text) if w]


def ws_regex_java() -> str:
    """The same character class as a Java regex (for ``F.split``) — built
    from WS_CHARS so the two engines cannot drift."""
    return "[" + "".join("\\u%04X" % ord(c) for c in WS_CHARS) + "]+"


def word_counts(texts) -> dict[str, int]:
    """Whitespace word frequency over an iterable of strings (case kept:
    the codec must round-trip the corpus as-is)."""
    c: Counter = Counter()
    for t in texts:
        if isinstance(t, str):
            c.update(split_words(t))
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


def select_batch_from_sorted(cands: list[tuple[str, str]],
                             k: int) -> list[tuple[str, str]]:
    """Greedy batch selection over an already (count desc, lex)-sorted
    candidate list: take up to ``k`` pairs whose symbols are mutually
    disjoint — AND disjoint from every already-produced merged symbol, so
    no selected pair's measured count can be invalidated by an earlier
    selection in the same round. Shared verbatim by the kernel and the
    distributed trainer (the equality contract)."""
    used: set[str] = set()
    sel: list[tuple[str, str]] = []
    for a, b in cands:
        if len(sel) >= k:
            break
        if a in used or b in used:
            continue
        sel.append((a, b))
        used.update((a, b, a + b))
    return sel


def scan_window(k: int) -> int:
    """How deep both engines look for batch candidates each round. Part
    of the determinism contract: the distributed trainer collects exactly
    this many top pairs, so the kernel must not scan further either."""
    return 4 * k


def bpe_merges_batched(wc: dict[str, int], n_merges: int,
                       k: int = 8) -> list[tuple[str, str]]:
    """Batched BPE: per round, select up to ``k`` symbol-disjoint pairs
    from the top ``scan_window(k)`` candidates (count desc, lex — the
    sequential tie-break) and apply them in one pass. O(rounds/k) passes
    instead of one per merge — the scheduler-latency fix for corpus-scale
    training. ``k=1`` degenerates to ``bpe_merges`` exactly (test-pinned).

    The merge LIST can differ from the sequential greedy's (selecting k
    pairs up front forgoes the recount between them — the standard
    batched-BPE trade); what is pinned is kernel == distributed for the
    same (corpus, n_merges, k), and encode/decode round-trip under the
    batched list."""
    vocab = {_symbolize(w): c for w, c in wc.items() if w}
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        k_round = min(k, n_merges - len(merges))
        pairs = pair_counts(vocab)
        cands = sorted((p for p in pairs if pairs[p] >= 2),
                       key=lambda p: (-pairs[p], p))[:scan_window(k_round)]
        sel = select_batch_from_sorted(cands, k_round)
        if not sel:
            break
        merges.extend(sel)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            for a, b in sel:
                syms = merge_pair(syms, a, b)
            new_vocab[syms] = new_vocab.get(syms, 0) + c
        vocab = new_vocab
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
