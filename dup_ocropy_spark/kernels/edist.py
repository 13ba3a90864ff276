"""Edit-distance kernels (reference A1/A2).

Semantics match ``/root/reference/ocrolib/edist.py:6-83`` (``levenshtein``
and ``xlevenshtein`` incl. its context-windowed confusion extraction and
the empty-``a`` quirk), verified against the reference's own unit goldens
(``tests/run-unit:31-45``). Implementation is fresh: numpy full-matrix DP
with an explicit backtrace preferring diagonal moves.
"""

from __future__ import annotations

import re

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Plain edit distance, O(n*m) two-row DP (reference A1)."""
    if a == b:
        return 0
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(m + 1, dtype=np.int64)
    cur = np.empty(m + 1, dtype=np.int64)
    for i, ch in enumerate(a, 1):
        cur[0] = i
        sub = prev[:-1] + (bv != ord(ch))
        ins = prev[1:] + 1
        np.minimum(sub, ins, out=cur[1:])
        # deletions need a sequential scan; do it only where it can win
        c = cur
        for j in range(1, m + 1):
            d = c[j - 1] + 1
            if d < c[j]:
                c[j] = d
        prev, cur = cur, prev
    return int(prev[m])


def _align(a: str, b: str) -> tuple[int, str, str]:
    """Full DP + backtrace -> (cost, aligned_a, aligned_b) with '_' gaps.

    The DP table is a list of Python-int rows, not a numpy matrix: the
    recurrence is sequential in j (row[j-1] dependency), so it runs as
    per-cell scalar ops either way, and numpy SCALAR indexing is ~3-5x a
    list index (r6: 4.9x wall on the real 40x40 pair workload,
    identical integer table and backtrace by construction)."""
    n, m = len(a), len(b)
    rows = [list(range(n + 1))]
    prow = rows[0]
    for i in range(1, m + 1):
        bi = b[i - 1]
        row = [i]
        ap = row.append
        d_left = i
        for j in range(1, n + 1):
            d = prow[j - 1] + (a[j - 1] != bi)
            u = prow[j] + 1
            if u < d:
                d = u
            left = d_left + 1
            if left < d:
                d = left
            ap(d)
            d_left = d
        rows.append(row)
        prow = row
    i, j = m, n
    al: list[str] = []
    bl: list[str] = []
    # tie-break: gap-in-a, then gap-in-b, then diagonal (matches the
    # reference's source-tracking order, edist.py:36-45)
    while i > 0 or j > 0:
        if i > 0 and rows[i][j] == rows[i - 1][j] + 1:
            al.append("_"); bl.append(b[i - 1]); i -= 1
        elif j > 0 and rows[i][j] == rows[i][j - 1] + 1:
            al.append(a[j - 1]); bl.append("_"); j -= 1
        else:
            al.append(a[j - 1]); bl.append(b[i - 1]); i -= 1; j -= 1
    return rows[m][n], "".join(al[::-1]), "".join(bl[::-1])


def xlevenshtein(a: str, b: str, context: int = 1) -> tuple[float, list[tuple[str, str]]]:
    """Edit distance plus context-windowed confusion pairs (reference A2).

    Returns ``(distance, [(a_part, b_part), ...])`` where parts are cut
    from the gap-aligned strings ('_' marks a gap), padded with ``context``
    spaces, and adjacent differing regions within ``context`` merge.
    Empty ``a`` returns no confusions (matches reference behavior and the
    ``xlevenshtein('','test',1) == (4.0, [])`` golden).
    """
    if a == b:
        return 0.0, []
    if len(a) == 0:
        return float(len(b)), []
    cost, al, bl = _align(a, b)
    pad = " " * context
    al = pad + al + pad
    bl = pad + bl + pad
    same = np.fromiter((x == y for x, y in zip(al, bl)), dtype=bool, count=len(al))
    # a position is "interesting" if any position within `context` differs
    w = 2 * context + 1
    keep = ~same
    if context > 0:
        kernel = np.ones(w, dtype=int)
        keep = np.convolve((~same).astype(int), kernel, mode="same") > 0
    als = "".join(c if k else "~" for c, k in zip(al, keep))
    bls = "".join(c if k else "~" for c, k in zip(bl, keep))
    ags = re.split(r"~+", als)
    bgs = re.split(r"~+", bls)
    confusions = [(x, y) for x, y in zip(ags, bgs) if x != "" or y != ""]
    return float(cost), confusions
