"""Ground-truth prep kernels (reference T5: gt_explode / gt_implode,
``ocrolib/common.py:826-849``).

Transcription strings for training are exploded into per-class lists,
with ``_xx_``-delimited multi-char groups treated as one class (ligature
or multi-char symbol labels); implode reverses it. Used by the training
path to turn labeled text into per-token class sequences.
"""

from __future__ import annotations

import re

_GROUP_RE = re.compile(r"_(.{1,4}?)_")


def gt_explode(s: str) -> list[str]:
    """'ab_fl_c' -> ['a', 'b', 'fl', 'c']; '_' groups mark multi-char
    classes. Lone/unmatched underscores explode to themselves."""
    out: list[str] = []
    pos = 0
    for m in _GROUP_RE.finditer(s):
        out.extend(s[pos:m.start()])
        out.append(m.group(1))
        pos = m.end()
    out.extend(s[pos:])
    return out


def gt_implode(classes: list[str]) -> str:
    """Inverse of gt_explode: multi-char classes re-wrapped in '_'."""
    parts: list[str] = []
    for c in classes:
        if len(c) == 1:
            parts.append(c)
        else:
            parts.append(f"_{c}_")
    return "".join(parts)
