"""JVM-side text normalization (reference T1/T2 as Column expressions).

The kernel ``normalize_text`` (kernels/textnorm.py) is the authoritative
implementation used inside the fused extraction UDF. This module mirrors
the homograph table as a ``regexp_replace``/``replace`` chain for callers
that only need normalization — it stays inside whole-stage codegen, never
touching Python. NFC is the one piece Java regex can't express; Spark's
default UTF8 handling matches for all our ASCII/precomposed fixtures, and
payloads that need true NFC go through the kernel path.

Parity with the kernel table is pinned by tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# literal (non-regex) single-char replacements, applied via F.replace
_LITERAL = [
    ('"', "''"),
    ("`", "'"),
    ("´", "'"),
    ("“", "''"), ("”", "''"), ("„", "''"), ("‟", "''"),
    ("‘", "'"), ("’", "'"), ("‚", "'"), ("‛", "'"),
    ("…", "..."),
    ("′", "'"), ("″", "''"), ("‴", "'''"), ("〃", "''"),
    ("µ", "μ"),
    ("–", "-"), ("—", "-"),
    ("ﬂ", "fl"), ("ﬁ", "fi"), ("ﬀ", "ff"), ("ﬃ", "ffi"), ("ﬄ", "ffl"),
]


def normalize_text_col(col: Column | str) -> Column:
    """Whitespace collapse + homograph canonicalization, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "[_~#]", "~")
    for a, b in _LITERAL:
        c = F.replace(c, F.lit(a), F.lit(b))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def sql_quote(s: str) -> str:
    """ANSI string literal (for generated DuckDB oracle SQL)."""
    return "'" + s.replace("'", "''") + "'"


def normalize_sql(expr: str) -> str:
    """DuckDB equivalent of ``normalize_text_col`` over a SQL expression,
    generated from the SAME literal table — the oracle twins of every
    extraction query share the full homograph chain with the engine by
    construction (an oracle hand-listing a subset of the table stays green
    on driver corpora that lack the other chars and breaks on real data).
    Replacement order is irrelevant: no replacement output re-matches a
    later pattern (asserted against the kernel in tests)."""
    e = f"regexp_replace({expr}, '[_~#]', '~', 'g')"
    for a, b in _LITERAL:
        e = f"replace({e}, {sql_quote(a)}, {sql_quote(b)})"
    return f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"


_PROJECTIONS = {
    "nospace": r"\s",
    "spletdig": "[^A-Za-z0-9 ]",
    "letdig": "[^A-Za-z0-9]",
    "letters": "[^A-Za-z]",
    "digits": "[^0-9]",
    "lnc": "[^A-Z]",
}


def project_text_col(col: Column | str, kind: str = "exact") -> Column:
    """project_text as a Column expression (ocrolib/common.py:60-81)."""
    c = normalize_text_col(col)
    c = F.regexp_replace(c, r"( *[.] *){4,}", "....")
    c = F.regexp_replace(c, "[~_]", "")
    if kind == "exact":
        return c
    if kind == "lnc":
        c = F.upper(c)
    if kind not in _PROJECTIONS:
        raise ValueError(f"unknown projection: {kind}")
    return F.regexp_replace(c, _PROJECTIONS[kind], "")


def normalized_text(col) -> Column:
    """The whitespace-collapsed, case-folded comparison form — the ONE
    normalization chain under every content-identity key (fingerprints,
    streaming LSH band shingles). Kept as its own helper so a tweak here
    reaches every consumer at once instead of silently desynchronizing
    an inlined copy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def normalized_fp(col) -> Column:
    """md5 over ``normalized_text`` — ONE definition shared by
    quality_score's fp column and incremental snapshot dedup (a
    normalization tweak applied anywhere else would silently
    desynchronize persisted fingerprint tables from freshly computed
    fps). The STREAMING keys (streaming/extract_stream._payload_fp)
    wrap this with a blank-turn identity sentinel — tweak BOTH or
    persisted turn-fp tables desync. NOTE: the exact-dedup operators
    (dedup_exact / exact_keep_first) key on RAW md5(text) —
    byte-identity, a deliberately stricter relation."""
    return F.md5(normalized_text(col))
