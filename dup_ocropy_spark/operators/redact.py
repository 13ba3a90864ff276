"""PII redaction for training-data curation.

Corpora scraped from transcripts leak emails, phone numbers, and IP
addresses; the standard curation stage replaces them with typed
placeholder tokens BEFORE dedup/packing so (a) the model never sees the
raw identifier and (b) two documents differing only in a masked value
dedup together. All patterns are JVM ``regexp_replace`` chains (pure
whole-stage codegen, zero Python) written in the RE2-compatible subset
(no lookaround/backreferences) so the DuckDB twin is the SAME pattern
string — ``redact_sql`` builds it, and the cross-engine agreement is
asserted in test_redact.py.

Order matters: emails first (an email can contain digit.dot runs the IP
pattern would bite), then IPs, then phones. ``n_redacted`` counts each
pattern at its stage of the chain (on the already-partially-redacted
text), so a hit is never double-counted across patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (name, RE2-safe pattern, replacement token); applied in order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # NANP-ish: 555-867-5309 / 555.867.5309 / (555) 867-5309 / +1 555 867 5309
    ("phone",
     r"(?:\+?1[ .-]?)?(?:\(\d{3}\)[ .-]?|\d{3}[ .-])\d{3}[ .-]\d{4}\b",
     "<PHONE>"),
]


def redact_expr(col) -> tuple[Column, Column]:
    """(redacted text, n_redacted) as Column expressions — one codegen
    chain, counts taken at each stage so patterns never double-count."""
    cur = F.col(col) if isinstance(col, str) else col
    n = F.lit(0)
    for _, pat, tok in PII_PATTERNS:
        n = n + F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, tok)
    return cur, n.cast("bigint")


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace emails / IPs / phone numbers with typed tokens, plus a
    per-document ``n_redacted`` count (curation stats want to know how
    much was masked — a document that is mostly PII is itself suspect)."""
    redacted, n = redact_expr(text_col)
    return (docs.withColumn("n_redacted", n)
            .withColumn(out_col or text_col, redacted))


def redact_sql(expr: str) -> str:
    """DuckDB twin of the redacted-text expression (same patterns, order)."""
    out = expr
    for _, pat, tok in PII_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{tok}', 'g')"
    return out


def n_redacted_sql(expr: str) -> str:
    """DuckDB twin of n_redacted (stage-wise counts, like redact_expr)."""
    parts, cur = [], expr
    for _, pat, tok in PII_PATTERNS:
        p = pat.replace("'", "''")
        parts.append(f"len(regexp_extract_all({cur}, '{p}'))")
        cur = f"regexp_replace({cur}, '{p}', '{tok}', 'g')"
    return " + ".join(parts)
