"""Property-based invariants over the extraction kernels (hypothesis).

The reference has no randomized testing (SURVEY.md §5.7); these guard the
kernel contracts the distributed layer depends on: never crash, spans
in-bounds/ordered/disjoint, idempotent determinism, normalization
round-trip safety.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dup_ocropy_spark.kernels import extract_turn, normalize_text, segment_payload
from dup_ocropy_spark.kernels.edist import levenshtein

# payload soup: text, markup-ish fragments, separators, unicode stress
_frag = st.one_of(
    st.text(max_size=40),
    st.sampled_from([
        "<p>", "</p>", "<nav>", "</nav>", "<a href=x>", "</a>", "<hr>",
        "<script>", "</script>", "\n\n", "\f", "----\n", "=====\n",
        "&amp;", "&lt;", "“q” ﬁne–x…", "\U0001F600", "<div", ">>",
        "<!-- c -->", "<p attr='a>b'>",
        # self-closing variants: the greedy attr regex eats a trailing
        # '/' when attributes precede it — an uncorrected <a .../> left
        # the anchor depth open forever (round-4 kernel fix)
        "<a href=\"#\"/>", "<a/>", "<br/>", "<nav/>", "<script src=x/>",
    ]),
)
payloads = st.lists(_frag, max_size=30).map("".join)


@settings(max_examples=300, deadline=None)
@given(payloads)
def test_extract_never_crashes_and_spans_wellformed(payload):
    r = extract_turn(payload)
    assert isinstance(r["extracted_text"], str)
    last = -1
    for s in r["spans"]:
        assert 0 <= s["start"] <= s["end"] <= len(payload)
        assert s["start"] >= last, "spans must be ordered and disjoint"
        last = s["end"]
        assert s["label"] == "content"
    if r["reject_reason"] in ("empty", "blank", "too_short", "too_long",
                              "too_many_blocks"):
        assert r["extracted_text"] == "" and r["spans"] == []


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_extract_deterministic(payload):
    assert extract_turn(payload) == extract_turn(payload)


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_segment_ids_dense_and_ordered(payload):
    blocks = segment_payload(payload)
    assert [b.block_id for b in blocks] == list(range(len(blocks)))
    starts = [b.start for b in blocks]
    assert starts == sorted(starts)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abc ", max_size=12), st.text(alphabet="abc ", max_size=12),
       st.text(alphabet="abc ", max_size=12))
def test_levenshtein_metric_properties(a, b, c):
    assert levenshtein(a, b) == levenshtein(b, a)
    assert levenshtein(a, b) >= abs(len(a) - len(b))
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)
    assert (levenshtein(a, b) == 0) == (a == b)


# alphabet for the cross-engine normalization triangle: ASCII prose + every
# homograph char + tab/newline. Excludes \x0b/\x0c (Java \s includes VT/FF,
# RE2's does not — a dialect edge no transcript corpus hits) and NFD
# combining marks (the kernel NFC-normalizes; the column chains document
# that NFC payloads go through the kernel path).
_NORM_ALPHABET = ("abcXYZ 09.,;:!?\t\n" "_~#\"`´" "“”„‟‘’‚‛…′″‴〃µ–—ﬂﬁﬀﬃﬄ")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=_NORM_ALPHABET, max_size=80))
def test_normalize_kernel_duckdb_triple_parity(s):
    """The DuckDB replace-chain generated from the engine's literal table
    (functions/text.normalize_sql — the chain every oracle twin embeds)
    must agree with the authoritative kernel normalize_text on arbitrary
    homograph/whitespace soup. The Spark JVM chain's parity with the
    kernel is pinned in test_functions, closing the three-engine triangle."""
    import duckdb

    from dup_ocropy_spark.functions.text import normalize_sql, sql_quote

    want = normalize_text(s)
    got = duckdb.sql(f"SELECT {normalize_sql(sql_quote(s))} AS n").fetchone()[0]
    assert got == want, (s, got, want)


# ---------------------------------------------------------------- redaction

_EMAILS = st.from_regex(r"[a-z]{1,8}@[a-z]{1,8}\.(com|org|io)", fullmatch=True)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=80), _EMAILS, st.text(max_size=80))
def test_redaction_scrubs_planted_email_anywhere(prefix, email, suffix):
    """Property: whatever surrounds it, a planted well-formed email never
    survives redaction verbatim (DuckDB twin equality is separately
    golden-tested; this fuzzes the pattern envelope)."""
    import re

    from dup_ocropy_spark.operators.redact import PII_PATTERNS

    text = f"{prefix} {email} {suffix}"
    out = text
    for _, pat, tok in PII_PATTERNS:
        out = re.sub(pat, tok, out)
    assert email not in out


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_charlm_score_is_finite_and_batch_invariant(text):
    """avg_logprob is finite for non-empty text, NaN only for empty, and
    independent of what else was in the training batch's count matrix
    shape (pure function of text + table)."""
    import math

    import numpy as np

    from dup_ocropy_spark.kernels import charlm

    L = charlm.logprob_table(charlm.count_bigrams(["seed text for table"]))
    s = charlm.avg_logprob(text, L)
    if text:
        assert math.isfinite(s) and s < 0.0
        assert s == charlm.avg_logprob(text, L)  # deterministic
    else:
        assert math.isnan(s)
