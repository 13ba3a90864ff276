"""Deterministic synthetic transcript generator (FIXTURES.md section 1).

The reference ships a synthetic-line generator (``ocropus-linegen:128-241``)
that renders random text through random geometry/degradations — but with
*unseeded* ``np.random``. This generator is the transcript analog with
seeds pinned (seed=42 stream per conversation), so any two runs — and any
two partitionings — produce identical tables.

Each turn's payload is assembled from labeled parts, so the expected
extraction is known **by construction** (independent of the segmentation
code under test): content paragraphs vs boilerplate furniture vs
separators vs noise. ``synth_conv`` returns both the transcript rows and
the expected-extraction rows.

Scales distributed: ``synth_transcripts(spark, n_convs)`` fans the same
per-conversation pure function out via ``mapInPandas`` over
``spark.range(n_convs)``, so generation is embarrassingly parallel and
identical at any parallelism level.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from dup_ocropy_spark.kernels.textnorm import normalize_text

EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
TICK_SECONDS = 17
ROLES = ("user", "assistant", "tool", "system")

# fixed vocabulary (no chars that normalize_text rewrites)
_VOCAB = (
    "data spark table query engine block content page line text turn model "
    "layout column batch arrow stream shuffle join window label score span "
    "the a of to in and is for with over under system result output value "
    "partition cluster schema filter scan order group index merge write read"
).split()

_UNICODE_STRESS = (
    "“curly quotes” and ‘single’ ones",
    "ligatures ﬁne ﬂow oﬀer suﬃx waﬄe",
    "5µm gap — long dash – short…",
    "café meets café (NFD vs NFC)",
    "emoji \U0001F600 stays intact",
)

_BOILER_SNIPPETS = (
    '<nav><a href="/">Home</a> <a href="/docs">Documentation pages</a> <a href="/about">About this site</a></nav>',
    '<footer>Copyright 2026 Example Corp · <a href="/privacy">Privacy</a> · <a href="/terms">Terms</a></footer>',
    '<div class="cookie"><button>Accept all cookies</button><button>Reject optional cookies</button></div>',
    '<aside><ul><li><a href="/r1">Related link one</a></li><li><a href="/r2">Related link two</a></li></ul></aside>',
    '<script>window.dataLayer = window.dataLayer || []; function gtag(){dataLayer.push(arguments);}</script>',
    '<style>.main { margin: 0 auto; padding: 1em; } .nav a { color: blue; }</style>',
    '<header><a href="/login">Log in</a> <a href="/signup">Sign up free</a></header>',
)

_SEPARATORS = ("<hr>", "\n\n\n", "--------\n", "========\n")
_NOISE = ("ad", "x1", "##", "»", "[+]", "...", "§2")


def _sentence(rng: np.random.Generator, n_words: int) -> str:
    words = [_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n_words)]
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _content_paragraph(rng: np.random.Generator) -> tuple[str, str]:
    """-> (markup_part, visible_text). Visible text is what extraction
    should recover (pre-normalization)."""
    n_sent = int(rng.integers(1, 4))
    sentences = [_sentence(rng, int(rng.integers(5, 14))) for _ in range(n_sent)]
    if rng.random() < 0.25:
        sentences.append(_UNICODE_STRESS[int(rng.integers(0, len(_UNICODE_STRESS)))])
    body = " ".join(sentences)
    visible = body
    r = rng.random()
    if r < 0.15:
        # one short inline link (low link density -> still content)
        link_word = _VOCAB[int(rng.integers(0, len(_VOCAB)))]
        body = body + ' See <a href="/ref">' + link_word + "</a> also."
        visible = visible + " See " + link_word + " also."
    elif r < 0.25:
        body = body.replace(" and ", " &amp; ", 1)
        visible = visible.replace(" and ", " & ", 1)
    tag = ("p", "li", "h2", "blockquote")[int(rng.integers(0, 4) if rng.random() < 0.2 else 0)]
    return f"<{tag}>{body}</{tag}>", visible


def synth_turn_payload(rng: np.random.Generator) -> tuple[str, str]:
    """-> (html_payload, expected_extracted_text)."""
    parts: list[str] = []
    visibles: list[str] = []
    if rng.random() < 0.7:
        parts.append(_BOILER_SNIPPETS[int(rng.integers(0, 3))])
    if rng.random() < 0.3:
        parts.append(_BOILER_SNIPPETS[int(rng.integers(3, len(_BOILER_SNIPPETS)))])
    n_para = int(rng.integers(1, 9))
    for _ in range(n_para):
        if rng.random() < 0.12:
            parts.append(_SEPARATORS[int(rng.integers(0, len(_SEPARATORS)))])
        if rng.random() < 0.10:
            parts.append(_NOISE[int(rng.integers(0, len(_NOISE)))])
        markup, visible = _content_paragraph(rng)
        parts.append(markup)
        visibles.append(visible)
    if rng.random() < 0.5:
        parts.append(_BOILER_SNIPPETS[1])
    payload = "\n".join(parts)
    expected = "\n".join(normalize_text(v) for v in visibles)
    return payload, expected


def synth_tool_payload(rng: np.random.Generator) -> tuple[str, str]:
    """PDF-extracted-layout-style plain text: form feeds + indentation."""
    pages: list[str] = []
    visibles: list[str] = []
    for _ in range(int(rng.integers(1, 4))):
        paras: list[str] = []
        for _ in range(int(rng.integers(1, 5))):
            indent = " " * int(rng.integers(0, 5))
            body = _sentence(rng, int(rng.integers(6, 18)))
            paras.append(indent + body)
            visibles.append(body)
        if rng.random() < 0.2:
            paras.append("--------")
        pages.append("\n\n".join(paras))
    payload = "\f".join(pages)
    expected = "\n".join(normalize_text(v) for v in visibles)
    return payload, expected


def _plain_text_payload(rng: np.random.Generator) -> tuple[str, str]:
    """Markup-free payload (already-binary passthrough analog)."""
    paras = [_sentence(rng, int(rng.integers(6, 16))) for _ in range(int(rng.integers(1, 4)))]
    payload = "\n\n".join(paras)
    expected = "\n".join(normalize_text(p) for p in paras)
    return payload, expected


# --------------------------------------------------------------------------
# corrupted-markup stress tier: the transcript analog of ocropus-linegen's
# rgeometry/rdistort degradations (ocropus-linegen:52-83,128-241) — instead
# of warping pixels, we damage markup. Extraction must stay crash-free with
# well-formed in-bounds spans on every corruption (tests/test_properties.py);
# by-construction text equality is only claimed for uncorrupted turns.
# --------------------------------------------------------------------------

def _corrupt_payload(rng: np.random.Generator, payload: str) -> str:
    """Apply 1-3 seeded markup corruptions to a well-formed payload."""
    ops = rng.integers(0, 8, size=int(rng.integers(1, 4)))
    for op in ops:
        if not payload:
            break
        cut = int(rng.integers(0, len(payload)))
        if op == 0:      # truncate mid-payload (often mid-tag)
            payload = payload[: max(1, cut)]
        elif op == 1:    # drop one closing tag
            payload = payload.replace("</p>", "", 1)
        elif op == 2:    # stray unescaped '<'
            payload = payload[:cut] + " < " + payload[cut:]
        elif op == 3:    # invalid entity
            payload = payload[:cut] + "&zzz;" + payload[cut:]
        elif op == 4:    # unterminated script island
            payload = payload + "<script>var x = '"
        elif op == 5:    # doubled open tag
            payload = payload.replace("<p>", "<p><p>", 1)
        elif op == 6:    # mixed NFC/NFD: decomposed e + combining acute
            payload = payload[:cut] + "é" + payload[cut:]
        else:            # control chars inside text
            payload = payload[:cut] + "\x00\x0b" + payload[cut:]
    return payload


def turn_count(conv_idx: int, hot_every: int = 0, hot_turns: int = 1200) -> int:
    """Geometric(mean 12) clipped to [1, 300]; every ``hot_every``-th
    conversation is a hot one with ~100x median turns (skew fixture)."""
    rng = np.random.default_rng([42, 7, conv_idx])
    if hot_every and conv_idx % hot_every == 1 % hot_every:
        return hot_turns
    return int(np.clip(rng.geometric(1.0 / 12.0), 1, 300))


def synth_conv(conv_idx: int, hot_every: int = 0, hot_turns: int = 1200,
               corruption_rate: float = 0.0
               ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Generate one conversation -> (transcript_rows, expected_rows).

    Pure function of ``conv_idx`` — identical under any partitioning.
    With ``corruption_rate`` > 0, that fraction of markup turns get seeded
    corruptions (stress tier); their expected_text is None (no
    by-construction claim — only the crash-free/span invariants apply).
    """
    rng = np.random.default_rng([42, conv_idx])
    n_turns = turn_count(conv_idx, hot_every, hot_turns)
    conv_id = f"conv{conv_idx:08d}"
    rows = []
    exp = []
    for t in range(n_turns):
        role = ROLES[t % len(ROLES)]
        text, tool = "", ""
        edge = rng.random()
        if edge < 0.02:
            text, expected = "", ""              # empty-payload fixture
        elif edge < 0.03:
            text, expected = "   \n  ", ""       # whitespace-only fixture
        elif edge < 0.04:
            text, expected = "hi", ""            # too-short fixture
        elif role == "tool":
            tool, expected = synth_tool_payload(rng)
            text = "<p>tool call result attached below in plain layout</p>"
        elif edge < 0.12:
            text, expected = _plain_text_payload(rng)
        else:
            text, expected = synth_turn_payload(rng)
            if corruption_rate and rng.random() < corruption_rate:
                text, expected = _corrupt_payload(rng, text), None
        rows.append((conv_id, np.int32(t), role, text, tool,
                     EPOCH + dt.timedelta(seconds=TICK_SECONDS * (conv_idx * 1301 + t))))
        exp.append((conv_id, np.int32(t), expected))
    tdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    tdf["turn_idx"] = tdf["turn_idx"].astype("int32")
    edf = pd.DataFrame(exp, columns=["conv_id", "turn_idx", "expected_text"])
    edf["turn_idx"] = edf["turn_idx"].astype("int32")
    return tdf, edf


TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")
EXPECTED_SCHEMA = "conv_id string, turn_idx int, expected_text string"


def synth_transcripts(spark, n_convs: int, hot_every: int = 0, hot_turns: int = 1200,
                      partitions: int | None = None, corruption_rate: float = 0.0):
    """Distributed deterministic transcript table (shape = input_hint)."""
    parts = partitions or max(4, spark.sparkContext.defaultParallelism)

    def gen(it):
        for pdf in it:
            for ci in pdf["id"]:
                yield synth_conv(int(ci), hot_every, hot_turns, corruption_rate)[0]

    return (spark.range(n_convs).repartition(parts, "id")
            .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA))


def synth_expected(spark, n_convs: int, hot_every: int = 0, hot_turns: int = 1200,
                   partitions: int | None = None, corruption_rate: float = 0.0):
    """The matching ground-truth extraction table (known by construction);
    corrupted turns carry expected_text = NULL (no equality claim)."""
    parts = partitions or max(4, spark.sparkContext.defaultParallelism)

    def gen(it):
        for pdf in it:
            for ci in pdf["id"]:
                yield synth_conv(int(ci), hot_every, hot_turns, corruption_rate)[1]

    return (spark.range(n_convs).repartition(parts, "id")
            .mapInPandas(gen, schema=EXPECTED_SCHEMA))


def synth_fat_transcripts(spark, n_convs: int = 96, n_paras: int = 100,
                          para_words: int = 380, partitions: int | None = None):
    """Deterministic FAT-payload tier: single-turn conversations whose text
    payload is ~100 KB-1 MB of paragraph-separated prose (the P1 page-size
    envelope analog, reference ocropus-nlbin:61-69 accepts pages up to the
    equivalent of ~1 MB of characters). Each payload segments into
    ``n_paras`` blocks via blank-line runs, so the fused kernel does real
    per-block work, not one giant memcpy. Used by bench.py to measure the
    Arrow-batch-size / peak-memory tradeoff (config.arrow_batch_rows_for)."""
    parts = partitions or max(4, spark.sparkContext.defaultParallelism)

    def gen(it):
        for pdf in it:
            for ci in pdf["id"]:
                ci = int(ci)
                rng = np.random.default_rng([4242, ci])
                paras = []
                for _ in range(n_paras):
                    idx = rng.integers(0, len(_VOCAB), para_words)
                    paras.append(" ".join(_VOCAB[i] for i in idx))
                yield pd.DataFrame({
                    "conv_id": [f"fat{ci:07d}"],
                    "turn_idx": pd.array([0], dtype="int32"),
                    "role": ["user"],
                    "text": ["\n\n".join(paras)],
                    "tool": [""],
                    "ts": [pd.Timestamp("2026-01-01", tz="UTC")
                           + pd.Timedelta(seconds=ci)],
                })

    return (spark.range(n_convs).repartition(parts, "id")
            .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA))


def write_transcripts(spark, path: str, n_convs: int, hot_every: int = 0,
                      hot_turns: int = 1200, shuffle_on_disk: bool = True) -> None:
    """Materialize to parquet; rows are hash-scrambled on disk so readers
    must re-establish (conv_id, turn_idx) order (FIXTURES.md: 'generated
    shuffled on disk to exercise stable re-ordering')."""
    from pyspark.sql import functions as F

    df = synth_transcripts(spark, n_convs, hot_every, hot_turns)
    if shuffle_on_disk:
        # file-count = task-count for the single-wave readers downstream
        # (each file is one row group): the old default (shuffle width =
        # core count) gave the extraction bench exactly ONE wave of
        # tasks, so the slowest task set the wall (guide §2.6 straggler
        # tail). 4 waves amortize task-length variance; the floor keeps
        # small corpora at core-width, and ~5k convs (~65k turns) per
        # file keeps files well clear of small-file pathology.
        par = spark.sparkContext.defaultParallelism
        n_parts = max(par, min(4 * par, n_convs // 5000))
        df = df.repartition(n_parts, F.xxhash64("conv_id", "turn_idx"))
    df.write.mode("overwrite").parquet(path)
