"""Layout segmentation kernel (reference G1-G20, recast 2-D -> 1-D).

The reference segments a page image into text lines via connected
components, column separators, and seed propagation
(``/root/reference/ocropus-gpageseg:348-375`` ``compute_segmentation``).
Here the "page" is a turn payload (HTML-ish markup or PDF-extracted
layout text) and the analog structures are:

  * connected components   -> contiguous visible-text runs ("blocks")
  * column/line separators  -> block-level tags, ``<hr>``, ASCII rule
    lines, blank-line runs, form feeds (G6/G7 analog)
  * hline removal (P4)      -> separator/rule lines are boundaries, never content
  * speckle removal (P5)    -> blocks shorter than ``noise_min_chars`` are
    labeled ``noise`` downstream (``ocrolib/common.py:861-869``)
  * mask join (G8/J5)       -> ``forced_boundaries`` offsets split blocks
    (``ocropus-gpageseg:268-276``)
  * reading order (O1/O3)   -> blocks sorted by payload position, ids
    densified 0..n-1 (``psegutils.py:127-164``, ``morph.py:229-246``)

Every block carries its raw character extent ``[start, end)`` into the
original payload — these become the output ``spans``.

Pure Python/regex over one payload; called per row from inside an Arrow
batch (the reference is likewise per-page imperative inside
``multiprocessing`` workers).
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass


# Tags that terminate the current block (line-separator analogs).
BLOCK_TAGS = frozenset(
    """p div li ul ol dl dt dd h1 h2 h3 h4 h5 h6 br hr table thead tbody tr td th
    blockquote pre section article main header footer nav aside form fieldset
    figure figcaption address title head body html script style noscript select
    option button textarea iframe""".split()
)

# Containers whose visible text is page furniture (boilerplate).
BOILER_CONTAINERS = frozenset(
    """nav footer aside header form script style noscript select option button
    textarea iframe head title""".split()
)

# Raw-content elements: everything up to the matching close tag is opaque.
RAW_TEXT_TAGS = frozenset(("script", "style"))

_TAG_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<(/?)([a-zA-Z][a-zA-Z0-9-]*)"
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>",
    re.S,
)
_HAS_MARKUP_RE = re.compile(r"<[a-zA-Z/!][^>]*>")
# Structural separators inside text runs: form feed, blank-line run,
# ASCII rule line of 4+ -=_* chars (G6/G7 analog).
# exported pattern STRING: the DuckDB oracle twins derive their block
# splitter from this same literal (single source of truth, like
# functions/text.normalize_sql). Known dialect edge: RE2's (?m)^ anchors
# after \f, Python's re.M does not — a rule line IMMEDIATELY after a
# form feed is visible text here but a separator there (absent from the
# synthetic grammars; documented at the oracle).
PLAIN_SEP_PATTERN = r"\f+|\n[ \t]*\n(?:[ \t]*\n)*|^[ \t]*[-=_*]{4,}[ \t]*$\n?"
_PLAIN_SEP_RE = re.compile(PLAIN_SEP_PATTERN, re.M)
# also exported for the oracle twins (post-segmentation rule-block drop)
RULE_BLOCK_PATTERN = r"^[-=_* \t]*[-=_*]{4,}[-=_* \t]*$"
_RULE_LINE_RE = re.compile(RULE_BLOCK_PATTERN)
# allocation-free fast-path guard for _add_piece: piece could start a rule line
_LEAD_RULE_RE = re.compile(r"[ \t]*[-=_*]")


@dataclass(slots=True)
class Block:
    """A contiguous visible-text run with its raw payload extent."""

    start: int            # raw char offset, inclusive
    end: int              # raw char offset, exclusive
    visible: str          # tag-stripped, entity-decoded text
    kind: str = "text"    # enclosing block element name or 'text'
    link_chars: int = 0   # visible chars inside <a> (link-density feature)
    boiler: bool = False  # inside a boilerplate container
    block_id: int = -1    # dense document-order id, assigned at the end
    label: str = ""       # filled by classify_blocks
    score: float = 0.0    # filled by classify_blocks

    @property
    def n_visible(self) -> int:
        return len(self.visible.strip())

    @property
    def link_density(self) -> float:
        nv = len(self.visible)
        return self.link_chars / nv if nv else 0.0


def _trim_extent(payload: str, start: int, end: int) -> tuple[int, int]:
    """Shrink [start, end) to exclude flanking whitespace so spans are
    tight (content at payload start/end yields start=0 / end=len)."""
    while start < end and payload[start].isspace():
        start += 1
    while end > start and payload[end - 1].isspace():
        end -= 1
    return start, end


class _Assembler:
    """Accumulates visible-text segments into blocks, flushing at
    structural boundaries (the seed-propagation analog: every visible run
    between two separators becomes one labeled region)."""

    def __init__(self, payload: str, forced: list[int] | None):
        self.payload = payload
        self.forced = sorted(set(forced or []))
        self._last_end = 0  # end of the previous text slice (gap tracking)
        self.blocks: list[Block] = []
        # pending segments: (start, end, decoded_text, link_chars, boiler)
        self.segs: list[tuple[int, int, str, int, bool]] = []
        self.kind = "text"

    def flush(self) -> None:
        segs = self.segs
        if not segs:
            return
        if len(segs) == 1:  # fast path: most inter-separator runs are one piece
            s, e, visible, link_chars, boiler = segs[0]
        else:
            s = segs[0][0]
            e = segs[-1][1]
            visible = "".join(t for _, _, t, _, _ in segs)
            link_chars = sum(lc for _, _, _, lc, _ in segs)
            boiler = any(bo for _, _, _, _, bo in segs)
        kind = self.kind
        self.segs = []
        if not visible.strip():
            return
        s, e = _trim_extent(self.payload, s, e)
        self.blocks.append(
            Block(start=s, end=e, visible=visible, kind=kind,
                  link_chars=link_chars, boiler=boiler)
        )

    def add_text(self, s: int, e: int, in_link: bool, boiler: bool, kind: str) -> None:
        """Add raw payload slice [s, e); splits at plain separators and
        forced boundaries, flushing between pieces."""
        if s >= e:
            return
        if self.forced:
            # a boundary at the slice start OR inside the preceding tag
            # markup gap (last_end < p <= s) must still split: the
            # pending text accumulated from earlier slices flushes
            # before this slice begins — the strict interior filter
            # below cannot see boundaries that fall between slices
            if self.segs and any(self._last_end <= p <= s
                                 for p in self.forced):
                self.flush()
            # forced boundary offsets inside this slice (mask-join analog)
            bounds = [s] + [p for p in self.forced if s < p < e] + [e]
            for i in range(len(bounds) - 1):
                if i > 0:
                    self.flush()
                self._add_piece(bounds[i], bounds[i + 1], in_link, boiler, kind)
        else:
            self._add_piece(s, e, in_link, boiler, kind)
        self._last_end = e

    def _add_piece(self, s: int, e: int, in_link: bool, boiler: bool, kind: str) -> None:
        text = self.payload[s:e]
        # fast path: every separator needs \n, \f, or a whole-piece rule
        # line (^...$ matches piece edges); most inter-tag runs have none
        if ("\n" in text or "\f" in text
                or _LEAD_RULE_RE.match(text) is not None):
            last = 0
            for mm in _PLAIN_SEP_RE.finditer(text):
                self._emit(s + last, s + mm.start(), text[last:mm.start()],
                           in_link, boiler, kind)
                self.flush()
                last = mm.end()
            self._emit(s + last, e, text[last:], in_link, boiler, kind)
        else:
            self._emit(s, e, text, in_link, boiler, kind)

    def _emit(self, s: int, e: int, text: str, in_link: bool, boiler: bool, kind: str) -> None:
        if not text:
            return
        decoded = _html.unescape(text) if "&" in text else text
        lc = len(decoded) if in_link else 0
        if not self.segs:
            self.kind = kind
        self.segs.append((s, e, decoded, lc, boiler))

    def finish(self) -> list[Block]:
        self.flush()
        return self.blocks


def _segment_html_fast(payload: str) -> list[Block]:
    """No-forced-boundaries specialization of ``_segment_html``: the
    assembler's per-slice method chain (add_text -> _add_piece -> _emit ->
    flush) is inlined into one loop body — identical block output (the
    parity test in test_kernels sweeps both paths over the adversarial
    corpus), ~35%% less per-payload wall. The general path below stays the
    single source of truth for the forced/mask join."""
    blocks: list[Block] = []
    segs: list[tuple[int, int, str, int, bool]] = []
    seg_kind = "text"
    pos = 0
    a_depth = 0
    raw_until: str | None = None
    kind = "text"
    boiler_stack: list[str] = []
    unescape = _html.unescape
    finditer = _TAG_RE.finditer
    lead_rule_match = _LEAD_RULE_RE.match
    sep_finditer = _PLAIN_SEP_RE.finditer

    def flush() -> None:
        # identical to _Assembler.flush
        if len(segs) == 1:
            s, e, visible, link_chars, boiler = segs[0]
        else:
            s = segs[0][0]
            e = segs[-1][1]
            visible = "".join(t[2] for t in segs)
            link_chars = sum(t[3] for t in segs)
            boiler = any(t[4] for t in segs)
        segs.clear()
        if not visible.strip():
            return
        s, e = _trim_extent(payload, s, e)
        blocks.append(Block(start=s, end=e, visible=visible, kind=seg_kind,
                            link_chars=link_chars, boiler=boiler))

    for m in finditer(payload):
        closing_s, name, attrs_s, selfclose_s = m.groups()
        mstart, mend = m.span()
        if raw_until is not None:
            if closing_s == "/" and (name or "").lower() == raw_until:
                if raw_until in boiler_stack:
                    boiler_stack.remove(raw_until)
                raw_until = None
            pos = mend
            continue
        if mstart > pos:
            text = payload[pos:mstart]
            in_link = a_depth > 0
            boiler = bool(boiler_stack)
            if "\n" in text or "\f" in text or (
                    text[0] in "-=_* \t"
                    and lead_rule_match(text) is not None):
                # separator-splitting path (_add_piece slow branch);
                # first-char guard: _LEAD_RULE_RE is [ \t]*[-=_*] anchored
                # at the start, so it can only match when the run opens
                # with rule/space chars — skips the regex for the common
                # letter-initial run
                last = 0
                for mm in sep_finditer(text):
                    piece = text[last:mm.start()]
                    if piece:
                        decoded = unescape(piece) if "&" in piece else piece
                        if not segs:
                            seg_kind = kind
                        segs.append((pos + last, pos + mm.start(), decoded,
                                     len(decoded) if in_link else 0, boiler))
                    if segs:
                        flush()
                    last = mm.end()
                piece = text[last:]
                if piece:
                    decoded = unescape(piece) if "&" in piece else piece
                    if not segs:
                        seg_kind = kind
                    segs.append((pos + last, mstart, decoded,
                                 len(decoded) if in_link else 0, boiler))
            else:
                decoded = unescape(text) if "&" in text else text
                if not segs:
                    seg_kind = kind
                segs.append((pos, mstart, decoded,
                             len(decoded) if in_link else 0, boiler))
        if name:
            name = name.lower()
            closing = closing_s == "/"
            a = attrs_s or ""
            selfclose = selfclose_s == "/" or (
                a.endswith("/")
                and (len(a) == 1 or a[-2] in "\"' \t\n\r\f"))
            if name == "a" and not selfclose:
                a_depth = a_depth + 1 if not closing else max(0, a_depth - 1)
            if name in BLOCK_TAGS:
                if segs:
                    flush()
                kind = name if not closing else "text"
                seg_kind = kind
            if name in BOILER_CONTAINERS:
                if closing:
                    for k in range(len(boiler_stack) - 1, -1, -1):
                        if boiler_stack[k] == name:
                            del boiler_stack[k:]
                            break
                elif not selfclose:
                    boiler_stack.append(name)
                    if name in RAW_TEXT_TAGS:
                        raw_until = name
        pos = mend
    if pos < len(payload):
        text = payload[pos:]
        in_link = a_depth > 0
        boiler = bool(boiler_stack)
        if "\n" in text or "\f" in text or (
                text[0] in "-=_* \t"
                and lead_rule_match(text) is not None):
            last = 0
            for mm in sep_finditer(text):
                piece = text[last:mm.start()]
                if piece:
                    decoded = unescape(piece) if "&" in piece else piece
                    if not segs:
                        seg_kind = kind
                    segs.append((pos + last, pos + mm.start(), decoded,
                                 len(decoded) if in_link else 0, boiler))
                if segs:
                    flush()
                last = mm.end()
            piece = text[last:]
            if piece:
                decoded = unescape(piece) if "&" in piece else piece
                if not segs:
                    seg_kind = kind
                segs.append((pos + last, len(payload), decoded,
                             len(decoded) if in_link else 0, boiler))
        else:
            decoded = unescape(text) if "&" in text else text
            if not segs:
                seg_kind = kind
            segs.append((pos, len(payload), decoded,
                         len(decoded) if in_link else 0, boiler))
    if segs:
        flush()
    return blocks


def _segment_plain_fast(payload: str) -> list[Block]:
    """No-forced-boundaries specialization of ``_segment_plain`` (same
    inlining rationale as ``_segment_html_fast``)."""
    blocks: list[Block] = []
    n = len(payload)
    if "\n" in payload or "\f" in payload \
            or _LEAD_RULE_RE.match(payload) is not None:
        pieces: list[tuple[int, int]] = []
        last = 0
        for mm in _PLAIN_SEP_RE.finditer(payload):
            pieces.append((last, mm.start()))
            last = mm.end()
        pieces.append((last, n))
    else:
        pieces = [(0, n)]
    unescape = _html.unescape
    for s, e in pieces:
        if s >= e:
            continue
        text = payload[s:e]
        decoded = unescape(text) if "&" in text else text
        if not decoded.strip():
            continue
        ts, te = _trim_extent(payload, s, e)
        blocks.append(Block(start=ts, end=te, visible=decoded, kind="text"))
    return blocks


def _segment_html(payload: str, forced: list[int] | None) -> list[Block]:
    if not forced:
        return _segment_html_fast(payload)
    asm = _Assembler(payload, forced)
    pos = 0
    a_depth = 0
    raw_until: str | None = None  # inside <script>/<style>
    kind = "text"
    boiler_stack: list[str] = []

    for m in _TAG_RE.finditer(payload):
        closing_s, name, attrs_s, selfclose_s = m.group(1, 2, 3, 4)
        if raw_until is not None:
            # inside a raw-text element: only the matching close tag ends it
            if closing_s == "/" and (name or "").lower() == raw_until:
                if raw_until in boiler_stack:
                    boiler_stack.remove(raw_until)
                raw_until = None
            pos = m.end()
            continue
        if m.start() > pos:
            asm.add_text(pos, m.start(), a_depth > 0, bool(boiler_stack), kind)
        if name:
            name = name.lower()
            closing = closing_s == "/"
            # the greedy attribute group consumes a trailing '/' when
            # attributes are present ('<a href="#"/>' -> attrs ' href="#"/',
            # group 4 empty), so self-close must also look at the attr
            # tail. HTML5 nuance: a '/' ending an UNQUOTED value
            # ('<a href=http://x.com/>') is part of the value, NOT a
            # self-close — so the trailing '/' only counts when it is the
            # whole attr string or follows a quote or whitespace
            a = attrs_s or ""
            selfclose = selfclose_s == "/" or (
                a.endswith("/")
                and (len(a) == 1 or a[-2] in "\"' \t\n\r\f"))
            if name == "a" and not selfclose:
                # a self-closing <a/> has no content: counting it open
                # would mark ALL subsequent text as link chars (density
                # 1.0 -> everything boilerplate) with no close to undo it
                a_depth = a_depth + 1 if not closing else max(0, a_depth - 1)
            if name in BLOCK_TAGS:
                if asm.segs:  # skip the call for adjacent block tags
                    asm.flush()
                kind = name if not closing else "text"
                asm.kind = kind
            if name in BOILER_CONTAINERS:
                if closing:
                    # pop the innermost matching open (tolerates bad nesting)
                    for k in range(len(boiler_stack) - 1, -1, -1):
                        if boiler_stack[k] == name:
                            del boiler_stack[k:]
                            break
                elif not selfclose:
                    boiler_stack.append(name)
                    if name in RAW_TEXT_TAGS:
                        raw_until = name
        pos = m.end()
    if pos < len(payload):
        asm.add_text(pos, len(payload), a_depth > 0, bool(boiler_stack), kind)
    return asm.finish()


def _segment_plain(payload: str, forced: list[int] | None) -> list[Block]:
    if not forced:
        return _segment_plain_fast(payload)
    asm = _Assembler(payload, forced)
    asm.add_text(0, len(payload), in_link=False, boiler=False, kind="text")
    return asm.finish()


def segment_payload(payload: str, forced_boundaries: list[int] | None = None) -> list[Block]:
    """Segment one payload into document-ordered blocks with raw extents.

    Auto-detects markup: payloads containing tags go through the HTML
    tokenizer; plain/layout text (e.g. PDF-extracted ``tool`` payloads)
    splits on form feeds, blank-line runs, and ASCII rules.
    """
    if not payload:
        return []
    if _HAS_MARKUP_RE.search(payload):
        blocks = _segment_html(payload, forced_boundaries)
    else:
        blocks = _segment_plain(payload, forced_boundaries)
    # hline-removal analog (P4): rule-only blocks are separators, not content
    blocks = [b for b in blocks if not _RULE_LINE_RE.match(b.visible.strip())]
    # reading order + dense renumber (O1/O3/G16): payload order, ids 0..n-1
    blocks.sort(key=lambda b: (b.start, b.end))
    for i, b in enumerate(blocks):
        b.block_id = i
    return blocks
