"""Document reassembly (reference H1-H5 analog).

The reference's ``ocropus-hocr:91-153`` walks recognized lines in reading
order and assembles an hOCR document with bbox spans. Here: content
blocks, in payload order, are normalized (T1) and joined with a single
newline; each contributes a char span ``(block_id, start, end, label,
score)`` into the raw payload.
"""

from __future__ import annotations

from dup_ocropy_spark.config import DEFAULT_CONFIG, ExtractConfig
from dup_ocropy_spark.kernels.segment import Block
from dup_ocropy_spark.kernels.textnorm import normalize_text

SPAN_FIELDS = ("block_id", "start", "end", "label", "score")


def reassemble(blocks: list[Block], config: ExtractConfig = DEFAULT_CONFIG
               ) -> tuple[str, list[dict]]:
    """(extracted_text, spans) from classified blocks.

    Blocks must already be in reading order with dense ids (segment_payload
    guarantees both). Only ``content`` blocks contribute; normalization per
    block then newline-join mirrors the reference's per-line text -> page
    assembly under stable ordering.
    """
    parts: list[str] = []
    spans: list[dict] = []
    for b in blocks:
        if b.label != "content":
            continue
        text = normalize_text(b.visible) if config.normalize else b.visible.strip()
        if not text:
            continue
        parts.append(text)
        spans.append({
            "block_id": int(b.block_id),
            "start": int(b.start),
            "end": int(b.end),
            "label": b.label,
            "score": round(float(b.score), 6),
        })
    return "\n".join(parts), spans
