"""The fused extraction chain + single-process reference oracle.

``extract_turn`` is the complete per-turn pipeline (the analog of running
nlbin -> gpageseg -> rpred -> hocr on one page): validation gates ->
segmentation -> classification -> reassembly. ``extract_frame`` applies it
over a pandas DataFrame — this one function body is shared verbatim by

  * the single-process oracle used in tests (ground truth), and
  * the Spark ``mapInPandas`` stage (``plans/extract.py``),

so per-turn text equality between oracle and cluster is by construction
(SURVEY.md section 7.1 design rule 1); the Spark layer is only trusted
with distribution (partitioning, ordering, resume).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dup_ocropy_spark.config import DEFAULT_CONFIG, ExtractConfig
from dup_ocropy_spark.kernels.classify import classify_blocks, classify_blocks_many
from dup_ocropy_spark.kernels.reassemble import reassemble
from dup_ocropy_spark.kernels.segment import segment_payload

# Output columns of the extraction stage, in schema order.
EXTRACT_COLUMNS = (
    "conv_id", "turn_idx", "role", "payload_len", "n_blocks", "n_content",
    "extracted_text", "spans", "reject_reason",
)

EXTRACT_SCHEMA = (
    "conv_id string, turn_idx int, role string, payload_len int, "
    "n_blocks int, n_content int, extracted_text string, "
    "spans array<struct<block_id:int,start:int,end:int,label:string,score:double>>, "
    "reject_reason string"
)


def _gate_and_segment(text: str | None, tool: str | None,
                      forced_boundaries: list[int] | None,
                      config: ExtractConfig) -> tuple[dict, list | None]:
    """Validation gates + segmentation for one turn. Returns (out, blocks);
    blocks is None when a gate rejected the payload (out carries the
    reject_reason)."""
    payload = tool if (tool is not None and tool != "") else (text or "")
    out = {
        "payload_len": len(payload),
        "n_blocks": 0,
        "n_content": 0,
        "extracted_text": "",
        "spans": [],
        "reject_reason": None,
    }
    if payload == "":
        out["reject_reason"] = "empty"                     # empty-input guard (P7)
        return out, None
    if payload.strip() == "":
        out["reject_reason"] = "blank"                     # constant-image analog (N1 None)
        return out, None
    if len(payload) < config.min_payload_chars:
        out["reject_reason"] = "too_short"                 # check_line h<20 analog (P3)
        return out, None
    if len(payload) > config.max_payload_chars:
        out["reject_reason"] = "too_long"                  # check_page >10000px analog (P1)
        return out, None
    blocks = segment_payload(payload, forced_boundaries)
    out["n_blocks"] = len(blocks)
    if len(blocks) > config.max_blocks:
        out["reject_reason"] = "too_many_blocks"           # maxlines gate (gpageseg:432-434)
        return out, None
    return out, blocks


def _finish(out: dict, blocks: list, config: ExtractConfig) -> dict:
    """Reassembly tail shared by the single-turn and batched paths."""
    extracted, spans = reassemble(blocks, config)
    out["extracted_text"] = extracted
    out["spans"] = spans
    out["n_content"] = len(spans)
    return out


def extract_turn(text: str | None, tool: str | None = None,
                 forced_boundaries: list[int] | None = None,
                 config: ExtractConfig = DEFAULT_CONFIG) -> dict:
    """Extract main content from one turn. Never raises on bad input —
    invalid payloads come back with a ``reject_reason`` (the reference's
    check_page/check_line gates print-and-skip, ``ocropus-nlbin:186-190``).
    """
    out, blocks = _gate_and_segment(text, tool, forced_boundaries, config)
    if blocks is None:
        return out
    classify_blocks(blocks, config)
    return _finish(out, blocks, config)


def extract_frame(pdf: pd.DataFrame, config: ExtractConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Vectorized-batch extraction over a pandas frame with columns
    (conv_id, turn_idx, role, text, tool[, mask]). Returns EXTRACT_COLUMNS.

    This is the Arrow-batch body of the Spark stage; row iteration here is
    the same per-item loop the reference runs inside each pool worker —
    except classification, which runs once over ALL surviving rows' blocks
    (``classify_blocks_many``): one feature matrix + one sigmoid per Arrow
    batch instead of per ~6-block document, bit-identical to the per-turn
    path because scoring is shape-independent (asserted in test_kernels).
    """
    n = len(pdf)
    texts = pdf["text"].to_numpy(dtype=object) if "text" in pdf else np.array([None] * n, dtype=object)
    tools = pdf["tool"].to_numpy(dtype=object) if "tool" in pdf else np.array([None] * n, dtype=object)
    masks = pdf["mask"].to_numpy(dtype=object) if "mask" in pdf else None
    # fill output columns directly (no intermediate list-of-dicts: the
    # row-dict detour measured ~15% of batch wall)
    pl = np.empty(n, dtype=np.int32)
    nb = np.empty(n, dtype=np.int32)
    nc = np.empty(n, dtype=np.int32)
    et = np.empty(n, dtype=object)
    sp = np.empty(n, dtype=object)
    rr = np.empty(n, dtype=object)
    # phase 1: gates + segmentation per row; collect survivors for phase 2
    outs: list[dict] = [None] * n  # type: ignore[list-item]
    live_idx: list[int] = []
    live_blocks: list[list] = []
    for i in range(n):
        m = None
        if masks is not None and masks[i] is not None \
                and not (np.isscalar(masks[i]) and pd.isna(masks[i])):
            m = list(masks[i])
        out, blocks = _gate_and_segment(
            texts[i] if isinstance(texts[i], str) else None,
            tools[i] if isinstance(tools[i], str) else None,
            m, config)
        outs[i] = out
        if blocks is not None:
            live_idx.append(i)
            live_blocks.append(blocks)
    # phase 2: one flat classification over the whole batch
    classify_blocks_many(live_blocks, config)
    # phase 3: reassembly per surviving row
    for i, blocks in zip(live_idx, live_blocks):
        _finish(outs[i], blocks, config)
    for i in range(n):
        r = outs[i]
        pl[i] = r["payload_len"]
        nb[i] = r["n_blocks"]
        nc[i] = r["n_content"]
        et[i] = r["extracted_text"]
        sp[i] = r["spans"]
        rr[i] = r["reject_reason"]
    out = pd.DataFrame({
        "conv_id": pdf["conv_id"].to_numpy(dtype=object),
        "turn_idx": pdf["turn_idx"].to_numpy().astype("int32"),
        "role": (pdf["role"].to_numpy(dtype=object) if "role" in pdf
                 else np.array([""] * n, dtype=object)),
        "payload_len": pl, "n_blocks": nb, "n_content": nc,
        "extracted_text": et, "spans": sp, "reject_reason": rr,
    })
    if "ts" in pdf:  # event-time passthrough for streaming consumers
        out["ts"] = pdf["ts"].to_numpy()
    return out
