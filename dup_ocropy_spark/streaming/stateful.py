"""Stateful streaming: incremental per-conversation document assembly.

Batch reassembly (plans/extract.conversation_text) needs all turns of a
conversation; in streaming, turns arrive over time. This operator keeps
per-conversation state (turns seen so far) with ``applyInPandasWithState``
and emits the assembled conversation document once the event-time
watermark passes the conversation's quiet horizon — the streaming upgrade
of the reference's per-book hOCR assembly.

Event-time timeouts (not processing-time) so results are deterministic
given the input and replayable from the checkpoint. State is
per-conversation arrays of (turn_idx, text); emission sorts by turn_idx,
preserving the per-turn ordering invariant.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dup_ocropy_spark.config import DEFAULT_CONFIG, ExtractConfig
from dup_ocropy_spark.kernels.oracle import EXTRACT_SCHEMA
from dup_ocropy_spark.plans.extract import make_extract_stage

OUTPUT_SCHEMA = "conv_id string, conv_text string, n_turns int"
STATE_SCHEMA = "turn_idxs array<int>, texts array<string>"


def assemble_conversation(key: tuple, pdfs: Iterable[pd.DataFrame],
                          state: GroupState) -> Iterable[pd.DataFrame]:
    """Accumulate (turn_idx, extracted_text); on watermark timeout emit the
    document assembled in turn order."""
    (conv_id,) = key
    if state.hasTimedOut:
        idxs, texts = state.get
        order = sorted(range(len(idxs)), key=lambda i: idxs[i])
        doc = "\n".join(texts[i] for i in order if texts[i])
        n = len(idxs)
        state.remove()
        yield pd.DataFrame([{"conv_id": conv_id, "conv_text": doc, "n_turns": n}])
        return
    idxs: list[int] = []
    texts: list[str] = []
    if state.exists:
        old_idxs, old_texts = state.get
        idxs, texts = list(old_idxs), list(old_texts)
    for pdf in pdfs:
        idxs.extend(int(x) for x in pdf["turn_idx"])
        texts.extend(str(x) for x in pdf["extracted_text"])
    state.update((idxs, texts))
    # quiet horizon: fire as soon as the watermark moves past current data
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)


def conversation_stream(transcript_stream: DataFrame,
                        config: ExtractConfig = DEFAULT_CONFIG,
                        watermark: str = "10 seconds") -> DataFrame:
    """transcript stream (with ts) -> assembled conversation documents.

    Extraction runs in the same fused stage; ts is carried through for the
    event-time watermark that drives emission.
    """
    cols = [c for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
            if c in transcript_stream.columns]
    extracted = transcript_stream.select(*cols).mapInPandas(
        make_extract_stage(config), schema=EXTRACT_SCHEMA + ", ts timestamp")
    return (extracted
            .withWatermark("ts", watermark)
            .groupBy("conv_id")
            .applyInPandasWithState(
                assemble_conversation,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))
