"""Stateful streaming: incremental per-conversation document assembly.

Batch reassembly (plans/extract.conversation_text) needs all turns of a
conversation; in streaming, turns arrive over time. This operator keeps
per-conversation state (turns seen so far) with ``applyInPandasWithState``
and emits the assembled conversation document once the event-time
watermark passes the conversation's quiet horizon — the streaming upgrade
of the reference's per-book hOCR assembly.

Event-time timeouts (not processing-time) so results are deterministic
given the input and replayable from the checkpoint. State is
per-conversation arrays of (turn_idx, text) plus the group's max event
time; emission sorts by turn_idx, preserving the per-turn ordering
invariant.

Quiet-horizon semantics: the timeout is the conversation's OWN max event
time plus ``quiet`` (not the global watermark + 1ms — that fired on the
first micro-batch that happened to carry no turns for the conversation,
fragmenting one conversation into several partial documents across batch
boundaries). With quiet >= the watermark delay, an on-time turn can
never arrive after its conversation has fired; a conversation that
genuinely resumes after an event-time gap > quiet emits a new document —
session-window semantics, the honest behavior for unbounded streams.

Checkpoint-format note: STATE_SCHEMA is (turn_idxs, texts, max_ts_ms) —
the third field was added when quiet-horizon semantics replaced the
global-watermark timeout. applyInPandasWithState serializes state rows
with this exact schema into the checkpoint; a stream restarted from a
checkpoint written under the old 2-field schema will mis-deserialize or
fail. Restarting across that boundary requires a FRESH checkpoint dir
(and re-reading the source from the desired offset); there is no
in-place state migration.
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
STATE_SCHEMA = "turn_idxs array<int>, texts array<string>, max_ts_ms long"


def make_assembler(quiet_ms: int):
    """Assembler closure with the quiet-gap horizon (ms of event time a
    conversation must stay silent before its document is emitted)."""

    def assemble_conversation(key: tuple, pdfs: Iterable[pd.DataFrame],
                              state: GroupState) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            idxs, texts, _ = state.get
            order = sorted(range(len(idxs)), key=lambda i: idxs[i])
            doc = "\n".join(texts[i] for i in order if texts[i])
            n = len(idxs)
            state.remove()
            yield pd.DataFrame([{"conv_id": conv_id, "conv_text": doc,
                                 "n_turns": n}])
            return
        idxs: list[int] = []
        texts: list[str] = []
        max_ts_ms = 0
        if state.exists:
            old_idxs, old_texts, old_max = state.get
            idxs, texts, max_ts_ms = list(old_idxs), list(old_texts), old_max
        for pdf in pdfs:
            idxs.extend(int(x) for x in pdf["turn_idx"])
            texts.extend(str(x) for x in pdf["extracted_text"])
            if len(pdf):
                batch_max = int(pd.to_datetime(pdf["ts"]).max().value // 10**6)
                max_ts_ms = max(max_ts_ms, batch_max)
        state.update((idxs, texts, max_ts_ms))
        # quiet horizon keyed to the GROUP's latest event time: fire only
        # once the watermark clears it by the quiet gap. Timeout
        # timestamps must be > current watermark, so clamp up.
        state.setTimeoutTimestamp(
            max(max_ts_ms + quiet_ms, state.getCurrentWatermarkMs() + 1))

    return assemble_conversation


def _duration_ms(spec: str) -> int:
    """Spark-style interval string -> ms; supports every calendar-free
    unit Spark's withWatermark accepts and compound specs
    ('1 hour 30 minutes')."""
    scale = {"microsecond": 0.001, "millisecond": 1, "second": 1000,
             "minute": 60_000, "hour": 3_600_000, "day": 86_400_000,
             "week": 604_800_000}
    toks = spec.split()
    if len(toks) < 2 or len(toks) % 2:
        raise ValueError(f"bad interval spec: {spec!r}")
    total = 0.0
    for n, unit in zip(toks[::2], toks[1::2]):
        # lower() BEFORE rstrip: 'SECONDS'.rstrip('s') keeps its plural;
        # float(n): Spark's parser accepts fractional values
        total += float(n) * scale[unit.lower().rstrip("s")]
    return int(total)


def conversation_stream(transcript_stream: DataFrame,
                        config: ExtractConfig = DEFAULT_CONFIG,
                        watermark: str = "10 seconds",
                        quiet: str | None = None) -> DataFrame:
    """transcript stream (with ts) -> assembled conversation documents.

    Extraction runs in the same fused stage; ts is carried through for the
    event-time watermark that drives emission. ``quiet`` (default: the
    watermark delay) is the event-time silence after a conversation's
    last turn before its document emits.
    """
    cols = [c for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
            if c in transcript_stream.columns]
    extracted = transcript_stream.select(*cols).mapInPandas(
        make_extract_stage(config), schema=EXTRACT_SCHEMA + ", ts timestamp")
    quiet_ms = _duration_ms(quiet or watermark)
    return (extracted
            .withWatermark("ts", watermark)
            .groupBy("conv_id")
            .applyInPandasWithState(
                make_assembler(quiet_ms),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))
