"""JSONL ingest with corrupt-row quarantine — sources/ingest.py."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dup_ocropy_spark.sources.ingest import ingest_stats, read_transcripts_jsonl


def _write(tmp_path, lines) -> str:
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _row(conv_id="c1", turn_idx=0, **kw) -> str:
    d = {"conv_id": conv_id, "turn_idx": turn_idx, "role": "user",
         "text": "a perfectly reasonable transcript turn body here",
         "tool": None, "ts": "2026-01-01T00:00:00Z"}
    d.update(kw)
    return json.dumps(d)


def test_valid_rows_parse_to_transcript_schema(spark, tmp_path):
    path = _write(tmp_path, [_row(turn_idx=i) for i in range(3)])
    valid, quarantine = read_transcripts_jsonl(spark, path)
    assert valid.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert valid.count() == 3 and quarantine.count() == 0


def test_malformed_lines_are_quarantined_with_raw_bytes(spark, tmp_path):
    path = _write(tmp_path, [
        _row(),
        "{truncated json line without a clos",       # invalid JSON
        _row(turn_idx="NOT_AN_INT"),                 # coercion failure
        json.dumps({"role": "user", "text": "no ids at all"}),  # missing keys
        _row(conv_id="c2", turn_idx=1, text=None, tool="plain tool payload"),
    ])
    valid, quarantine = read_transcripts_jsonl(spark, path)
    assert valid.count() == 2                        # first + null-text row
    q = [r.raw_line for r in quarantine.collect()]
    assert len(q) == 3
    assert any("truncated json" in line for line in q)
    assert any("NOT_AN_INT" in line for line in q)   # raw bytes preserved
    s = ingest_stats(valid, quarantine).collect()[0]
    assert (s.n_valid, s.n_quarantined) == (2, 3)


def test_ingested_rows_flow_into_extraction(spark, tmp_path):
    """The ingest output is pipeline-ready: extract() runs on it
    unchanged, including a null-text tool-payload row."""
    from dup_ocropy_spark.plans.extract import extract

    path = _write(tmp_path, [
        _row(text="<p>Real body text for the extractor to keep.</p>"),
        _row(conv_id="c2", text=None,
             tool="plain tool payload long enough to pass the gates"),
    ])
    valid, _ = read_transcripts_jsonl(spark, path)
    out = extract(valid)
    rows = {r.conv_id: r for r in out.collect()}
    assert "Real body text" in rows["c1"].extracted_text
    assert rows["c2"].extracted_text.startswith("plain tool payload")
