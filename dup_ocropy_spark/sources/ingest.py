"""Raw-dump ingest with corrupt-row quarantine.

Production transcript dumps arrive as JSONL, not parquet, and at 100 TB
some fraction of lines is malformed (truncated writes, encoding damage,
schema drift). The ingest contract mirrors the extraction kernel's
never-raise discipline: every valid row enters the pipeline, every
invalid line is QUARANTINED with its raw bytes — counted and written
aside, never silently dropped and never failing the job.

Spark-first shape: read as text, parse with ``from_json`` on an
ordinary column. (The built-in JSON reader's ``_corrupt_record``
capture forbids querying the corrupt column without caching the whole
parse — a non-starter at 100 TB; parsing a text column has no such
restriction and needs exactly one pass.) Malformed JSON yields a null
struct; schema drift yields null required fields; both route to the
quarantine with the raw line intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dup_ocropy_spark.sources.transcripts import TRANSCRIPT_SCHEMA

# a row missing any of these cannot enter the pipeline (text/tool may
# legitimately be null — payload precedence handles that downstream)
_REQUIRED = ("conv_id", "turn_idx", "role")


def read_transcripts_jsonl(spark: SparkSession, path: str
                           ) -> tuple[DataFrame, DataFrame]:
    """-> (valid transcripts in TRANSCRIPT_SCHEMA order, quarantine frame
    of raw malformed lines). A line is quarantined when it is not valid
    JSON (null struct) or a required field failed to parse/coerce."""
    parsed = (spark.read.text(path)
              .select(F.col("value"),
                      F.from_json("value", TRANSCRIPT_SCHEMA).alias("r")))
    bad = F.col("r").isNull()
    for c in _REQUIRED:
        bad = bad | F.col(f"r.{c}").isNull()
    valid = parsed.where(~bad).select("r.*")
    quarantine = parsed.where(bad).select(F.col("value").alias("raw_line"))
    return valid, quarantine


def ingest_stats(valid: DataFrame, quarantine: DataFrame) -> DataFrame:
    """1-row accounting frame (the reject-report discipline at ingest
    grain)."""
    return (valid.agg(F.count("*").alias("n_valid"))
            .crossJoin(quarantine.agg(F.count("*").alias("n_quarantined"))))
