"""PII redaction — operators/redact.py. Cross-engine parity is the
contract (same RE2-subset pattern strings on both sides)."""

from __future__ import annotations

import duckdb
import pytest

from dup_ocropy_spark.operators.redact import (
    n_redacted_sql, redact_pii, redact_sql,
)

CASES = [
    ("mail me at jane.doe+spam@example.co.uk thanks",
     "mail me at <EMAIL> thanks", 1),
    ("server 10.0.0.1 and 192.168.254.3 are up", "server <IP> and <IP> are up", 2),
    ("call 555-867-5309 or (555) 867-5309 or +1 555.867.5309",
     "call <PHONE> or <PHONE> or <PHONE>", 3),
    # an email whose domain contains digit.dot runs: email wins, no <IP>
    ("ping ops@10.0.0.1.example.com now", "ping <EMAIL> now", 1),
    ("no pii here at all", "no pii here at all", 0),
    ("mixed: a@b.io, 1.2.3.4, 555-867-5309.",
     "mixed: <EMAIL>, <IP>, <PHONE>.", 3),
]


@pytest.mark.parametrize("raw,want,n", CASES)
def test_redaction_goldens_spark(spark, raw, want, n):
    df = spark.createDataFrame([(raw,)], "text string")
    r = redact_pii(df).collect()[0]
    assert r.text == want
    assert r.n_redacted == n


@pytest.mark.parametrize("raw,want,n", CASES)
def test_redaction_duckdb_twin_agrees(raw, want, n):
    got = duckdb.sql(
        f"SELECT {redact_sql('t')} AS red, {n_redacted_sql('t')} AS n "
        f"FROM (SELECT ? AS t)", params=[raw]).fetchone()
    assert got[0] == want
    assert got[1] == n


def test_redacted_near_identical_docs_dedup_together(spark):
    """The curation rationale: two docs differing only in the masked
    value share a fingerprint after redaction."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("d1", "contact alice@a.com for details about the project plan"),
         ("d2", "contact bob@b.org for details about the project plan")],
        "doc_id string, text string")
    out = redact_pii(df).withColumn("fp", F.md5("text"))
    assert out.select("fp").distinct().count() == 1
