"""Semantics of the C4/Dolma-style sub-document exact dedup
(operators/dedup.paragraph_dedup, driver query dedup_paragraphs):

  * the unit is a fixed word tile; the globally FIRST occurrence
    (smallest (doc_id, pos)) of a repeated tile survives, every later
    instance — cross-doc or within-doc — is cut
  * units under the char guard never dedup (C4's short-line guard)
  * reassembly preserves surviving-unit order; counts account exactly
  * vacuity guard: the registered query must actually drop units on the
    driver corpus (two engines agreeing on a no-op verifies nothing)
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from dup_ocropy_spark.operators.dedup import paragraph_dedup

# 8-word tiles, every word 4+ chars so each tile clears the 20-char guard
TILE_A = "alpha bravo charlie delta echo foxtrot golf hotel"
TILE_B = "india juliet kilo lima mike november oscar papa"
TILE_C = "quebec romeo sierra tango uniform victor whiskey xray"
SHORT = "tiny one"  # < 20 chars: never dedups


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            f"{TILE_A} {TILE_B}",          # 0: first owner of A and B
            f"{TILE_A} {TILE_C}",          # 1: A repeated -> cut; C kept
            SHORT,                          # 2: short unit, kept
            SHORT,                          # 3: short repeat, ALSO kept
            f"{TILE_C} {TILE_C}",          # 4: C already owned by doc 1;
                                            #    both instances cut
        ],
    }))
    out = paragraph_dedup(docs).toPandas().set_index("doc_id").sort_index()
    return out


def test_first_occurrence_survives_later_instances_cut(result):
    assert result.loc[0, "n_units"] == 2 and result.loc[0, "n_kept"] == 2
    assert result.loc[0, "kept_md5"] == _md5(f"{TILE_A} {TILE_B}")
    # doc 1 loses the repeated A, keeps its unique C
    assert result.loc[1, "n_units"] == 2 and result.loc[1, "n_kept"] == 1
    assert result.loc[1, "kept_md5"] == _md5(TILE_C)


def test_short_units_never_dedup(result):
    for d in (2, 3):
        assert result.loc[d, "n_kept"] == result.loc[d, "n_units"] == 1
        assert result.loc[d, "kept_md5"] == _md5(SHORT)


def test_within_doc_and_cross_doc_repeats_both_cut(result):
    # doc 4's two C tiles are instances 2 and 3 of C (doc 1 owns it)
    assert result.loc[4, "n_units"] == 2 and result.loc[4, "n_kept"] == 0
    assert result.loc[4, "kept_md5"] == _md5("")


def test_empty_text_yields_one_short_kept_unit(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [7], "text": [""]}))
    out = paragraph_dedup(docs).toPandas()
    assert out.n_units.iloc[0] == 1 and out.n_kept.iloc[0] == 1
    assert out.kept_md5.iloc[0] == _md5("")


def test_partial_tail_tile_round_trips(spark):
    # 10 words -> one full 8-word tile + a 2-word tail tile; nothing
    # repeated, so reassembly must reproduce the original text exactly
    text = ("one two three four five six seven eight "
            "tail9word tail10word")
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    out = paragraph_dedup(docs).toPandas()
    assert out.n_units.iloc[0] == 2 and out.n_kept.iloc[0] == 2
    assert out.kept_md5.iloc[0] == _md5(text)


def test_registered_query_is_not_vacuous(spark):
    """The driver corpus must exercise the cut path: some units dropped,
    and at least one doc's reassembled text differs from the original."""
    from dup_ocropy_spark.operators.registry import REGISTRY

    out = REGISTRY["dedup_paragraphs"].spark(
        spark, "/root/testdata/sf0.001").toPandas()
    assert (out.n_kept < out.n_units).any(), \
        "no units cut at sf0.001 — the dedup is a no-op on the driver corpus"
    assert out.n_units.sum() > out.n_kept.sum()


def test_md5_oracle_parity_at_sf01(spark):
    """VERDICT r5 item 6: the full md5 oracle checked on a ~5k-doc
    corpus too (the toy fixtures pin keep-first/guard/tail semantics;
    this pins multi-tile-boundary behavior at a scale where tiles
    genuinely collide across partition boundaries). sf0.1 is the
    smallest sf whose documents table exceeds the 500-row floor."""
    import duckdb

    from dup_ocropy_spark.operators.registry import REGISTRY

    sf_dir = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.sql(REGISTRY["dedup_paragraphs"].sql).df()
            .sort_values("doc_id").reset_index(drop=True))
    got = (REGISTRY["dedup_paragraphs"].spark(spark, sf_dir).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(want) and len(got) >= 4000
    for c in ("doc_id", "n_units", "n_kept", "kept_md5"):
        assert (got[c].astype(str) == want[c].astype(str)).all(), c
