"""Deterministic sampling — operators/sampling.py. Engine-portability is
checked directly against DuckDB (the operators are the reusable form of
the repo-wide never-bare-limit() rule, so the cross-engine agreement IS
the contract)."""

from __future__ import annotations

import os

import duckdb
import pytest

from dup_ocropy_spark.operators.sampling import (
    deterministic_sample, sample_sql, stratified_sample,
    stratified_sample_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con.execute(sql).df()


def test_deterministic_sample_matches_duckdb_and_partitioning(docs):
    want = set(_duck(sample_sql("documents", 25, seed=7)).doc_id)
    for n_parts in (1, 9):
        got = {r.doc_id for r in
               deterministic_sample(docs.repartition(n_parts), 25, seed=7)
               .select("doc_id").collect()}
        assert got == want


def test_stratified_sample_quota_and_duckdb_parity(docs):
    got = stratified_sample(docs, 5, "lang", seed=11).toPandas()
    assert (got.groupby("lang").size() <= 5).all()
    want = _duck(stratified_sample_sql("documents", 5, "lang", seed=11))
    assert set(got.doc_id) == set(want.doc_id)
    # every stratum present in the input is represented
    assert set(got.lang) == set(want.lang)


def test_seed_changes_the_sample(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 25, seed=1).collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 25, seed=2).collect()}
    assert a != b


def test_deterministic_sample_plans_as_top_k(docs):
    """Global order-by-limit must plan as TakeOrderedAndProject (per-
    partition heaps), never a single-partition global sort (PLANS.md
    rule 3)."""
    plan = deterministic_sample(docs, 25) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_mixture_sample_hits_target_weights(docs):
    from dup_ocropy_spark.operators.sampling import mixture_sample

    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    a, b = sorted(langs)[:2]
    got = mixture_sample(docs, 20, {a: 0.75, b: 0.25}, "lang", seed=3).toPandas()
    counts = got.groupby("lang").size().to_dict()
    assert counts.get(a, 0) == 15
    assert counts.get(b, 0) == 5
    # strata without a weight contribute nothing
    assert set(counts) <= {a, b}
    # deterministic: same seed, different partitioning, same rows
    again = mixture_sample(docs.repartition(11), 20, {a: 0.75, b: 0.25},
                           "lang", seed=3).toPandas()
    assert set(got.doc_id) == set(again.doc_id)


def test_mixture_sample_shortfall_is_visible(spark):
    from dup_ocropy_spark.operators.sampling import mixture_sample

    d = spark.createDataFrame(
        [(i, "en" if i < 3 else "de") for i in range(20)],
        "doc_id bigint, lang string")
    got = mixture_sample(d, 10, {"en": 0.5, "de": 0.5}, "lang").toPandas()
    counts = got.groupby("lang").size().to_dict()
    assert counts["en"] == 3   # only 3 exist: shortfall, not an error
    assert counts["de"] == 5


def test_mixture_quotas_sum_exactly_via_largest_remainder(spark):
    """Four 0.25 weights of 10 must yield 10 rows, not the 8 that
    per-stratum banker's rounding (int(round(2.5))=2) produces."""
    from dup_ocropy_spark.operators.sampling import mixture_sample

    d = spark.createDataFrame(
        [(i, ["en", "de", "fr", "es"][i % 4]) for i in range(40)],
        "doc_id bigint, lang string")
    got = mixture_sample(d, 10, {l: 0.25 for l in ("en", "de", "fr", "es")},
                         "lang").toPandas()
    assert len(got) == 10
    assert sorted(got.groupby("lang").size()) == [2, 2, 3, 3]


def test_mixture_sample_many_strata_join_path(spark):
    """Above 64 strata the quota lookup switches to a broadcast join (a
    10k-entry CASE chain would blow up codegen); semantics identical."""
    from dup_ocropy_spark.operators.sampling import mixture_sample

    n_strata = 80
    d = spark.createDataFrame(
        [(i, f"s{i % n_strata:03d}") for i in range(800)],
        "doc_id bigint, lang string")
    weights = {f"s{k:03d}": 1.0 / n_strata for k in range(n_strata)}
    got = mixture_sample(d, 160, weights, "lang", seed=2).toPandas()
    assert len(got) == 160
    assert (got.groupby("lang").size() == 2).all()
