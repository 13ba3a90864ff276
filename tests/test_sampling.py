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
