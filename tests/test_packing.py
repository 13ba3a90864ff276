"""Sequence packing (concatenate-and-chunk) — operators/packing.py."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dup_ocropy_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de"][i % 2], (i * 37) % 200 + 1) for i in range(500)]
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, n_tokens bigint").persist()


def _reference(pdf: pd.DataFrame, budget: int) -> dict[int, tuple[int, int]]:
    """Single-process packing: concatenate in doc_id order, chunk every
    `budget` tokens."""
    out, cum = {}, 0
    for r in pdf.sort_values("doc_id").itertuples():
        out[r.doc_id] = (cum // budget, cum % budget)
        cum += r.n_tokens
    return out


def test_global_packing_matches_reference_any_partitioning(docs):
    want = _reference(docs.toPandas(), 512)
    for n_parts in (1, 3, 16):
        got = {r.doc_id: (r.seq_id, r.seq_offset)
               for r in pack_sequences(docs.repartition(7), 512,
                                       num_partitions=n_parts).collect()}
        assert got == want, f"n_partitions={n_parts}"


def test_per_group_packing_is_independent_per_key(docs):
    got = pack_sequences(docs, 512, partition_col="lang").toPandas()
    for lang, grp in got.groupby("lang"):
        want = _reference(grp, 512)
        for r in grp.itertuples():
            assert (r.seq_id, r.seq_offset) == want[r.doc_id], (lang, r.doc_id)


def test_packing_boundary_semantics(spark):
    """A doc STARTING exactly at a budget boundary opens the next
    sequence; a straddling doc keeps the seq_id where its first token
    lands (concatenate-and-chunk splits it downstream)."""
    d = spark.createDataFrame(
        [(0, 512), (1, 100), (2, 500)], "doc_id bigint, n_tokens bigint")
    got = {r.doc_id: (r.seq_id, r.seq_offset)
           for r in pack_sequences(d, 512).collect()}
    assert got == {0: (0, 0), 1: (1, 0), 2: (1, 100)}  # doc2 straddles into seq 2


def test_global_packing_has_no_single_partition_doc_exchange(docs):
    """The scale guard: the only SinglePartition exchange may feed the
    one-row-per-partition offset cumsum, never the document stream (same
    assert as topsort's rank)."""
    plan = pack_sequences(docs, 512, num_partitions=8) \
        ._jdf.queryExecution().executedPlan().toString()
    single = [ln for ln in plan.splitlines() if "SinglePartition" in ln]
    assert len(single) <= 1, plan
    # the document stream goes through a range partitioner instead
    assert "rangepartitioning" in plan.lower(), plan


def test_write_packed_shards_whole_sequences(spark, docs, tmp_path):
    """Every training sequence must live entirely inside ONE shard
    directory (a torn sequence would be double-counted or truncated by a
    shard-per-worker dataloader), files replay (seq_id, seq_offset) in
    order, and nothing is lost or duplicated."""
    import glob
    import pandas as pd

    from dup_ocropy_spark.plans.shard import write_packed_shards

    packed = pack_sequences(docs, 512, num_partitions=4)
    out = str(tmp_path / "shards")
    write_packed_shards(packed, out, seqs_per_shard=8)
    shard_dirs = sorted(glob.glob(out + "/shard_id=*"))
    assert len(shard_dirs) >= 2
    seq_to_shard: dict[int, set[str]] = {}
    total = 0
    for d in shard_dirs:
        pdf = pd.concat([pd.read_parquet(f)
                         for f in sorted(glob.glob(d + "/*.parquet"))])
        total += len(pdf)
        for s in pdf.seq_id.unique():
            seq_to_shard.setdefault(int(s), set()).add(d)
            assert int(s) // 8 == int(d.rsplit("=", 1)[1])
        for f in sorted(glob.glob(d + "/*.parquet")):
            one = pd.read_parquet(f)
            key = list(zip(one.seq_id, one.seq_offset))
            assert key == sorted(key), f  # in-file stream order
    # a sequence never straddles shards
    assert all(len(v) == 1 for v in seq_to_shard.values())
    assert total == docs.count()


def test_packing_edge_cases_zero_tokens_and_tiny_budget(spark):
    """Zero-token docs occupy no space (same start as their successor)
    and never break offset bounds; budget=1 degenerates to one sequence
    per token with offset always 0."""
    d = spark.createDataFrame(
        [(0, 3), (1, 0), (2, 2), (3, 0), (4, 1)],
        "doc_id bigint, n_tokens bigint")
    got = {r.doc_id: (r.seq_id, r.seq_offset)
           for r in pack_sequences(d, 4).collect()}
    assert got == {0: (0, 0), 1: (0, 3), 2: (0, 3), 3: (1, 1), 4: (1, 1)}
    one = pack_sequences(d, 1).collect()
    assert all(r.seq_offset == 0 for r in one)
    assert {r.doc_id: r.seq_id for r in one} == {0: 0, 1: 3, 2: 3, 3: 5, 4: 5}
