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


def test_self_contained_shards_tile_exactly(spark, docs, tmp_path):
    """budget= mode: each shard alone reconstructs exactly its
    [k*B, (k+1)*B) token range — boundary docs are duplicated with
    complementary (tok_start, tok_len) slices, per-doc slices tile
    [0, n_tokens) with no gap/overlap, and no shard depends on its
    neighbor (the shard-parallel dataloader contract the default
    mode cannot give)."""
    import glob

    from dup_ocropy_spark.plans.shard import write_packed_shards

    budget, sps = 512, 2
    B = budget * sps
    packed = pack_sequences(docs, budget, num_partitions=4)
    out = str(tmp_path / "sc_shards")
    write_packed_shards(packed, out, seqs_per_shard=sps, budget=budget)

    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    doc_tokens = {r.doc_id: r.n_tokens for r in docs.collect()}
    per_doc: dict[int, list[tuple[int, int]]] = {}
    n_multi = 0
    shard_dirs = sorted(glob.glob(out + "/shard_id=*"),
                        key=lambda d: int(d.rsplit("=", 1)[1]))
    assert len(shard_dirs) >= 3
    for d in shard_dirs:
        k = int(d.rsplit("=", 1)[1])
        pdf = pd.concat([pd.read_parquet(f)
                         for f in sorted(glob.glob(d + "/*.parquet"))])
        pdf = pdf.sort_values(["seq_id", "seq_offset"])
        # global token interval of each slice, from its own coordinates
        starts = (pdf.seq_id * budget + pdf.seq_offset).to_numpy()
        lens = pdf.tok_len.to_numpy()
        # slices are contiguous from k*B — the shard replays its range
        # with one scan and nothing missing (no dependence on shard k-1)
        lo = k * B
        for s, ln in zip(starts, lens):
            assert s == lo, (k, s, lo)
            lo = s + ln
        assert lo == min(total_tokens, (k + 1) * B)
        for r in pdf.itertuples():
            per_doc.setdefault(int(r.doc_id), []).append(
                (int(r.tok_start), int(r.tok_len)))
    # per-doc slices tile [0, n_tokens); boundary docs appear in >1 shard
    for doc_id, slices in per_doc.items():
        if doc_tokens[doc_id] == 0:
            continue
        slices.sort()
        if len(slices) > 1:
            n_multi += 1
        pos = 0
        for s, ln in slices:
            assert s == pos, (doc_id, slices)
            pos += ln
        assert pos == doc_tokens[doc_id], (doc_id, slices)
    assert n_multi >= 1  # the fixture does produce shard-edge docs


def test_mixture_sample_rejects_bad_weight_sum(spark):
    """Weights summing materially below 1.0 would silently under-fill
    (rem can exceed the stratum count) — a bad mixture spec must raise,
    not quietly return a short sample."""
    from dup_ocropy_spark.operators.sampling import mixture_sample

    d = spark.createDataFrame(
        [(i, ["en", "de"][i % 2]) for i in range(20)],
        "doc_id bigint, lang string")
    with pytest.raises(ValueError, match="sum to 1.0"):
        mixture_sample(d, 10, {"en": 0.3, "de": 0.3}, "lang")
    with pytest.raises(ValueError, match="sum to 1.0"):
        mixture_sample(d, 10, {"en": 0.8, "de": 0.4}, "lang")


def test_self_contained_shards_zero_token_docs(spark, tmp_path):
    """Zero-token (and NULL-token) docs must emit exactly ONE tok_len=0
    row in their start shard — the naive (s + n - 1) div B end-shard
    underflows below the start shard and F.sequence() DESCENDS, emitting
    a spurious row into the PREVIOUS shard (and a null n_tokens would
    silently drop the doc from the shards entirely)."""
    import glob

    from dup_ocropy_spark.plans.shard import write_packed_shards

    budget, sps = 4, 2   # B = 8
    # doc 1: zero tokens exactly at a shard boundary (s=8); doc 3: null
    d = spark.createDataFrame(
        [(0, 8), (1, 0), (2, 5), (3, None), (4, 3)],
        "doc_id bigint, n_tokens bigint")
    packed = pack_sequences(d.fillna(0, ["n_tokens"]), budget)
    # re-attach the null to exercise the writer's own guard
    packed = packed.withColumn(
        "n_tokens", F.when(F.col("doc_id") == 3, F.lit(None).cast("bigint"))
        .otherwise(F.col("n_tokens")))
    out = str(tmp_path / "zt_shards")
    write_packed_shards(packed, out, seqs_per_shard=sps, budget=budget)

    rows = pd.concat([pd.read_parquet(f)
                      for f in sorted(glob.glob(out + "/shard_id=*/*.parquet"))],
                     keys=[int(p.split("shard_id=")[1].split("/")[0])
                           for p in sorted(glob.glob(out + "/shard_id=*/*.parquet"))])
    by_doc = {int(r.doc_id): [] for _, r in rows.iterrows()}
    for (shard, _), r in rows.iterrows():
        by_doc[int(r.doc_id)].append((shard, int(r.tok_len)))
    # every doc present exactly where it belongs
    assert by_doc[1] == [(1, 0)]       # zero-token at s=8 -> shard 1 only
    assert by_doc[3] == [(1, 0)]       # null-token doc kept, not dropped
    assert sorted(by_doc[0]) == [(0, 8)]
    assert sorted(by_doc[2]) == [(1, 5)]
    assert sorted(by_doc[4]) == [(1, 3)]
    # shard_id always equals seq_id div seqs_per_shard for every row
    for (shard, _), r in rows.iterrows():
        assert int(r.seq_id) // sps == shard, (shard, dict(r))


def test_self_contained_shards_refuse_partition_packed_frames(docs, tmp_path):
    """budget mode reconstructs GLOBAL token intervals as
    seq_id*budget + seq_offset; a partition_col-packed frame has
    group-local seq_ids, so feeding it in would silently interleave
    groups into overlapping token ranges. pack_sequences tags seq_id
    with its packing mode and the writer refuses the mismatch (and a
    wrong-budget grid)."""
    from dup_ocropy_spark.plans.shard import write_packed_shards

    grouped = pack_sequences(docs, 512, partition_col="lang")
    with pytest.raises(ValueError, match="GLOBAL packing"):
        write_packed_shards(grouped, str(tmp_path / "bad"),
                            seqs_per_shard=4, budget=512)
    packed = pack_sequences(docs, 512)
    with pytest.raises(ValueError, match="budget mismatch"):
        write_packed_shards(packed, str(tmp_path / "bad2"),
                            seqs_per_shard=4, budget=256)
