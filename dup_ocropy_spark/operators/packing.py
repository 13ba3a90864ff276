"""Sequence packing for training pipelines (concatenate-and-chunk).

Pretraining consumes fixed-length token sequences; documents are
concatenated in a deterministic order and the stream is chunked every
``budget`` tokens (the GPT-style packing step). This operator computes,
per document, which training sequence its first token lands in
(``seq_id``) and at what offset (``seq_offset``) — the metadata a writer
needs to emit packed shards without ever materializing the concatenated
stream. (The reference has no training-data packer; this belongs to the
beyond-reference LLM-pipeline operator family, like dedup/ANN.)

Scale shape: the per-group form (e.g. pack within language) is an
ordinary partitioned window — parallel by key, no hazard. The GLOBAL
form needs a total cumulative sum, which a bare
``sum() OVER (ORDER BY ...)`` would run on a single task; instead it
reuses the distributed order-preserving pattern from ``graph.topsort``:
range-partition on the order key, local cumsum per partition, then add
per-partition offsets from a tiny one-row-per-partition cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _chunk(docs: DataFrame, budget: int,
           packing: str = "global") -> DataFrame:
    """_start (bigint token offset) -> seq_id/seq_offset via exact integer
    division (``div``, not float ``/``: doubles lose exactness past 2^53
    total tokens — a regime a 100 TB corpus actually reaches).

    ``seq_id`` carries column metadata ``{packing, budget}`` so downstream
    consumers can tell a GLOBAL token stream from group-local seq_ids —
    ``write_packed_shards(budget=...)`` reconstructs absolute token
    intervals as ``seq_id*budget + seq_offset``, which is only meaningful
    for global packing, and refuses partition-packed frames."""
    seq_id = F.expr(f"_start div {budget}").alias(
        "seq_id", metadata={"packing": packing, "budget": budget})
    return (docs
            .withColumn("seq_id", seq_id)
            .withColumn("seq_offset", F.col("_start") % budget)
            .drop("_start"))


def pack_sequences(docs: DataFrame, budget: int,
                   n_tokens_col: str = "n_tokens",
                   order_cols: tuple[str, ...] = ("doc_id",),
                   partition_col: str | None = None,
                   num_partitions: int | None = None) -> DataFrame:
    """Append ``seq_id``/``seq_offset``: the training sequence (of
    ``budget`` tokens) where each document starts, under concatenation in
    ``order_cols`` order (must end in a unique key — the repo-wide
    deterministic-window rule). ``partition_col`` packs independently per
    group (parallel windows); omit it for one global stream (distributed
    two-phase cumsum, no single-partition exchange over the documents).
    """
    nt = F.col(n_tokens_col).cast("bigint")
    if partition_col is not None:
        w = (W.partitionBy(partition_col).orderBy(*order_cols)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        return _chunk(docs.withColumn("_start", F.sum(nt).over(w) - nt),
                      budget, packing=f"per:{partition_col}")
    n = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    ranged = (docs.repartitionByRange(n, *order_cols)
              .withColumn("_pid", F.spark_partition_id()))
    lw = (W.partitionBy("_pid").orderBy(*order_cols)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    local = ranged.withColumn("_lcum", F.sum(nt).over(lw))
    # one row per partition — the only single-partition window
    sizes = local.groupBy("_pid").agg(F.sum(nt).alias("_n"))
    offsets = sizes.select(
        "_pid", (F.sum("_n").over(W.orderBy("_pid")) - F.col("_n")).alias("_off"))
    out = (local.join(F.broadcast(offsets), "_pid")
           .withColumn("_start", F.col("_lcum") + F.col("_off") - nt)
           .drop("_pid", "_lcum", "_off"))
    return _chunk(out, budget)
