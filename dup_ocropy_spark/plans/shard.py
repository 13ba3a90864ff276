"""Packed-shard writer: the terminal stage of the packing pipeline.

``pack_sequences`` decides which training sequence every document STARTS
in; this writer lays the documents down so a dataloader can stream them.
``shard_id = seq_id div seqs_per_shard`` buckets whole sequences, each
shard is one output partition directory whose rows replay
(seq_id, seq_offset) in order, and no global sort is ever materialized.

Boundary-document caveat (default mode): a document is bucketed by its
START sequence, so a document that overhangs its shard's last sequence
carries the head tokens of the NEXT shard's first sequences with it.
Consequences a reader must know:

* shards are self-contained only at DOCUMENT granularity — to replay
  exact fixed-length sequences, consume shards in shard_id order and
  carry the overhang of each shard's final document into the next;
* shard token size is bounded by ``seqs_per_shard x budget`` plus the
  final document's overhang (not strictly by the product).

For shard-parallel dataloaders that must never coordinate, use
``budget=...`` (self-contained mode): boundary documents are DUPLICATED
into every shard they touch with explicit ``tok_start``/``tok_len``
token-slice columns, so each shard alone reconstructs exactly its
``[shard_id*B, (shard_id+1)*B)`` token range (B = seqs_per_shard x
budget). The duplication cost is at most one document per shard edge —
the standard trade for independent shard consumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_packed_shards(packed: DataFrame, path: str,
                        seqs_per_shard: int = 1024,
                        budget: int | None = None,
                        n_tokens_col: str = "n_tokens") -> None:
    """Write a pack_sequences output as dataloader-ready parquet shards.

    ``packed`` must carry seq_id/seq_offset (other columns ride along).
    Output layout: ``<path>/shard_id=K/*.parquet``; rows within a shard's
    files are sorted by (seq_id, seq_offset) so a reader replays the
    token stream with one sequential scan.

    Default mode buckets each document by its start sequence (see module
    docstring for the ordered-reader overhang caveat). With ``budget``
    given (the same budget passed to pack_sequences), boundary documents
    are split across shard edges instead: every row carries
    ``tok_start``/``tok_len`` (the token slice of the document belonging
    to THIS shard) and each shard is fully self-contained. All pure JVM
    expressions; the explode emits >1 row only for shard-edge documents.

    Budget mode requires GLOBAL packing (pack_sequences WITHOUT
    partition_col): the absolute token interval is rebuilt as
    ``seq_id*budget + seq_offset``, which group-local seq_ids would
    corrupt. Frames from pack_sequences carry a metadata tag and
    partition-packed ones are refused with ValueError.
    """
    if budget is None:
        out = packed.withColumn("shard_id",
                                F.expr(f"seq_id div {seqs_per_shard}"))
        # zero-token docs share (seq_id, seq_offset) with their successor;
        # doc order columns break the tie so files are byte-deterministic
        # under any partitioning (the repo-wide rule)
        ties = [c for c in ("doc_id",) if c in out.columns]
        (out.repartition("shard_id")
         .sortWithinPartitions("shard_id", "seq_id", "seq_offset", *ties)
         .write.mode("overwrite")
         .partitionBy("shard_id")
         .parquet(path))
        return

    # self-contained mode reconstructs a GLOBAL token interval as
    # seq_id*budget + seq_offset — only valid when pack_sequences ran in
    # global mode. A partition_col-packed frame has group-LOCAL seq_ids;
    # slicing those would silently interleave different groups into the
    # same token ranges. pack_sequences tags seq_id with column metadata,
    # so the misuse is refused here (frames from other producers, with no
    # tag, are trusted — the docstring states the requirement).
    md = dict(packed.schema["seq_id"].metadata or {})
    if str(md.get("packing", "global")).startswith("per:"):
        raise ValueError(
            "write_packed_shards(budget=...) requires GLOBAL packing; this "
            f"frame was packed with partition_col ({md['packing']}), whose "
            "seq_ids are group-local. Re-pack without partition_col, or "
            "write each group with its own default-mode call.")
    if "budget" in md and int(md["budget"]) != int(budget):
        raise ValueError(
            f"budget mismatch: frame was packed with budget={md['budget']}, "
            f"writer called with budget={budget} — token intervals would be "
            "reconstructed on the wrong grid.")

    B = seqs_per_shard * budget
    # reconstruct the doc's global token interval [s, s+n) from the
    # packing metadata, then fan out one row per shard the interval
    # touches (exact integer arithmetic — div, never float). n is
    # null-guarded and clamped to >=1 for the END-shard computation only:
    # a zero-token doc (pack_sequences supports them) must emit exactly
    # ONE tok_len=0 row in its start shard — the raw (s + n - 1) div B
    # would underflow below _k0 and F.sequence(k0, k0-1) DESCENDS,
    # emitting a spurious row into the previous shard.
    s = F.col("seq_id") * budget + F.col("seq_offset")
    n = F.coalesce(F.col(n_tokens_col).cast("bigint"), F.lit(0))
    with_span = (packed.withColumn("_s", s)
                 .withColumn("_n", n)
                 .withColumn("_k0", F.expr(f"_s div {B}"))
                 .withColumn("_k1", F.expr(
                     f"(_s + greatest(_n, 1L) - 1) div {B}")))
    exploded = (with_span
                .withColumn("shard_id", F.explode(F.sequence("_k0", "_k1")))
                .withColumn("_lo", F.greatest(F.col("_s"),
                                              F.col("shard_id") * B))
                .withColumn("_hi", F.least(F.col("_s") + F.col("_n"),
                                           (F.col("shard_id") + 1) * B)))
    out = (exploded
           .withColumn("tok_start", (F.col("_lo") - F.col("_s")).cast("bigint"))
           .withColumn("tok_len", (F.col("_hi") - F.col("_lo")).cast("bigint"))
           # this slice's own sequence coordinates inside the shard
           # (exact integer div — doubles lose exactness past 2^53 tokens)
           .withColumn("seq_id", F.expr(f"_lo div {budget}"))
           .withColumn("seq_offset", F.col("_lo") % budget)
           .drop("_s", "_n", "_k0", "_k1", "_lo", "_hi"))
    # zero-token docs share (seq_id, seq_offset) with their successor, so
    # the in-file sort gets tok_len + doc order columns as tie-breaks
    # (deterministic files under any partitioning — the repo-wide rule)
    ties = [c for c in ("tok_len", "doc_id") if c in out.columns]
    (out.repartition("shard_id")
     .sortWithinPartitions("shard_id", "seq_id", "seq_offset", *ties)
     .write.mode("overwrite")
     .partitionBy("shard_id")
     .parquet(path))
