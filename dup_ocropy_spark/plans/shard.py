"""Packed-shard writer: the terminal stage of the packing pipeline.

``pack_sequences`` decides which training sequence every document starts
in; this writer lays the documents down so a dataloader can stream them:
``shard_id = seq_id div seqs_per_shard`` buckets WHOLE sequences (a
sequence can never straddle two shards — a range/row-count file split
could tear one mid-sequence, which a dataloader that assigns shards to
workers would then double-count or truncate), each shard is one output
partition directory whose rows replay (seq_id, seq_offset) in order, and
shard size is bounded by ``seqs_per_shard × budget`` tokens. No global
sort is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_packed_shards(packed: DataFrame, path: str,
                        seqs_per_shard: int = 1024) -> None:
    """Write a pack_sequences output as dataloader-ready parquet shards.

    ``packed`` must carry seq_id/seq_offset (other columns ride along).
    Output layout: ``<path>/shard_id=K/*.parquet``; every training
    sequence lives entirely inside one shard directory, and rows within
    the shard's files are sorted by (seq_id, seq_offset) so a reader
    replays the concatenated token stream with one sequential scan."""
    (packed.withColumn("shard_id", F.expr(f"seq_id div {seqs_per_shard}"))
     .repartition("shard_id")
     .sortWithinPartitions("shard_id", "seq_id", "seq_offset")
     .write.mode("overwrite")
     .partitionBy("shard_id")
     .parquet(path))
