"""Packed-shard writer: the terminal stage of the packing pipeline.

``pack_sequences`` decides which training sequence every document starts
in; this writer lays the documents down so a dataloader can stream them:
files are range-partitioned by ``seq_id`` (each training sequence's docs
are contiguous in exactly one file), rows inside a file are sorted by
(seq_id, seq_offset), and ``maxRecordsPerFile`` bounds shard size so a
100 TB corpus yields uniform shards instead of one file per Spark
partition. No global sort: repartitionByRange samples boundaries, then
each writer task sorts locally — the same order-preserving two-phase
shape as the rank/pack operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_packed_shards(packed: DataFrame, path: str,
                        rows_per_shard: int = 100_000,
                        num_shards: int | None = None) -> None:
    """Write a pack_sequences output as dataloader-ready parquet shards.

    ``packed`` must carry seq_id/seq_offset (any other columns ride
    along). Shards are non-overlapping seq_id ranges; within a shard the
    stream order is (seq_id, seq_offset) so a reader replays the
    concatenated token stream with one sequential scan."""
    n = num_shards or packed.sparkSession.sparkContext.defaultParallelism
    (packed.repartitionByRange(n, "seq_id", "seq_offset")
     .sortWithinPartitions("seq_id", "seq_offset")
     .write.mode("overwrite")
     .option("maxRecordsPerFile", rows_per_shard)
     .parquet(path))
