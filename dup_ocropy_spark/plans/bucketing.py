"""Bucketed-table co-location: shuffle-free joins on conv_id.

At 100 TB the recurring join pattern is extraction output vs ground
truth / prior snapshots on (conv_id, ...). Writing both sides bucketed
by conv_id (Iceberg ``bucket(N, conv_id)`` in prod; Hive-bucketed tables
here) lets Spark plan a SortMergeJoin with ZERO Exchange on either side —
the bucket layout *is* the shuffle, paid once at write time and amortized
over every later join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, n_buckets: int = 16,
                   bucket_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
                   sort_cols: tuple[str, ...] = ("conv_id", "turn_idx")) -> None:
    """Bucket columns must equal the later join keys — Spark only elides
    the exchange when the scan's hash partitioning satisfies the join's
    requirement exactly."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, *bucket_cols)
     .sortBy(*sort_cols)
     .format("parquet")
     .saveAsTable(table_name))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str]) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans no Exchange (verify via .explain — test asserts it)."""
    return spark.table(left_table).join(spark.table(right_table), on)
