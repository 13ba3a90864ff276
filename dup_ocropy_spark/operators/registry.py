"""Query registry: one (name, spark builder, DuckDB oracle SQL) triple per
operator exposed through ``__spark_entry__.py``.

Contract (driver): the Spark callable takes (spark, sf_dir) and returns a
DataFrame; the SQL runs in DuckDB against pre-registered views named
``region nation customer supplier part orders lineitem events documents
embeddings``. Column names must match exactly (the driver sorts columns
by name and value-hashes), so every computed column is aliased on both
sides. ``sql=None`` marks genuinely non-SQL-expressible ops (driver falls
back to a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable  # (SparkSession, sf_dir) -> DataFrame
    sql: str | None  # DuckDB oracle, or None for rows-only ops
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn: Callable) -> Callable:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, sql=sql, doc=doc)
        return fn

    return deco


def spread_small_input(df):
    """Give a compute-heavy stage enough input splits to use every core.

    Parquet files split at ROW-GROUP granularity: a single-row-group file
    (the driver tables here: documents.parquet at sf1.0 is 5.9 MB, one
    row group, 50k rows) scans as 1-2 tasks no matter how small
    ``maxPartitionBytes`` goes — so every downstream regex/n-gram/Python
    kernel in the same stage ran on 1-2 of 32 cores (r6 measurement: the
    BPE word-count split alone was 3.4 s single-task). One round-robin
    exchange of the tiny table (a few MB) buys full-width compute.

    Scale-adaptive by construction: when the scan already carries at
    least ``defaultParallelism`` splits (any real multi-row-group table,
    every 100 TB table), this is the identity — no exchange is added, so
    production plans keep scan-fused pipelines and pushdown. Mirrors the
    pre-existing guard in ``dedup.simhash_pairs`` and the SCALE.md §7a
    rule (size inputs so tasks >> cores)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


# corpora whose per-row compute (text kernels, n-gram hashing, Arrow
# batches) dwarfs their byte size — the relational tables keep their
# native splits (their queries shuffle immediately anyway, and float
# aggregation there must not see a partitioning change)
_SPREAD_TABLES = frozenset({"documents", "embeddings"})


def table(spark, sf_dir: str, name: str):
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _SPREAD_TABLES:
        df = spread_small_input(df)
    return df
