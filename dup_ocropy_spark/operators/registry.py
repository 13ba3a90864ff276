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


def table(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
