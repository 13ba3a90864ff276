"""SparkSession builder with the engine's standard configuration.

AQE + Arrow on, UTC session timezone (DuckDB-oracle comparability),
shuffle partitions sized to cores (not the 200 default), Arrow batch
rows capped so multi-KB payload rows don't blow executor memory
(SURVEY.md section 4 'Spill/memory').
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from dup_ocropy_spark.config import DEFAULT_CONFIG


def get_spark(master: str | None = None, app_name: str = "dup_ocropy_spark",
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    # size shuffle width to parallelism: local[N] -> N, local[*]/cluster -> 32
    if shuffle_partitions is None:
        inner = master[master.find("[") + 1:master.find("]")] if "[" in master else ""
        shuffle_partitions = int(inner) if inner.isdigit() else 32
    b = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch_rows or DEFAULT_CONFIG.arrow_batch_rows))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
