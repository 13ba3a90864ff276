"""Scale-shaped stress: one conversation with 10^5 turns (SURVEY.md M4
skew synthesis) — salted repartition must keep every partition bounded and
output must stay correct and ordered."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dup_ocropy_spark.plans.extract import extract, ordered

N_HOT = 100_000


def _hot_conv(spark):
    def gen(it):
        for pdf in it:
            for i in pdf["id"]:
                i = int(i)
                lo = i * 1000
                yield pd.DataFrame({
                    "conv_id": "conv_hot",
                    "turn_idx": pd.array(range(lo, lo + 1000), dtype="int32"),
                    "role": "user",
                    "text": [f"Turn number {t} content with enough words to pass the gate."
                             for t in range(lo, lo + 1000)],
                    "tool": "",
                })
    return (spark.range(N_HOT // 1000).repartition(8, "id")
            .mapInPandas(gen, schema="conv_id string, turn_idx int, role string, "
                                     "text string, tool string"))


def test_single_hot_conversation_100k_turns(spark):
    df = _hot_conv(spark)
    out = extract(df, repartition=16)
    sizes = (out.withColumn("p", F.spark_partition_id())
             .groupBy("p").count().toPandas()["count"])
    # one conv_id, yet no partition holds more than ~2x the fair share
    assert sizes.max() <= 2 * N_HOT / 16
    assert int(sizes.sum()) == N_HOT
    # correctness + stable ordering survive the skew handling
    first = (ordered(out).select("turn_idx", "extracted_text").limit(3).collect())
    assert [r.turn_idx for r in first] == [0, 1, 2]
    assert first[0].extracted_text.startswith("Turn number 0 content")
