"""Stateful streaming conversation assembly + bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from dup_ocropy_spark.plans.bucketing import bucketed_join, write_bucketed
from dup_ocropy_spark.plans.extract import conversation_text, extract
from dup_ocropy_spark.sources.transcripts import synth_expected, synth_transcripts, write_transcripts
from dup_ocropy_spark.streaming.extract_stream import transcript_stream
from dup_ocropy_spark.streaming.stateful import conversation_stream


def test_stateful_conversation_assembly(spark, tmp_path):
    import datetime as dt

    path = str(tmp_path / "in")
    write_transcripts(spark, path, 12)
    q = (conversation_stream(transcript_stream(spark, path))
         .writeStream.format("memory").queryName("conv_docs")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        # event-time timeouts fire once the watermark passes; push it far
        # forward with one late row (whose own conv stays in state)
        late = spark.createDataFrame(
            [("zzz_late", 0, "user", "late trigger row with enough words here",
              "", dt.datetime(2027, 1, 1))],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
        late.write.mode("append").parquet(path)
        q.processAllAvailable()
    finally:
        q.stop()
    got = (spark.sql("SELECT conv_id, conv_text FROM conv_docs")
           .orderBy("conv_id").toPandas())
    want = (conversation_text(extract(spark.read.parquet(path)))
            .orderBy("conv_id").toPandas())
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["conv_text"].tolist() == want["conv_text"].tolist()


def test_bucketed_join_plans_no_exchange(spark, tmp_path):
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_test")
    for t in ("pred", "gt"):
        spark.sql(f"DROP TABLE IF EXISTS bucketed_test.{t}")
    shutil.rmtree("spark-warehouse/bucketed_test.db", ignore_errors=True)
    tr = synth_transcripts(spark, 20)
    out = extract(tr).select("conv_id", "turn_idx", "extracted_text")
    gt = synth_expected(spark, 20)
    write_bucketed(out, "bucketed_test.pred", n_buckets=8)
    write_bucketed(gt, "bucketed_test.gt", n_buckets=8)
    # force the sort-merge path (tiny test tables would broadcast, hiding
    # the property under test: bucket layout replaces the shuffle)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "bucketed_test.pred", "bucketed_test.gt",
                          ["conv_id", "turn_idx"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        n_bad = j.where(F.col("extracted_text") != F.col("expected_text")).count()
        assert n_bad == 0
        assert j.count() == gt.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
