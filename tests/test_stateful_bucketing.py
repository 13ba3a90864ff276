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
    # the trigger conv itself is still inside its OWN quiet horizon when
    # the stream stops (no event time ever passes 2027+quiet), so it
    # correctly remains in state — compare against the original corpus
    want = (conversation_text(extract(
                spark.read.parquet(path)
                .where(F.col("conv_id") != "zzz_late")))
            .orderBy("conv_id").toPandas())
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["conv_text"].tolist() == want["conv_text"].tolist()


def test_stateful_assembly_not_fragmented_by_batch_gaps(spark, tmp_path):
    """A conversation whose turns span micro-batches — with an intermediate
    batch carrying only OTHER conversations — must still emit ONE document
    with all its turns. The old watermark+1 horizon fired on the first
    batch that lacked the conversation, splitting it into partial docs."""
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                        "text", "tool", "ts"]),
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp")

    path = str(tmp_path / "gap_in")
    txt = "some extracted content words line number %d right here okay"
    # batch 1: convA turns 0-1
    batch([("convA", i, "user", txt % i, "",
            base + dt.timedelta(seconds=i)) for i in range(2)]) \
        .coalesce(1).write.mode("overwrite").parquet(path + "/f1")
    # batch 2: only convB, a few seconds later (advances the watermark a
    # little — under the old horizon this fired convA prematurely)
    batch([("convB", 0, "user", txt % 90, "",
            base + dt.timedelta(seconds=12))]) \
        .coalesce(1).write.mode("append").parquet(path + "/f2")
    # batch 3: convA turn 2, ON TIME (within its quiet horizon)
    batch([("convA", 2, "user", txt % 2, "",
            base + dt.timedelta(seconds=14))]) \
        .coalesce(1).write.mode("append").parquet(path + "/f3")
    # batch 4: far-future trigger pushes every quiet horizon past
    batch([("zzz", 0, "user", txt % 99, "", base + dt.timedelta(days=400))]) \
        .coalesce(1).write.mode("append").parquet(path + "/f4")

    stream = (spark.readStream.schema(
                  "conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(path + "/*"))
    q = (conversation_stream(stream)
         .writeStream.format("memory").queryName("gap_docs")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "gap_ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM gap_docs").toPandas()
    a = got[got.conv_id == "convA"]
    assert len(a) == 1, got          # ONE document, not fragments
    assert a.iloc[0].n_turns == 3
    assert a.iloc[0].conv_text.count("\n") == 2  # all three turns, in order


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
