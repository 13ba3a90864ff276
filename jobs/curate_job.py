#!/usr/bin/env python
"""spark-submit entrypoint: the composed corpus-curation pipeline.

    spark-submit --py-files dup_ocropy_spark.zip jobs/curate_job.py \
        --input <transcripts parquet> --output <curated dir> \
        [--salted] [--near-dedup] [--since-snapshot <fp table dir>] \
        [--decontaminate <benchmark parquet>] [--lm-keep-fraction 0.9]

extract -> conversation reassembly -> quality gates -> exact dedup, with
near-dup candidate accounting; writes the curated corpus parquet and
prints one JSON stats line (every drop accounted for).

``--since-snapshot`` is the daily-ingest mode: the batch is additionally
deduped against the fingerprint table accumulated by PRIOR runs
(``dedup.dedup_against_snapshot`` — history state is 16-byte hashes +
ids, never the corpus), only unseen conversations are written, and the
survivors' fingerprints are APPENDED to the snapshot dir so the next
run sees them. Re-running the same batch is idempotent: everything is
already fingerprinted, so the output is empty and the table does not
grow. The fingerprint append reads the just-written OUTPUT parquet, not
the in-flight plan, so the snapshot dir is never read and written in
one query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

FP_SCHEMA = "conv_id string, fp string"


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--salted", action="store_true")
    ap.add_argument("--near-dedup", action="store_true",
                    help="drop near-duplicates via transitive "
                         "cluster closure (default: count only)")
    ap.add_argument("--since-snapshot", default=None, metavar="DIR",
                    help="incremental mode: drop conversations whose "
                         "normalized fingerprint is already in this "
                         "parquet table; append new fingerprints to it")
    ap.add_argument("--decontaminate", default=None, metavar="BENCH_DIR",
                    help="drop conversations sharing word-8-grams with "
                         "the (doc_id, text) benchmark parquet at this "
                         "path (GPT-3 App. C hygiene)")
    ap.add_argument("--lm-keep-fraction", type=float, default=None,
                    metavar="F", help="fit a char-bigram LM on the batch "
                         "and keep only the best-F perplexity fraction "
                         "(CCNet recipe); e.g. 0.9 drops the worst 10%%")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dup_ocropy_spark.plans.cache import release_shared
    from dup_ocropy_spark.plans.curate import curate
    from dup_ocropy_spark.session import get_spark

    spark = get_spark(app_name="dup_ocropy_curate")
    transcripts = spark.read.parquet(args.input)
    t0 = time.time()
    curated, stats = curate(transcripts, salted=args.salted,
                            near_dedup=args.near_dedup)
    extra_stats: dict = {}

    if args.decontaminate:
        from dup_ocropy_spark.operators.decontaminate import decontaminate

        bench = spark.read.parquet(args.decontaminate)
        clean, dstats = decontaminate(
            curated.select(F.col("conv_id").alias("doc_id"), "text"), bench)
        curated = curated.join(
            clean.select(F.col("doc_id").alias("conv_id")), "conv_id")
        d = dstats.collect()[0].asDict()
        extra_stats["n_contaminated_dropped"] = d["n_contaminated"]

    if args.lm_keep_fraction is not None:
        from dup_ocropy_spark.operators.lmquality import (
            fit_char_lm, perplexity_filter,
        )

        keyed = curated.select(F.col("conv_id").alias("doc_id"), "text")
        lm = fit_char_lm(keyed)
        clean, lstats = perplexity_filter(keyed, lm,
                                          keep_fraction=args.lm_keep_fraction)
        curated = curated.join(
            clean.select(F.col("doc_id").alias("conv_id")), "conv_id")
        ls = lstats.collect()[0].asDict()
        extra_stats["n_lm_dropped"] = ls["n_dropped"]

    if args.since_snapshot:
        from pyspark.errors import AnalysisException

        from dup_ocropy_spark.operators.dedup import (
            dedup_against_snapshot, doc_fingerprints,
        )
        from dup_ocropy_spark.plans.cache import persist_shared

        # the snapshot mode consumes the curated plan THREE times (the
        # survivor write, the candidate count, the unseen-fp count) —
        # without a persist each consumer re-runs extraction /
        # decontamination / LM scoring over the whole batch just to
        # split a stats counter. release_shared() below frees it.
        curated = persist_shared(curated)
        snap = args.since_snapshot
        # probe through Spark, not os.path: the snapshot lives on
        # whatever filesystem the job runs against (HDFS/S3/local) — a
        # local-only existence check would silently treat a remote table
        # as absent and re-ingest the entire batch
        try:
            seen = spark.read.parquet(snap)
            seen.schema  # force resolution
        except AnalysisException:
            seen = spark.createDataFrame([], FP_SCHEMA)
        fresh, _ = dedup_against_snapshot(curated, seen, id_col="conv_id")
        fresh.write.mode("overwrite").parquet(args.output)
        # fingerprint the WRITTEN batch (read-back breaks the
        # read-modify-write cycle on the snapshot dir), append-only;
        # doc_fingerprints = the same normalized_fp definition the
        # anti-join used (single source of truth)
        written = spark.read.parquet(args.output)
        doc_fingerprints(written, id_col="conv_id") \
            .write.mode("append").parquet(snap)
        rep = stats.collect()[0].asDict()
        rep["n_written"] = written.count()
        # separate the two drop causes (the accounting discipline):
        # history drops = candidate rows whose fp is already in the
        # snapshot; the remainder are within-batch normalized-fp dups
        # collapsed by dedup_against_snapshot's keep-first window. The
        # candidate baseline is the post-extra-filter count, not
        # n_after_exact_dedup, when --decontaminate/--lm ran.
        n_candidates = (curated.count() if extra_stats
                        else rep["n_after_exact_dedup"])
        n_unseen = doc_fingerprints(curated, id_col="conv_id") \
            .join(seen.select("fp"), "fp", "left_anti").count()
        rep["n_snapshot_dropped"] = n_candidates - n_unseen
        rep["n_batch_normfp_dropped"] = n_unseen - rep["n_written"]
    else:
        curated.write.mode("overwrite").parquet(args.output)
        rep = stats.collect()[0].asDict()
    # both consumers of curate()'s persisted intermediates are now
    # materialized — release exactly the library's tracked blocks
    # (clearCache would also evict caches the user owns)
    release_shared()
    rep.update(extra_stats)
    rep["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
