#!/usr/bin/env python
"""spark-submit entrypoint: corpus deduplication sweep.

    spark-submit --py-files dup_ocropy_spark.zip jobs/dedup_job.py \
        --input <docs parquet> --output <out dir> \
        --method minhash [--id-col doc_id --text-col text]

Methods:
  exact    keep-first survivor set + per-group multiplicity (one shuffle)
  jaccard  exact n-gram Jaccard pairs >= --threshold (stop-shingle-capped
           self-join; the verification baseline)
  minhash  MinHash+LSH candidate pairs (16 bands x 2 rows; the 100TB path,
           recall vs jaccard gated in tests)
  simhash  SimHash pairs at hamming <= 6 (7-block banding, lossless)

--two-phase (jaccard/minhash/simhash): materialize the signature /
filtered-shingle table as parquet under <output>_signatures first, then
run the pair join from the re-read table. This is the production shape at
100 TB — the signature pass is one linear scan whose output is tiny
relative to the corpus, the join phase never re-reads raw text, executor
memory holds no persisted corpus-sized blocks, and the signature table is
reusable across incremental runs (only new docs need signing). The
in-memory mode persists the same intermediate instead (fine while it fits
the cluster's storage memory).

Writes the result as parquet under --output and prints one JSON line.
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


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", choices=("exact", "jaccard", "minhash", "simhash"),
                    default="minhash")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.2,
                    help="jaccard cutoff (jaccard method only)")
    ap.add_argument("--two-phase", action="store_true",
                    help="materialize the signature table as parquet and "
                         "join from it (the 100TB pattern) instead of "
                         "persisting it in executor memory")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dup_ocropy_spark.operators.dedup import (
        exact_keep_first, jaccard_filtered_shingles, jaccard_pairs,
        jaccard_pairs_from, minhash_candidates, minhash_pairs_from,
        minhash_signatures, shingles_of, simhash_pairs, simhash_pairs_from,
        simhash_signatures,
    )
    from dup_ocropy_spark.plans.cache import release_shared
    from dup_ocropy_spark.session import get_spark

    spark = get_spark(app_name="dup_ocropy_dedup")
    # ids pass through UNCAST: exact_keep_first and the pair operators
    # work on any orderable key, and the curate pipeline's conv_id is a
    # string — casting to long would throw under the ANSI default (or
    # null every id with ANSI off, silently corrupting survivor sets)
    docs = (spark.read.parquet(args.input)
            .select(F.col(args.id_col).alias("doc_id"),
                    F.col(args.text_col).alias("text")))

    t0 = time.time()
    sig_path = args.output.rstrip("/") + "_signatures"
    if args.method == "exact":
        out = exact_keep_first(docs)
    elif args.two_phase and args.method != "exact":
        # phase 1: one linear scan over the corpus -> signature table
        builders = {
            "jaccard": lambda: jaccard_filtered_shingles(docs),
            "minhash": lambda: minhash_signatures(shingles_of(docs)),
            "simhash": lambda: simhash_signatures(docs),
        }
        builders[args.method]().write.mode("overwrite").parquet(sig_path)
        # phase 2: pair joins read ONLY the materialized signatures
        sig = spark.read.parquet(sig_path)
        release_shared()  # phase-1 shingle persist is done with
        if args.method == "jaccard":
            out = jaccard_pairs_from(sig, args.threshold)
        elif args.method == "minhash":
            out = minhash_pairs_from(sig)
        else:
            out = simhash_pairs_from(sig)
    elif args.method == "jaccard":
        out = jaccard_pairs(docs, args.threshold)
    elif args.method == "minhash":
        out = minhash_candidates(docs)
    else:
        out = simhash_pairs(docs)
    out.write.mode("overwrite").parquet(args.output)
    release_shared()  # in-memory modes' shingle/signature persists
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"method": args.method, "rows": n,
                      # exact has no signature phase: report what actually ran
                      "two_phase": bool(args.two_phase and args.method != "exact"),
                      "wall_sec": round(time.time() - t0, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
