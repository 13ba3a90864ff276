#!/usr/bin/env python
"""spark-submit entrypoint: benchmark decontamination.

    spark-submit --py-files dup_ocropy_spark.zip jobs/decontaminate_job.py \
        --input <corpus parquet: doc_id, text> \
        --benchmark <eval-set parquet: doc_id, text> \
        --output <clean corpus dir> [--min-ngrams 2] [--ngram-words 8]

Drops training documents sharing contiguous word n-grams with the eval
set (GPT-3 App. C hygiene); writes the clean corpus parquet and prints
one JSON stats line (every drop accounted for).
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
    ap.add_argument("--benchmark", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-ngrams", type=int, default=2)
    ap.add_argument("--ngram-words", type=int, default=8)
    args = ap.parse_args(argv)

    from dup_ocropy_spark.plans.cache import release_shared
    from dup_ocropy_spark.operators.decontaminate import decontaminate
    from dup_ocropy_spark.session import get_spark

    spark = get_spark(app_name="dup_ocropy_decontaminate")
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark)
    t0 = time.time()
    clean, stats = decontaminate(docs, bench, args.min_ngrams, args.ngram_words)
    clean.write.mode("overwrite").parquet(args.output)
    rep = stats.collect()[0].asDict()
    # both consumers of the persisted verdict are materialized — release
    release_shared()
    rep["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
