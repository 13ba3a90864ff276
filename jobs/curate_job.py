#!/usr/bin/env python
"""spark-submit entrypoint: the composed corpus-curation pipeline.

    spark-submit --py-files dup_ocropy_spark.zip jobs/curate_job.py \
        --input <transcripts parquet> --output <curated dir> \
        [--salted] [--near-dedup]

extract -> conversation reassembly -> quality gates -> exact dedup, with
near-dup candidate accounting; writes the curated corpus parquet and
prints one JSON stats line (every drop accounted for).
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
    ap.add_argument("--salted", action="store_true")
    ap.add_argument("--near-dedup", action="store_true",
                    help="drop near-duplicates via transitive "
                         "cluster closure (default: count only)")
    args = ap.parse_args(argv)

    from dup_ocropy_spark.plans.cache import release_shared
    from dup_ocropy_spark.plans.curate import curate
    from dup_ocropy_spark.session import get_spark

    spark = get_spark(app_name="dup_ocropy_curate")
    transcripts = spark.read.parquet(args.input)
    t0 = time.time()
    curated, stats = curate(transcripts, salted=args.salted,
                        near_dedup=args.near_dedup)
    curated.write.mode("overwrite").parquet(args.output)
    rep = stats.collect()[0].asDict()
    # both consumers of curate()'s persisted intermediates are now
    # materialized — release exactly the library's tracked blocks
    # (clearCache would also evict caches the user owns)
    release_shared()
    rep["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
