#!/usr/bin/env python
"""spark-submit entrypoint: JSONL dump ingest with quarantine.

    spark-submit --py-files dup_ocropy_spark.zip jobs/ingest_job.py \
        --input <jsonl path/glob> --output <parquet dir> \
        [--quarantine <dir>]

Parses raw transcript dumps into the pipeline's transcript schema;
malformed lines are written to the quarantine directory with their raw
bytes and counted in the JSON stats line — never silently dropped.
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
    ap.add_argument("--quarantine", default=None,
                    help="directory for raw malformed lines "
                         "(default: <output>_quarantine)")
    args = ap.parse_args(argv)

    from dup_ocropy_spark.session import get_spark
    from dup_ocropy_spark.sources.ingest import (
        ingest_stats, read_transcripts_jsonl,
    )

    spark = get_spark(app_name="dup_ocropy_ingest")
    t0 = time.time()
    valid, quarantine = read_transcripts_jsonl(spark, args.input)
    valid.write.mode("overwrite").parquet(args.output)
    qdir = args.quarantine or args.output.rstrip("/") + "_quarantine"
    quarantine.write.mode("overwrite").parquet(qdir)
    rep = ingest_stats(spark.read.parquet(args.output),
                       spark.read.parquet(qdir)).collect()[0].asDict()
    rep["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
