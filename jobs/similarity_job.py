#!/usr/bin/env python
"""spark-submit entrypoint: similarity search over an embedding table.

    spark-submit --py-files dup_ocropy_spark.zip jobs/similarity_job.py \
        --input <embeddings parquet> --output <out dir> \
        --method lsh --n-queries 5 --top-k 5

Methods:
  brute  exact cosine top-k (broadcast queries x corpus scan — the
         verification baseline)
  lsh    multi-table sign-projection LSH (6 tables x 6 planes; bucket-
         local joins; recall vs brute gated in tests)
  ivf    inverted-file index (k-means coarse quantizer on a bounded
         sample; queries probe nprobe nearest cells)

Query vectors are the rows with vec_id < --n-queries (the convention the
oracle-checked registry queries use); point --id-col/--vec-col at your
schema. Writes (query_id, vec_id, cos) parquet and prints one JSON line.
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
    ap.add_argument("--method", choices=("brute", "lsh", "ivf"), default="lsh")
    ap.add_argument("--n-queries", type=int, default=5)
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dup_ocropy_spark.operators.similarity import (
        cosine_topk, ivf_topk_of, lsh_topk,
    )
    from dup_ocropy_spark.session import get_spark

    spark = get_spark(app_name="dup_ocropy_similarity")
    emb = (spark.read.parquet(args.input)
           .select(F.col(args.id_col).cast("long").alias("vec_id"),
                   F.col(args.vec_col).alias("embedding")))

    t0 = time.time()
    if args.method == "brute":
        out = cosine_topk(emb, args.n_queries, args.top_k)
    elif args.method == "lsh":
        out = lsh_topk(emb, args.n_queries, args.top_k)
    else:
        out = ivf_topk_of(emb, n_queries=args.n_queries, top_k=args.top_k)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"method": args.method, "rows": n,
                      "wall_sec": round(time.time() - t0, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
