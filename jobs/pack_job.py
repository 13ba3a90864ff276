#!/usr/bin/env python
"""spark-submit entrypoint: tokenize -> pack -> dataloader shards.

    spark-submit --py-files dup_ocropy_spark.zip jobs/pack_job.py \
        --input <docs parquet> --output <shard dir> \
        [--budget 4096] [--seqs-per-shard 1024] [--self-contained] \
        [--id-col doc_id] [--text-col text] \
        [--codec merges.json | --train-codec 512 --codec-out merges.json]

The terminal stage of the curation pipeline: documents (curate_job
output, or any (id, text) parquet) are token-counted, assigned global
(seq_id, seq_offset) by pack_sequences' distributed two-phase cumsum
(no single-partition exchange over the documents), and laid down as
``shard_id=K`` parquet dirs by write_packed_shards — whole sequences
per shard, no global sort ever materialized.

Token counting: with ``--codec`` (a save_codec merges.json) or
``--train-codec N`` (train one on THIS corpus first, persisting it to
``--codec-out``), counts come from the learned BPE codec
(bpe_token_counts); otherwise the regex approximation (letters / digit
runs / punctuation singletons — the same expression the token_counts
driver query uses).

``--self-contained`` switches write_packed_shards to budget mode:
boundary documents are duplicated into every shard they touch with
explicit (tok_start, tok_len) slices, so shard-parallel dataloaders
never coordinate (plans/shard.py; requires the global packing this job
always uses — the partition-packed hazard is refused upstream).

Prints one JSON stats line: doc count, token total, sequence and shard
counts, codec source, wall seconds.
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
    ap.add_argument("--budget", type=int, default=4096,
                    help="tokens per training sequence")
    ap.add_argument("--seqs-per-shard", type=int, default=1024)
    ap.add_argument("--self-contained", action="store_true",
                    help="duplicate boundary docs with (tok_start, "
                         "tok_len) slices so each shard replays its "
                         "exact token range with no reader coordination")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--codec", default=None, metavar="MERGES_JSON",
                    help="count tokens with this trained BPE codec "
                         "(save_codec artifact)")
    ap.add_argument("--train-codec", type=int, default=None, metavar="N",
                    help="train an N-merge BPE codec on the input corpus "
                         "first and count with it")
    ap.add_argument("--codec-out", default=None, metavar="PATH",
                    help="where --train-codec persists the artifact "
                         "(required with --train-codec)")
    ap.add_argument("--codec-batch", type=int, default=32,
                    help="merges selected per Spark round when training")
    args = ap.parse_args(argv)
    if args.codec and args.train_codec:
        ap.error("--codec and --train-codec are mutually exclusive")
    if args.train_codec and not args.codec_out:
        ap.error("--train-codec requires --codec-out")

    from pyspark.sql import functions as F

    from dup_ocropy_spark.operators.codec import (
        bpe_token_counts, load_codec, save_codec, train_bpe,
    )
    from dup_ocropy_spark.operators.packing import pack_sequences
    from dup_ocropy_spark.plans.shard import write_packed_shards
    from dup_ocropy_spark.session import get_spark

    spark = get_spark(app_name="dup_ocropy_pack")
    t0 = time.time()
    docs = spark.read.parquet(args.input)

    merges = None
    codec_src = "regex"
    if args.codec:
        merges = load_codec(args.codec)
        codec_src = args.codec
    elif args.train_codec:
        merges = train_bpe(docs, n_merges=args.train_codec,
                           text_col=args.text_col, batch=args.codec_batch)
        save_codec(args.codec_out, merges)
        codec_src = f"trained:{len(merges)}"

    if merges is not None:
        counted = bpe_token_counts(docs, merges, text_col=args.text_col)
        n_tokens_col = "n_tokens_bpe_learned"
    else:
        # the token_counts driver query's regex approximation — the
        # SHARED pattern constant, so the job's budgeting can never
        # desynchronize from the driver query's definition
        from dup_ocropy_spark.operators.textstats import TOKEN_APPROX_PATTERN

        approx = F.size(F.regexp_extract_all(
            args.text_col, F.lit(TOKEN_APPROX_PATTERN), 0))
        counted = docs.withColumn("n_tokens", approx.cast("bigint"))
        n_tokens_col = "n_tokens"

    packed = pack_sequences(counted, args.budget,
                            n_tokens_col=n_tokens_col,
                            order_cols=(args.id_col,))
    write_packed_shards(packed, args.output,
                        seqs_per_shard=args.seqs_per_shard,
                        budget=args.budget if args.self_contained else None,
                        n_tokens_col=n_tokens_col)

    # stats from the COMMITTED output, in ONE aggregation pass (the
    # lineage rule: report what was written, not the in-flight plan; a
    # second agg would rescan the whole shard dir). In self-contained
    # mode rows are doc SLICES (boundary docs appear in >1 shard), so
    # doc/token totals come from distinct ids / tok_len sums.
    out = spark.read.parquet(args.output)
    if args.self_contained:
        agg = out.agg(
            F.countDistinct(args.id_col).alias("docs"),
            F.sum("tok_len").alias("toks"),
            F.countDistinct("shard_id").alias("shards")).collect()[0]
    else:
        agg = out.agg(
            F.count("*").alias("docs"),
            F.sum(n_tokens_col).alias("toks"),
            F.countDistinct("shard_id").alias("shards")).collect()[0]
    n_tokens = int(agg["toks"] or 0)
    # seq count by arithmetic, not max(seq_id)+1: seq_id is a row's
    # START sequence, so the final doc/slice's overhang would be
    # undercounted. Packing is global here, so the stream is exactly
    # ceil(total_tokens / budget) sequences.
    print(json.dumps({
        "n_docs": agg["docs"],
        "n_tokens": n_tokens,
        "n_seqs": -(-n_tokens // args.budget),
        "n_shards": agg["shards"],
        "budget": args.budget,
        "self_contained": bool(args.self_contained),
        "codec": codec_src,
        "wall_sec": round(time.time() - t0, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
