#!/usr/bin/env python
"""spark-submit entrypoint: train the block classifier, write a model
artifact (see sources/models.py).

    spark-submit --py-files dup_ocropy_spark.zip jobs/train_job.py \
        --input <transcripts> --model-out /path/model.json [--context]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--model-out", required=True)
    ap.add_argument("--context", action="store_true",
                    help="train the bidirectional-context variant (L6 analog)")
    ap.add_argument("--lstm", action="store_true",
                    help="train the TinyBiLSTM recognizer (L4/L5) by "
                         "rule-label distillation and save an 'lstm' "
                         "artifact — how artifacts/tinybilstm_v1.json "
                         "was produced (n_convs x epochs below)")
    ap.add_argument("--lstm-convs", type=int, default=60)
    ap.add_argument("--sample", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--calibrate", action="store_true",
                    help="estimate the decision threshold from the corpus "
                         "score distribution (N4 analog) and store it in "
                         "the artifact meta; config_with_model applies it")
    args = ap.parse_args(argv)

    from dup_ocropy_spark.operators.train import (
        calibrate_threshold, train_classifier,
    )
    from dup_ocropy_spark.session import get_spark
    from dup_ocropy_spark.sources.models import save_model

    spark = get_spark(app_name="dup_ocropy_train")

    if args.lstm:
        from dup_ocropy_spark.operators.train import train_lstm

        model, acc = train_lstm(n_convs=args.lstm_convs, epochs=args.epochs)
        save_model(args.model_out, model.to_flat(), 0.0, kind="lstm",
                   meta={"train_accuracy": acc, "epochs": args.epochs,
                         "n_convs": args.lstm_convs, "seed": 42})
        print(json.dumps({"model": args.model_out, "kind": "lstm",
                          "train_accuracy": round(acc, 4)}))
        return 0

    transcripts = spark.read.parquet(args.input)
    w, b, acc = train_classifier(transcripts, context=args.context,
                                 sample=args.sample, epochs=args.epochs)
    kind = "logistic_ctx" if args.context else "logistic"
    meta = {"train_accuracy": acc, "input": args.input}
    if args.calibrate:
        thr, thr_acc = calibrate_threshold(transcripts, w, b,
                                           context=args.context)
        meta["content_threshold"] = thr
        meta["threshold_accuracy"] = thr_acc
    save_model(args.model_out, w, b, kind=kind, meta=meta)
    rep = {"model": args.model_out, "kind": kind,
           "train_accuracy": round(acc, 4)}
    if args.calibrate:
        rep["content_threshold"] = meta["content_threshold"]
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
