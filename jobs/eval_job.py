#!/usr/bin/env python
"""spark-submit entrypoint: evaluate extraction output against a
ground-truth table (the errs/econf job).

    spark-submit --py-files dup_ocropy_spark.zip jobs/eval_job.py \
        --pred <extracted parquet> --gt <expected parquet> [--topk 20]

Prints one JSON line: corpus CER, missing accounting, confusion top-k.
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
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--pred-col", default="extracted_text")
    ap.add_argument("--gt-col", default="expected_text")
    ap.add_argument("--topk", type=int, default=20)
    args = ap.parse_args(argv)

    from dup_ocropy_spark.plans.evaluate import confusion_topk, error_rate, per_turn_errors
    from dup_ocropy_spark.session import get_spark

    spark = get_spark(app_name="dup_ocropy_eval")
    pred = spark.read.parquet(args.pred)
    gt = spark.read.parquet(args.gt)
    errs = per_turn_errors(pred, gt, args.pred_col, args.gt_col)
    rate = error_rate(errs).collect()[0].asDict()
    conf = [r.asDict() for r in confusion_topk(errs, args.topk).collect()]
    print(json.dumps({"cer": rate["cer"], "total_err": rate["total_err"],
                      "total_len": rate["total_len"],
                      "n_missing": rate["n_missing"], "n_turns": rate["n_turns"],
                      "confusions": conf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
