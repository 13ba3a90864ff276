"""Evaluation pipeline (reference ocropus-errs / ocropus-econf analog).

Per-turn character error rate against a ground-truth table, with
missing-row accounting (``ocropus-errs:38-66``), corpus CER reduce, and
confusion top-k (``ocropus-econf:47-111``). Edit distance runs JVM-side
(``F.levenshtein``); only the confusion *extraction* (DP backtrace)
crosses to an Arrow batch, and only for mismatching rows — the cheap
equality filter runs first, so at a 99%+ match rate almost nothing
reaches Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def per_turn_errors(pred: DataFrame, gt: DataFrame,
                    pred_col: str = "extracted_text",
                    gt_col: str = "expected_text") -> DataFrame:
    """Left join on (conv_id, turn_idx): every gt turn gets an error row;
    missing predictions count as full-length errors (errs:44-46)."""
    p = pred.select("conv_id", "turn_idx", F.col(pred_col).alias("pred"))
    g = gt.select("conv_id", "turn_idx", F.col(gt_col).alias("gt"))
    j = g.join(p, ["conv_id", "turn_idx"], "left")
    return j.select(
        "conv_id", "turn_idx",
        F.col("pred").isNull().alias("missing"),
        F.length("gt").alias("gt_len"),
        F.when(F.col("pred").isNull(), F.length("gt"))
        .otherwise(F.levenshtein("pred", "gt")).alias("err"),
        "pred", "gt",
    )


def error_rate(errors: DataFrame) -> DataFrame:
    """Corpus CER = sum(err)/sum(len), plus miss accounting (one row)."""
    return errors.agg(
        F.sum("err").alias("total_err"),
        F.sum("gt_len").alias("total_len"),
        F.round(F.sum("err").cast("double")
                / F.greatest(F.sum("gt_len"), F.lit(1)), 6).alias("cer"),
        F.sum(F.when(F.col("missing"), 1).otherwise(0)).alias("n_missing"),
        F.count("*").alias("n_turns"),
    )


_CONF_SCHEMA = "pred_part string, gt_part string"


def _confusion_batch(batches):
    from dup_ocropy_spark.kernels.edist import xlevenshtein

    for pdf in batches:
        rows = []
        # zip over ndarrays, not iterrows (row-object construction is ~10x)
        for pred, gt in zip(pdf["pred"].to_numpy(), pdf["gt"].to_numpy()):
            if not gt:
                continue
            _, conf = xlevenshtein(pred or "", gt)
            rows.extend({"pred_part": a, "gt_part": b} for a, b in conf)
        yield pd.DataFrame(rows, columns=["pred_part", "gt_part"])


def confusion_topk(errors: DataFrame, k: int = 20) -> DataFrame:
    """econf: context-windowed confusion pairs over mismatching turns only
    (equality pre-filter keeps the Python stage off the happy path)."""
    mism = errors.where((F.col("err") > 0) & F.col("pred").isNotNull())
    conf = mism.select("pred", "gt").mapInPandas(_confusion_batch, schema=_CONF_SCHEMA)
    return (conf.groupBy("pred_part", "gt_part").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "pred_part", "gt_part").limit(k))
