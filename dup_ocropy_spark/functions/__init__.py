"""Spark Column-expression helpers (JVM-side, codegen-friendly)."""

from dup_ocropy_spark.functions.text import normalize_text_col, project_text_col
from dup_ocropy_spark.functions.intervals import (
    interval_overlap, intervals_intersect, interval_union_len,
)
from dup_ocropy_spark.functions.runs import run_label_col

__all__ = [
    "normalize_text_col", "project_text_col",
    "interval_overlap", "intervals_intersect", "interval_union_len",
    "run_label_col",
]
