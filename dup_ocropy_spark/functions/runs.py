"""Run labeling (connected components, 1-D) as window expressions.

``morph.label`` (ocrolib/morph.py:14-27) labels connected pixel runs;
over an ordered stream the same structure is "new run when the value
changes", i.e. a boundary-flag cumulative sum — all JVM window exec.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, functions as F


def run_label_col(value: Column | str, partition_by: list[str],
                  order_by: list[str]) -> Column:
    """Run id (1-based) of consecutive equal `value` rows within each
    partition under the given total order."""
    v = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    boundary = F.when(F.lag(v).over(w).isNull() | (F.lag(v).over(w) != v), 1).otherwise(0)
    return F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0))
