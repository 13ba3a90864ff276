"""Interval (slice-rectangle) algebra as Column expressions.

The reference's ``ocrolib/sl.py`` implements union/intersection/overlap
of 2-D slice rectangles; spans here are 1-D char intervals [start, end),
so the algebra collapses to greatest/least arithmetic — pure codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def intervals_intersect(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """True when [s1,e1) and [s2,e2) overlap (sl.intersect analog)."""
    return (s1 < e2) & (s2 < e1)


def interval_overlap(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """Overlap width, >= 0 (sl.xoverlap/yoverlap analog)."""
    return F.greatest(F.lit(0), F.least(e1, e2) - F.greatest(s1, s2))


def interval_union_len(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """Length of the bounding union interval (sl.union analog)."""
    return F.greatest(e1, e2) - F.least(s1, s2)
