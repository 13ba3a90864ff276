"""JVM Column-expression helpers vs their Python kernel twins."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dup_ocropy_spark.functions import (
    interval_overlap, intervals_intersect, normalize_text_col,
    project_text_col, run_label_col,
)
from dup_ocropy_spark.kernels.textnorm import normalize_text, project_text

CASES = [
    "“fancy” ‘q’ and … done",
    "eﬄuent ﬁne ﬂow",
    "5µm a–b—c",
    "  spaces \t collapse  ",
    "plain ascii text only",
    'double "quoted" and `tick`',
    "under_score ~tilde #hash",
]


def test_normalize_col_matches_kernel(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": CASES}))
    got = [r[0] for r in df.select(normalize_text_col("t")).collect()]
    want = [normalize_text(c) for c in CASES]
    assert got == want


def test_project_col_matches_kernel(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": CASES}))
    for kind in ("exact", "nospace", "letdig", "letters", "digits", "lnc"):
        got = [r[0] for r in df.select(project_text_col("t", kind)).collect()]
        want = [project_text(c, kind) for c in CASES]
        assert got == want, kind


def test_interval_algebra(spark):
    pdf = pd.DataFrame({"s1": [0, 0, 5], "e1": [10, 3, 9],
                        "s2": [5, 7, 0], "e2": [15, 9, 20]})
    df = spark.createDataFrame(pdf)
    rows = df.select(
        intervals_intersect(F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2")).alias("x"),
        interval_overlap(F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2")).alias("o"),
    ).collect()
    assert [(r.x, r.o) for r in rows] == [(True, 5), (False, 0), (True, 4)]


def test_run_label(spark):
    pdf = pd.DataFrame({
        "g": ["a"] * 6,
        "i": range(6),
        "v": ["x", "x", "y", "y", "y", "x"],
    })
    df = spark.createDataFrame(pdf)
    out = (df.withColumn("run", run_label_col("v", ["g"], ["i"]))
           .orderBy("i").collect())
    assert [r.run for r in out] == [1, 1, 2, 2, 2, 3]
