"""O2 topsort operator: longest-path layering + linear extension.

Reference contract (ocrolib/psegutils.py topsort): the returned order is
consistent with every precedence edge. Gates: exact levels on a known
DAG, the every-edge-ascends invariant on a random DAG, cycle detection."""

from __future__ import annotations

import numpy as np
import pytest

from dup_ocropy_spark.operators.graph import topological_levels, topsort


def _edges(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs], "src long, dst long")


def test_levels_on_known_dag(spark):
    #     0 -> 1 -> 3
    #     0 -> 2 -> 3 -> 4     5 (isolated via self-pair? no: 5 -> 4)
    e = _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 4)])
    got = {r.node: r.level for r in topological_levels(e).collect()}
    assert got == {0: 0, 5: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topsort_is_a_linear_extension(spark):
    rng = np.random.default_rng(9)
    # random DAG on 40 nodes: edges only point upward in node id
    pairs = {(int(a), int(b)) for a, b in
             rng.integers(0, 40, size=(150, 2)) if a < b}
    e = _edges(spark, sorted(pairs))
    order = {r.node: r.rank for r in topsort(e).collect()}
    assert sorted(order.values()) == list(range(1, len(order) + 1))
    for a, b in pairs:
        assert order[a] < order[b], (a, b)


def test_cycle_raises(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    with pytest.raises(ValueError, match="converge"):
        topological_levels(e, max_iters=10)
