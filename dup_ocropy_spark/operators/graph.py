"""Topological ordering of a precedence DAG (reference O2).

Reference behavior: ``ocrolib/psegutils.py`` ``topsort`` linearizes the
block-precedence relation (visit order consistent with every edge). The
engine's 1-D payload order makes this moot inside the extraction pipeline
(reading order IS a total order, SURVEY.md O2), so this is the
general-purpose operator a user gets for precedence tables that are NOT
totally ordered — e.g. cross-references between conversations or derived
dataset dependencies.

Spark-first shape: longest-path layering by iterated join —
``level(v) = 0`` for sources, else ``1 + max(level(u)) over edges u->v``.
Each iteration is one equi-join + groupBy (both on the node key, AQE
handles skew); the loop runs depth(DAG) times, the classic frontier
pattern for iterative algorithms on DataFrames. ``(level, node)`` sorting
then yields a deterministic linear extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def topological_levels(edges: DataFrame, max_iters: int = 100) -> DataFrame:
    """edges(src, dst) -> (node, level): longest-path layer per node.

    Raises ValueError if levels fail to converge within ``max_iters``
    (a cycle, or a deeper DAG than the bound).
    """
    edges = edges.select("src", "dst").distinct().persist()
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    levels = nodes.withColumn("level", F.lit(0)).persist()
    for _ in range(max_iters):
        # relax: a node's level must exceed every predecessor's
        bumped = (edges.join(levels.withColumnRenamed("node", "src"), "src")
                  .groupBy(F.col("dst").alias("node"))
                  .agg((F.max("level") + 1).alias("level")))
        new_levels = (levels.unionByName(bumped)
                      .groupBy("node").agg(F.max("level").alias("level"))
                      # truncate lineage: iterative plans otherwise grow
                      # unboundedly and re-execute from the source each pass
                      .localCheckpoint())
        changed = (new_levels.alias("n")
                   .join(levels.alias("o"), "node")
                   .where(F.col("n.level") != F.col("o.level")).limit(1)
                   .count())
        levels.unpersist()
        levels = new_levels
        if changed == 0:
            edges.unpersist()
            return levels
    edges.unpersist()
    raise ValueError(f"topological_levels did not converge in {max_iters} "
                     f"iterations (cycle, or raise max_iters)")


def connected_components(edges: DataFrame, max_iters: int = 50) -> DataFrame:
    """edges(src, dst) -> (node, component): undirected connected
    components by iterative min-label propagation — every node converges
    to the smallest node id reachable from it, which becomes the
    component id (deterministic canonical representative).

    Same Spark-first frontier shape as ``topological_levels`` — each
    iteration is a neighbor-relax join + a POINTER-JUMP join (label of my
    label), so label distance doubles per pass and convergence is
    O(log diameter), not O(diameter): a 60-doc template-drift CHAIN
    (consecutive near-dup pairs only) converges in ~6 passes where plain
    propagation needs 60 and would abort at the iteration bound.
    Near-dup clusters are usually near-cliques (1-2 passes); the chain
    case is exactly why the jump step exists."""
    both = (edges.select("src", "dst")
            .unionByName(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
            .distinct().persist())
    labels = (both.select(F.col("src").alias("node")).distinct()
              .withColumn("component", F.col("node")).persist())
    for _ in range(max_iters):
        neighbor_min = (both.join(labels.withColumnRenamed("node", "src"), "src")
                        .groupBy(F.col("dst").alias("node"))
                        .agg(F.min("component").alias("component")))
        relaxed = (labels.unionByName(neighbor_min)
                   .groupBy("node").agg(F.min("component").alias("component")))
        # pointer jump: component ids are node ids, so resolve each
        # node's label through its label's label (always <=)
        parent = (relaxed.select(F.col("node").alias("component"),
                                 F.col("component").alias("_grand")))
        new_labels = (relaxed.join(parent, "component", "left")
                      .select("node",
                              F.coalesce("_grand", "component")
                              .alias("component"))
                      .localCheckpoint())
        changed = (new_labels.alias("n").join(labels.alias("o"), "node")
                   .where(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            both.unpersist()
            return labels
    both.unpersist()
    labels.unpersist()
    raise ValueError(f"connected_components did not converge in {max_iters} "
                     f"iterations (raise max_iters)")


def topsort(edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(node, level, rank): deterministic linear extension of the DAG —
    rank orders by (level, node), so every edge points to a higher rank
    (reference topsort contract).

    Scale-safe total rank: a bare ``row_number() OVER (ORDER BY ...)``
    would pull every node through one task. Instead the nodes are
    range-partitioned on the sort key (partition i holds strictly smaller
    keys than partition i+1), ranked locally per partition in parallel,
    and shifted by per-partition offsets from a tiny one-row-per-partition
    cumulative sum — the distributed order-preserving rank pattern. The
    result is independent of the sampled range boundaries because local
    rank + offset reproduces the global (level, node) order exactly.
    """
    from pyspark.sql import Window as W

    levels = topological_levels(edges)
    n = num_partitions or levels.sparkSession.sparkContext.defaultParallelism
    ranged = (levels.repartitionByRange(n, "level", "node")
              .withColumn("_pid", F.spark_partition_id()))
    local = ranged.withColumn(
        "_lr", F.row_number().over(W.partitionBy("_pid").orderBy("level", "node")))
    # one row per partition: the only single-partition window runs over
    # <= num_partitions rows, never over the nodes
    sizes = local.groupBy("_pid").agg(F.count("*").alias("_n"))
    offsets = sizes.select(
        "_pid",
        (F.sum("_n").over(W.orderBy("_pid")) - F.col("_n")).alias("_off"))
    return (local.join(F.broadcast(offsets), "_pid")
            .select("node", "level",
                    # bigint: an int rank would overflow past 2^31 nodes,
                    # exactly the scale this rank scheme exists for
                    (F.col("_lr") + F.col("_off")).cast("bigint").alias("rank")))
