"""Deterministic sampling for data mixing and debugging.

Training-data pipelines need samples that are (a) reproducible across
runs and partitionings — a bare ``limit()`` is neither (it takes
whatever partitions answer first; the round-2 IVF quantizer trained on
one region of the space exactly this way) — and (b) portable across
engines so an oracle can check them. Both operators order by a seeded
hash of the key and cut at n:

* ``deterministic_sample``  — global n (TakeOrderedAndProject: per-
  partition heaps, no global sort materialization);
* ``stratified_sample``     — n per stratum (partitioned window), the
  per-language / per-source quota step of a mixing recipe.

The hash is ``md5(key || ':' || seed)``: a string hash both Spark and
DuckDB compute identically, so the DuckDB twin is the same ORDER BY
(xxhash64 would be faster but exists only on the Spark side). The key
itself is the final tie-break — the repo-wide deterministic-window rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _hash_order(key_col: str, seed: int):
    return F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                             F.lit(str(seed))))


def deterministic_sample(docs: DataFrame, n: int, key_col: str = "doc_id",
                         seed: int = 42) -> DataFrame:
    """n rows, stable under any partitioning / run / engine: order by the
    seeded key hash (uniform over keys), cut at n. Plans as
    TakeOrderedAndProject — per-partition top-n heaps + driver merge of n
    rows, never a full sort."""
    return docs.orderBy(_hash_order(key_col, seed), key_col).limit(n)


def stratified_sample(docs: DataFrame, n_per_stratum: int,
                      stratum_col: str, key_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """n rows PER STRATUM (quota sampling): rank within each stratum by
    the seeded key hash, keep rank <= n. One shuffle on the stratum key;
    every stratum ranks in parallel."""
    w = W.partitionBy(stratum_col).orderBy(_hash_order(key_col, seed), key_col)
    return (docs.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= n_per_stratum).drop("_rk"))


def mixture_sample(docs: DataFrame, total_n: int, weights: dict[str, float],
                   stratum_col: str, key_col: str = "doc_id",
                   seed: int = 42) -> DataFrame:
    """Data-mixing draw: ``total_n`` rows split across strata by target
    ``weights`` (e.g. ``{"en": 0.7, "de": 0.3}``) — each stratum
    contributes its largest-remainder share (quotas sum EXACTLY to
    ``total_n`` — naive ``round(total_n * w)`` per stratum under-fills:
    four 0.25 weights of 10 would banker's-round to 2+2+2+2=8), chosen
    by the same seeded hash rank as ``stratified_sample``. Strata absent
    from ``weights`` contribute nothing; a stratum smaller than its
    quota contributes all it has (the caller reads the shortfall off the
    output counts). ``weights`` must sum to ~1.0 — with a materially
    smaller sum the largest-remainder bump cannot place every missing
    row (rem can exceed the stratum count) and the draw would silently
    under-fill, so a bad mixture spec is an error, not a quiet short
    sample. One shuffle on the stratum key; the quota lookup is
    a literal CASE chain below ~64 strata, a broadcast join above (a
    10k-entry CASE expression would blow up codegen)."""
    wsum = sum(weights.values())
    if abs(wsum - 1.0) > 1e-6:
        raise ValueError(
            f"mixture_sample weights must sum to 1.0 (got {wsum:.6f}); "
            "normalize the mixture spec explicitly — a silent renorm here "
            "would hide a typo'd recipe")
    floors = {s: int(total_n * w_) for s, w_ in weights.items()}
    rem = total_n - sum(floors.values())
    by_remainder = sorted(  # stratum name as deterministic tie-break
        weights, key=lambda s: (floors[s] - total_n * weights[s], s))
    for s in by_remainder[:rem]:
        floors[s] += 1
    w = W.partitionBy(stratum_col).orderBy(_hash_order(key_col, seed), key_col)
    ranked = docs.withColumn("_rk", F.row_number().over(w))
    if len(floors) > 64:
        quotas = docs.sparkSession.createDataFrame(
            [(s, n) for s, n in floors.items()],
            f"{stratum_col} string, _quota int")
        return (ranked.join(F.broadcast(quotas), stratum_col)
                .where(F.col("_rk") <= F.col("_quota"))
                .drop("_rk", "_quota"))
    quota = None
    for s, n_s_ in floors.items():
        n_s = F.lit(n_s_)
        quota = (F.when(F.col(stratum_col) == s, n_s) if quota is None
                 else quota.when(F.col(stratum_col) == s, n_s))
    quota = quota.otherwise(F.lit(0)) if quota is not None else F.lit(0)
    return ranked.where(F.col("_rk") <= quota).drop("_rk")


def sample_sql(table: str, n: int, key_col: str = "doc_id",
               seed: int = 42) -> str:
    """DuckDB twin of deterministic_sample (identical rows, any engine)."""
    h = f"md5({key_col} || ':{seed}')"
    return f"SELECT * FROM {table} ORDER BY {h}, {key_col} LIMIT {n}"


def stratified_sample_sql(table: str, n_per_stratum: int, stratum_col: str,
                          key_col: str = "doc_id", seed: int = 42) -> str:
    """DuckDB twin of stratified_sample."""
    h = f"md5({key_col} || ':{seed}')"
    return (f"SELECT * EXCLUDE (_rk) FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY {stratum_col} "
            f"ORDER BY {h}, {key_col}) AS _rk FROM {table}) "
            f"WHERE _rk <= {n_per_stratum}")
