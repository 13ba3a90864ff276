"""Second batch of relational recasts (SURVEY.md §2 rows not covered in
relational.py): 1-D morphology, label spreading, box-map band filters,
separator top-k, passthrough branching, escaping, requoting, and the
xlevenshtein confusion extraction (Arrow-batch, rows-only)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dup_ocropy_spark.operators.registry import register, table


@register(
    "g5_rolling_extrema",
    sql="""
    SELECT event_id,
           round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS dilated,
           round(min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS eroded
    FROM events
    """,
    doc="1-D morphology: rectangular dilation/erosion = rolling max/min "
        "over the ordered stream (ocrolib/morph.py:50-120)",
)
def g5_rolling_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return e.select("event_id",
                    F.round(F.max("value").over(w), 6).alias("dilated"),
                    F.round(F.min("value").over(w), 6).alias("eroded"))


@register(
    "g12_spread_labels",
    sql="""
    SELECT event_id, user_id,
           CASE WHEN seed_label IS NOT NULL THEN seed_label
                WHEN rn - last_seed_rn <= 3 THEN prev_label
                ELSE 0 END AS spread_label
    FROM (
      SELECT event_id, user_id, seed_label, rn,
             last_value(seed_label IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS prev_label,
             max(CASE WHEN seed_label IS NOT NULL THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS last_seed_rn
      FROM (
        SELECT event_id, user_id,
               CASE WHEN event_type = 'click' THEN event_id % 7 END AS seed_label,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
      )
    )
    """,
    doc="spread_labels: nearest-seed fill capped at maxdist, via "
        "last_value(ignore nulls) + row-distance compare (morph.py:126-133)",
)
def g12_spread_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w0 = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "event_id", "user_id",
        F.when(F.col("event_type") == "click", F.col("event_id") % 7).alias("seed_label"),
        F.row_number().over(w0).alias("rn"))
    w = W.partitionBy("user_id").orderBy("rn").rowsBetween(W.unboundedPreceding, 0)
    filled = base.select(
        "event_id", "user_id", "seed_label", "rn",
        F.last("seed_label", ignorenulls=True).over(w).alias("prev_label"),
        F.max(F.when(F.col("seed_label").isNotNull(), F.col("rn"))).over(w)
        .alias("last_seed_rn"))
    spread = (F.when(F.col("seed_label").isNotNull(), F.col("seed_label"))
              .when(F.col("rn") - F.col("last_seed_rn") <= 3, F.col("prev_label"))
              .otherwise(F.lit(0)))
    return filled.select("event_id", "user_id", spread.alias("spread_label"))


# G2 compute_boxmap is registered inside g1_estimate_scale
# (relational.py) — the reference chains them (estimate_scale's output is
# compute_boxmap's threshold), and folding freed the driver slot that
# ann_ivf_topk (similarity.py) now occupies.


@register(
    "g6_top_separator_runs",
    sql="""
    SELECT t.user_id, t.run_id, t.n_events, t.event_type, h.type_total
    FROM (
      SELECT user_id, run_id, n_events, event_type FROM (
        SELECT user_id, run_id, n_events, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n_events DESC, run_id) AS rk
        FROM (
          SELECT user_id, run_id, count(*) AS n_events,
                 min(event_type) AS event_type
          FROM (
            SELECT user_id, event_type,
                   CAST(sum(boundary) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS run_id
            FROM (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN event_type IS DISTINCT FROM
                               lag(event_type) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)
                          THEN 1 ELSE 0 END AS boundary
              FROM events
            )
          ) GROUP BY user_id, run_id
        )
      ) WHERE rk <= 3
    ) t
    JOIN (SELECT event_type, count(*) AS type_total
          FROM events GROUP BY event_type) h
      ON t.event_type = h.event_type
    """,
    doc="compute_separators top-k: keep the maxseps longest candidate "
        "separators per page (ocropus-gpageseg:177-186 + select_regions). "
        "O6 chist (ocrolib/common.py:471-478) is FOLDED in: each top run "
        "carries its event_type and the corpus-wide histogram count of "
        "that type (type_total), joined broadcast — the oracle checks "
        "the histogram aggregate per row",
)
def g6_top_separator_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dup_ocropy_spark.operators.relational import _run_label_df

    labeled = _run_label_df(spark, sf_dir)
    runs = (labeled.groupBy("user_id", "run_id")
            .agg(F.count("*").alias("n_events"),
                 # constant within a run by construction; min() for a
                 # deterministic aggregate the optimizer can push
                 F.min("event_type").alias("event_type")))
    rk = F.row_number().over(W.partitionBy("user_id")
                             .orderBy(F.desc("n_events"), "run_id"))
    top = (runs.select("user_id", "run_id", "n_events", "event_type",
                       rk.alias("rk"))
           .where(F.col("rk") <= 3).drop("rk"))
    # histogram straight off the scan (labeled would drag the run-label
    # window into a plain groupBy)
    chist = (table(spark, sf_dir, "events").groupBy("event_type")
             .agg(F.count("*").alias("type_total")))
    # event_type cardinality is tiny at any corpus scale: broadcast
    return top.join(F.broadcast(chist), "event_type") \
              .select("user_id", "run_id", "n_events", "event_type", "type_total")


# Probe appended to every doc before normalization so the driver twin
# exercises EVERY homograph pair of the kernel table (ligatures, dashes,
# curly quotes, primes, ellipsis, micro sign, control chars) plus exotic
# whitespace for the collapse — the corpus alone only contains a few.
_T1_PROBE = ' \tﬂy–x—“q”‘s’„a‟b‚c‛d µ…′″‴〃´`"_#~ ﬁtﬀsﬃxﬄy\nend'


def _t1_norm_sql() -> str:
    """DuckDB replace-chain over the probe-augmented text, generated from
    the SAME literal table the Spark chain uses (functions/text.py,
    whose parity with kernels/textnorm.REPLACEMENTS is pinned by
    tests/test_functions.py) — single source of truth, no drift."""
    from dup_ocropy_spark.functions.text import normalize_sql, sql_quote

    return normalize_sql(f"text || {sql_quote(_T1_PROBE)}")


@register(
    "t1_textnorm_family",
    sql=f"""
    SELECT doc_id,
           {_t1_norm_sql()} AS norm,
           md5(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS proj,
           replace(text, '''''', '"') AS requoted,
           md5(replace(replace(text, '&', '&amp;'), '<', '&lt;')) AS escaped_md5
    FROM documents
    """,
    doc="text-scalar family, all JVM regexp/replace chains, no Python: "
        "T1 normalize_text over the FULL homograph table of "
        "ocrolib/chars.py:37-59 (every pair exercised via an appended "
        "probe string; ocrolib/common.py:46-58 -> norm), "
        "T2 project_text(letdig) (common.py:60-81 -> proj, md5 keeps the "
        "compare payload small), T3 requote (chars.py:61-64 -> requoted), "
        "H5 hOCR entity escaping (ocropus-hocr:125-126 -> escaped_md5)",
)
def t1_textnorm_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dup_ocropy_spark.functions.text import normalize_text_col

    d = table(spark, sf_dir, "documents")
    norm = normalize_text_col(F.concat(F.col("text"), F.lit(_T1_PROBE)))
    proj = F.md5(F.regexp_replace("text", "[^A-Za-z0-9]", ""))
    requoted = F.replace(F.col("text"), F.lit("''"), F.lit('"'))
    esc = F.md5(F.replace(F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                          F.lit("<"), F.lit("&lt;")))
    return d.select("doc_id", norm.alias("norm"), proj.alias("proj"),
                    requoted.alias("requoted"), esc.alias("escaped_md5"))


# ---------------------------------------------------------------------------
# xlevenshtein with confusion extraction: genuinely non-SQL (DP backtrace);
# Arrow-batch kernel + JVM explode/agg on top (rows-only check)
# ---------------------------------------------------------------------------

_XLEV_SCHEMA = ("doc_id long, err double, "
                "confusions array<struct<pred:string,gt:string>>")


def _xlev_batch(batches):
    from dup_ocropy_spark.kernels.edist import xlevenshtein

    for pdf in batches:
        rows = []
        # zip over ndarrays, not iterrows (row-object construction is ~10x)
        for doc_id, pred, gt in zip(pdf["doc_id"].to_numpy(),
                                    pdf["pred"].to_numpy(), pdf["gt"].to_numpy()):
            err, conf = xlevenshtein(pred, gt) if gt else (0.0, [])
            rows.append({"doc_id": doc_id, "err": err,
                         "confusions": [{"pred": a, "gt": b} for a, b in conf]})
        yield pd.DataFrame(rows)


@register(
    "a2_xlevenshtein_confusions",
    sql=None,  # DP alignment + backtrace is not SQL-expressible
    doc="xlevenshtein: edit distance with context-windowed confusion pairs "
        "(ocrolib/edist.py:21-83); Arrow batch kernel, then JVM "
        "explode+groupBy top-k (the econf reduce)",
)
def a2_xlevenshtein_confusions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dup_ocropy_spark.operators.relational import _doc_pairs

    pairs = _doc_pairs(spark, sf_dir)
    xl = pairs.mapInPandas(_xlev_batch, schema=_XLEV_SCHEMA)
    conf = (xl.select(F.explode("confusions").alias("c"))
            .groupBy(F.col("c.pred").alias("pred"), F.col("c.gt").alias("gt"))
            .agg(F.count("*").alias("n")))
    return conf.orderBy(F.desc("n"), "pred", "gt").limit(20)


@register(
    "dedup_embedding_cosine",
    sql="""
    SELECT doc_a, doc_b, cos FROM (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 4) AS cos
      FROM (SELECT * FROM embeddings WHERE vec_id < 100) a
      JOIN embeddings b ON b.vec_id > a.vec_id
    ) ORDER BY cos DESC, doc_a, doc_b LIMIT 25
    """,
    doc="embedding-cosine near-dup: the semantic-dedup variant (exact "
        "baseline; ann_lsh_topk is the bucketed scale path). Global top-k "
        "NEAREST pairs rather than a fixed threshold, so the driver always "
        "hash-checks real cosine pairs — the former cos>=0.5 cut returned "
        "the empty set on the random-embedding driver corpus, and two "
        "engines agreeing on 0 rows verifies nothing",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dup_ocropy_spark.operators.similarity import _cosine

    e = table(spark, sf_dir, "embeddings")
    a = (e.where(F.col("vec_id") < 100)
         .select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("ea")))
    b = e.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("eb"))
    j = F.broadcast(a).join(b, F.col("doc_b") > F.col("doc_a"))
    cos = F.round(_cosine(F.col("ea"), F.col("eb")), 4)
    # order by the ROUNDED value with the unique (doc_a, doc_b) tie-break
    # (repo-wide determinism rule); plans as TakeOrderedAndProject —
    # per-partition heaps, never a global sort
    return (j.select("doc_a", "doc_b", cos.alias("cos"))
            .orderBy(F.desc("cos"), "doc_a", "doc_b").limit(25))
