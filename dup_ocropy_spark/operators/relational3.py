"""Third operator batch: sessionization, pivot-style conditional
aggregation, rollup, and percentile profiles — the OLAP surface a
transcript-analytics user expects on top of extraction output."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dup_ocropy_spark.operators.registry import register, table


@register(
    "sessionize",
    sql="""
    SELECT event_id, user_id,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_id
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                          ORDER BY ts, event_id))
                          > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    """,
    doc="sessionization: gap>30min starts a new session — lag + cumsum "
        "window (the same boundary-cumsum recast as G3, over time gaps)",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sid = F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, 0))
    return e.select("event_id", "user_id", sid.alias("session_id"))


@register(
    "pivot_event_values",
    sql="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 4) AS click_v,
           round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 4) AS view_v,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS purchase_v
    FROM events GROUP BY user_id
    """,
    doc="pivot: wide per-entity profile via conditional aggregation "
        "(portable form of df.groupBy().pivot())",
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    def piv(t):
        return F.round(F.sum(F.when(F.col("event_type") == t, F.col("value"))
                             .otherwise(0.0)), 4)
    return (e.groupBy("user_id")
            .agg(piv("click").alias("click_v"),
                 piv("view").alias("view_v"),
                 piv("purchase").alias("purchase_v")))


@register(
    "rollup_order_stats",
    sql="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="rollup: hierarchical subtotal lattice (status, priority) -> "
        "(status) -> grand total",
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 4).alias("total"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                    "n_orders", "total"))


@register(
    "asof_join",
    sql="""
    SELECT event_id, user_id,
           round(last_click, 6) AS last_click
    FROM (
      SELECT event_id, user_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN value END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click
      FROM events
    ) WHERE event_type = 'purchase' AND last_click IS NOT NULL
    """,
    doc="as-of join: each purchase picks the most recent strictly-prior "
        "click value per user — window last(ignorenulls) over a "
        "(-inf, -1] frame instead of a range join (the Spark-native "
        "asof pattern; scales as one partitioned window, no join)",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("value")),
        ignorenulls=True).over(w)
    return (e.select("event_id", "user_id", "event_type",
                     last_click.alias("last_click"))
            .where((F.col("event_type") == "purchase")
                   & F.col("last_click").isNotNull())
            .select("event_id", "user_id", F.round("last_click", 6).alias("last_click")))


@register(
    "length_profile",
    sql="""
    SELECT source,
           round(CAST(quantile_cont(n_chars, 0.25) AS DOUBLE), 4) AS p25,
           round(CAST(quantile_cont(n_chars, 0.50) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(n_chars, 0.75) AS DOUBLE), 4) AS p75,
           round(CAST(quantile_cont(n_chars, 0.95) AS DOUBLE), 4) AS p95
    FROM documents GROUP BY source
    """,
    doc="percentile profile of payload sizes per source (capacity-planning "
        "agg; exact percentiles — percentile_approx is the 100TB variant)",
)
def length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (d.groupBy("source")
            # rounded 4dp BOTH sides (repo invariant): the two engines'
            # linear interpolation can differ in the last ulp
            .agg(*[F.round(F.percentile("n_chars", F.lit(q)), 4)
                   .alias(f"p{int(q*100)}")
                   for q in (0.25, 0.50, 0.75, 0.95)]))
