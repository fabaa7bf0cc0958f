"""Round-7 surface additions, batch 5 (zyd1–zyd4): CDC latest-wins
snapshot (MERGE-semantics replay), PSI distribution-drift sufficient
statistics, windowed funnel conversion, and grouped exact percentiles.

Names sort after zyc5 and before the `zz_` tail — all four land inside
the driver's recorded 50-name window. Exactness rules as usual: the
PSI log and conversion rates stay caller-side; the oracle-checked
output is counts, integer timestamps, and DECIMAL(38,0)/HUGEINT digit
strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

DAY_NS = 86_400_000_000_000
HOUR_NS = 3_600_000_000_000
# events span 2024-01-01..01-30; Jan 16 00:00 UTC splits the month
PSI_CUTOFF_NS = 1_705_363_200_000_000_000
PSI_BUCKET_CENTS = 500


# --------------------------------------------------------------------------
# zyd1: CDC latest-wins snapshot — replay the event log as a change
# stream (error = delete marker): one max_by hash-agg per key, never a
# window or ordered fold; keys whose latest change is a delete are
# absent. The batch twin of MERGE INTO / the reference's current-state
# application (SURVEY §2.3 C4/C5 family).
# --------------------------------------------------------------------------
@register(
    "zyd1_cdc_snapshot",
    sql="""
    WITH c AS (
      SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_ns(ts) AS tsn, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts) DESC,
                                         event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_changes
      FROM events
    )
    SELECT user_id, event_type AS last_op, cents AS last_cents,
           tsn AS last_ts, CAST(n_changes AS BIGINT) AS n_changes
    FROM c WHERE rn = 1 AND event_type <> 'error'
    """,
    survey_ref="SURVEY §2.3 C4/C5 latest-state family as CDC replay "
    "(operators/cdc.latest_snapshot; MvStorage current-map semantics)",
    tags=("agg", "cdc"),
)
def zyd1_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import latest_snapshot

    (events,) = load(spark, sf_dir, "events")
    ch = events.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.col("ts").alias("tsn"),
        "event_id",
    )
    return latest_snapshot(
        ch,
        "user_id",
        ["tsn", "event_id"],
        "event_type",
        delete_ops=("error",),
        value_cols=["cents", "tsn"],
    ).select(
        "user_id",
        "last_op",
        "last_cents",
        F.col("last_tsn").alias("last_ts"),
        "n_changes",
    )


# --------------------------------------------------------------------------
# zyd2: PSI drift sufficient statistics — event-value distribution of
# the month's first half vs second half, bucketed to $5 cells; exact
# counts, totals, and cross-product numerators (the float ln is
# caller-side via stats.psi_value). The feature/score drift monitor.
# --------------------------------------------------------------------------
@register(
    "zyd2_psi_drift",
    sql=f"""
    WITH t AS (
      SELECT CAST(round(value * 100) AS BIGINT) // {PSI_BUCKET_CENTS}
               AS bucket,
             CASE WHEN epoch_ns(ts) < {PSI_CUTOFF_NS}
                  THEN 'p1' ELSE 'p2' END AS period
      FROM events
    ),
    h AS (
      SELECT bucket,
             sum(CASE WHEN period = 'p1' THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN period = 'p2' THEN 1 ELSE 0 END) AS b
      FROM t GROUP BY 1
    )
    SELECT bucket, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(sum(a) OVER () AS BIGINT) AS a_tot,
           CAST(sum(b) OVER () AS BIGINT) AS b_tot,
           CAST(CAST(a AS HUGEINT) * CAST(sum(b) OVER () AS HUGEINT)
                AS VARCHAR) AS a_x_btot,
           CAST(CAST(b AS HUGEINT) * CAST(sum(a) OVER () AS HUGEINT)
                AS VARCHAR) AS b_x_atot
    FROM h
    """,
    survey_ref="LLM-pipeline: distribution-drift monitoring (PSI "
    "sufficient stats; operators/stats.psi_sufficient_stats)",
    tags=("quality", "agg"),
)
def zyd2_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import psi_sufficient_stats

    (events,) = load(spark, sf_dir, "events")
    t = events.select(
        F.expr(
            f"CAST(round(value * 100) AS BIGINT) div {PSI_BUCKET_CENTS}"
        ).alias("bucket"),
        F.when(F.col("ts") < PSI_CUTOFF_NS, F.lit("p1"))
        .otherwise(F.lit("p2"))
        .alias("period"),
    )
    out = psi_sufficient_stats(t, "bucket", "period", "p1", "p2")
    return out.select(
        "bucket",
        "a",
        "b",
        "a_tot",
        "b_tot",
        F.col("a_x_btot").cast("string").alias("a_x_btot"),
        F.col("b_x_atot").cast("string").alias("b_x_atot"),
    )


# --------------------------------------------------------------------------
# zyd3: windowed funnel — per user, first 'view' and the earliest
# 'purchase' within ONE HOUR of it; reported per first-view day as
# (viewers, converted, exact delay sum). z27's path funnel without a
# time bound answers a different question — this is attribution.
# --------------------------------------------------------------------------
@register(
    "zyd3_windowed_funnel",
    sql=f"""
    WITH firsts AS (
      SELECT user_id, min(epoch_ns(ts)) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    conv AS (
      SELECT f.user_id, min(epoch_ns(e.ts)) AS t1
      FROM firsts f JOIN events e ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_ns(e.ts) > f.t0
        AND epoch_ns(e.ts) <= f.t0 + {HOUR_NS}
      GROUP BY 1
    )
    SELECT CAST(f.t0 // {DAY_NS} AS BIGINT) AS day,
           count(*) AS n_viewers,
           CAST(sum(CASE WHEN c.t1 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted,
           CAST(coalesce(sum(c.t1 - f.t0), 0) AS BIGINT) AS sum_delay_ns
    FROM firsts f LEFT JOIN conv c ON f.user_id = c.user_id
    GROUP BY 1
    """,
    survey_ref="LLM-pipeline / product analytics: time-bounded funnel "
    "(operators/joins.windowed_conversion)",
    tags=("temporal", "join"),
)
def zyd3_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import windowed_conversion

    (events,) = load(spark, sf_dir, "events")
    per = windowed_conversion(
        events, "user_id", "ts", "event_type", "view", "purchase", HOUR_NS
    )
    return per.groupBy(
        F.expr(f"t0 div {DAY_NS}").cast("long").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.sum(
            F.when(F.col("t1").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_converted"),
        F.coalesce(F.sum("delay"), F.lit(0)).cast("long").alias(
            "sum_delay_ns"
        ),
    )


# --------------------------------------------------------------------------
# zyd4: grouped exact percentiles — p50/p95/p99 of event value cents
# per event type (type-1, engine-identical integers), via the value-
# histogram reduction. The latency-SLO report shape.
# --------------------------------------------------------------------------
@register(
    "zyd4_grouped_percentiles",
    sql="""
    WITH h AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    cc AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM h
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum * 100 >= n * 50 THEN v END)
                AS BIGINT) AS p50,
           CAST(min(CASE WHEN cum * 100 >= n * 95 THEN v END)
                AS BIGINT) AS p95,
           CAST(min(CASE WHEN cum * 100 >= n * 99 THEN v END)
                AS BIGINT) AS p99
    FROM cc GROUP BY 1
    """,
    survey_ref="a04/zyb4 family: grouped exact type-1 percentiles from "
    "one histogram (operators/stats.grouped_percentiles)",
    tags=("agg", "percentile"),
)
def zyd4_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import grouped_percentiles

    (events,) = load(spark, sf_dir, "events")
    ev = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    return grouped_percentiles(ev, "event_type", "v", ps=(50, 95, 99))
