"""Temporal/event-stream surface over the `events` table (nanos `ts` as
long — see suite.base.load): sessionization, tumbling windows, as-of and
range joins (operators/joins.py). These are the batch twins of the
Structured Streaming operators in `streaming/` — same logic, bounded
input."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join, range_join_count
from .base import load, register

SESSION_GAP_NS = 1_800_000_000_000  # 30 min
DAY_NS = 86_400_000_000_000


# --------------------------------------------------------------------------
# sessionization: gap-based session ids via lag + cumulative flag — the
# batch form of a session window (streaming: window(..., "session"))
# --------------------------------------------------------------------------
@register(
    "zz_e01_sessionization",
    sql=f"""
    WITH l AS (
      SELECT user_id, event_id, epoch_ns(ts) AS tsn,
             lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_ns(ts) NULLS FIRST,
                                              event_id NULLS FIRST) AS prev
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, tsn,
             CASE WHEN prev IS NULL OR tsn - prev > {SESSION_GAP_NS}
                  THEN 1 ELSE 0 END AS is_new
      FROM l
    )
    SELECT user_id, event_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY tsn NULLS FIRST,
                                           event_id NULLS FIRST
                                  ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS session_id
    FROM s
    """,
    survey_ref="streaming extension: session windows (batch twin)",
    tags=("window", "temporal"),
    bench=True,
)
def zz_e01_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev").isNull()
                | (F.col("ts") - F.col("prev") > SESSION_GAP_NS),
                1,
            ).otherwise(0),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("is_new").over(wcum).alias("session_id"),
        )
    )


# --------------------------------------------------------------------------
# tumbling event-time windows (watermark-less batch twin)
# --------------------------------------------------------------------------
HOUR_NS = 3_600_000_000_000


@register(
    "zz_e02_tumbling_windows",
    sql=f"""
    SELECT event_type,
           (epoch_ns(ts) // {HOUR_NS}) * 3600 AS hour_start,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
    survey_ref="streaming extension: windowed aggregation (batch twin)",
    tags=("agg", "temporal"),
)
def zz_e02_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    # pure integer bucketing on epoch nanos: engine- and timezone-proof
    # (date_trunc on an instant shifts with session tz)
    hour_start = F.expr(f"ts div {HOUR_NS}L") * F.lit(3600).cast("long")
    return (
        events.withColumn("hour_start", hour_start)
        .groupBy("event_type", "hour_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
    )


# --------------------------------------------------------------------------
# as-of join: latest order at-or-before each event (union-tag algorithm;
# oracle = correlated top-1, same semantics)
# --------------------------------------------------------------------------
@register(
    "zz_j01_asof_join",
    sql="""
    SELECT e.event_id, e.user_id AS key_user,
           (SELECT o.o_orderkey FROM orders o
            WHERE o.o_custkey = e.user_id AND epoch_ns(o.o_orderdate) <= epoch_ns(e.ts)
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS o_orderkey
    FROM events e
    """,
    survey_ref="custom operator: as-of join (union-tag + window)",
    tags=("join", "temporal", "asof"),
    bench=True,
)
def zz_j01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, orders = load(spark, sf_dir, "events", "orders")
    right = orders.select(
        "o_custkey",
        # datediff-based epoch: session-timezone-proof (unix_timestamp on a
        # DATE shifts with the session tz; the DuckDB oracle's epoch_ns is
        # UTC-midnight based)
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
            * F.lit(86_400_000_000_000)
        ).alias("order_ts_ns"),
        "o_orderkey",
    )
    out = asof_join(
        left=events,
        right=right.withColumnRenamed("o_custkey", "user_id"),
        key_col="user_id",
        left_ts_col="ts",
        right_ts_col="order_ts_ns",
        left_id_col="event_id",
        payload_cols=["o_orderkey"],
        right_tiebreak_col="o_orderkey",
    )
    return out.select(
        "event_id", F.col("user_id").alias("key_user"), "o_orderkey"
    )


# --------------------------------------------------------------------------
# range join: orders placed within 7 days after each event
# --------------------------------------------------------------------------
@register(
    "zz_j02_range_join",
    sql=f"""
    SELECT e.event_id, e.user_id AS key_user, count(o.o_orderkey) AS n_in_range
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id
     AND epoch_ns(o.o_orderdate) >= epoch_ns(e.ts)
     AND epoch_ns(o.o_orderdate) < epoch_ns(e.ts) + {7 * DAY_NS}
    GROUP BY e.event_id, e.user_id
    """,
    survey_ref="custom operator: range join (equi-key + range filter)",
    tags=("join", "temporal", "range"),
)
def zz_j02_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, orders = load(spark, sf_dir, "events", "orders")
    right = orders.select(
        "o_custkey",
        # datediff-based epoch: session-timezone-proof (unix_timestamp on a
        # DATE shifts with the session tz; the DuckDB oracle's epoch_ns is
        # UTC-midnight based)
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
            * F.lit(86_400_000_000_000)
        ).alias("order_ts_ns"),
        "o_orderkey",
    )
    out = range_join_count(
        left=events.withColumnRenamed("user_id", "key_user"),
        right=right.withColumnRenamed("o_custkey", "key_user"),
        key_col="key_user",
        left_ts_col="ts",
        right_ts_col="order_ts_ns",
        left_id_col="event_id",
        window_len=7 * DAY_NS,
    )
    return out.select("event_id", "key_user", "n_in_range")


# --------------------------------------------------------------------------
# z27: strict-order event funnel (view → click → purchase, first-touch):
# the earliest view, the earliest click AFTER it, the earliest purchase
# after THAT — all within a 7-day window of the first step. Three
# conditional-min aggregations chained through user-keyed joins: no
# per-user event-list window, no collect, each stage is one
# map-side-combinable agg — the shape that survives a 100 TB event log.
# Purchase implies click by construction (p joins through c).
# (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
FUNNEL_WINDOW_NS = 7 * DAY_NS


@register(
    "zz_z27_event_funnel",
    sql=f"""
    WITH v AS (
      SELECT user_id, min(epoch_ns(ts)) AS ts_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(epoch_ns(e.ts)) AS ts_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND epoch_ns(e.ts) > v.ts_view
        AND epoch_ns(e.ts) <= v.ts_view + {FUNNEL_WINDOW_NS}
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(epoch_ns(e.ts)) AS ts_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
                    JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_ns(e.ts) > c.ts_click
        AND epoch_ns(e.ts) <= v.ts_view + {FUNNEL_WINDOW_NS}
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.ts_view, c.ts_click, p.ts_purchase,
           CAST(1 + (c.ts_click IS NOT NULL)::INT
                  + (p.ts_purchase IS NOT NULL)::INT AS BIGINT) AS stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
    survey_ref="event analytics: strict-order funnel (conditional-min chain)",
    tags=("temporal", "agg"),
    bench=True,
)
def z27_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("ts_view"))
            & (F.col("ts") <= F.col("ts_view") + FUNNEL_WINDOW_NS)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("ts_click"))
            & (F.col("ts") <= F.col("ts_view") + FUNNEL_WINDOW_NS)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "ts_view",
            "ts_click",
            "ts_purchase",
            (
                F.lit(1)
                + F.col("ts_click").isNotNull().cast("int")
                + F.col("ts_purchase").isNotNull().cast("int")
            )
            .cast("bigint")
            .alias("stage"),
        )
    )


# --------------------------------------------------------------------------
# z28: retention cohort matrix — cohort = the user's first active epoch
# week (fixed 1970 week grid, engine-identical integer division), cell =
# distinct users from that cohort active at each week offset. Two
# map-side-combinable aggs over (user, week)-distinct rows; the matrix
# is (weeks × offsets)-bounded, never user-bounded.
# (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
WEEK_NS = 7 * DAY_NS


@register(
    "zz_z28_retention_cohorts",
    sql=f"""
    WITH act AS (
      SELECT DISTINCT user_id, epoch_ns(ts) // {WEEK_NS} AS week
      FROM events
    ),
    first_w AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id)
    SELECT f.cohort_week, a.week - f.cohort_week AS offset_weeks,
           count(DISTINCT a.user_id) AS n_users
    FROM act a JOIN first_w f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    survey_ref="event analytics: retention cohort matrix",
    tags=("temporal", "agg"),
    bench=True,
)
def z28_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    # integer div, not float `/`: ts ns values exceed 2^53, so a double
    # quotient can flip a week boundary vs the oracle's exact `//`
    act = events.select(
        "user_id", F.expr(f"ts div {WEEK_NS}").alias("week")
    ).distinct()
    first_w = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(first_w, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("offset_weeks"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
