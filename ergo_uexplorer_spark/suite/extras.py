"""Round-6 surface additions (z35–z52): the remaining SURVEY §2.6
built-in categories (grouping sets, pivot/unpivot, sliding event-time
distinct), robust/exact statistics (MAD outliers, mode, central
moments, rational correlation), graph triangle counting, and
LLM-pipeline curation diagnostics (Zipf/hapax, source Gini
concentration, cross-source duplication, canonical first-seen,
embedding norm QA, per-group top-k digests, reconciliation audits).

Names sort after z34 and before the zz_ tail so every entry lands in
the driver's recorded 50-name CORRECTNESS window this round (see
PARITY.md on the r6 rotation).

Exactness rules follow suite/base.py: integer cents everywhere, `div`
floor division on both engines, 128-bit arithmetic (Spark decimal /
DuckDB HUGEINT) surfaced as digit STRINGS for products that can pass
int64 at sf≥1 (pandas/duckdb degrade DECIMAL(38,0) to float64 at the
compare layer, so a decimal output column can never strict-match),
interpolated medians doubled into exact integers (both engines use the
(n−1)·q convention and the midpoint of two int64s is FP-exact), unique
tiebreaks under every row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import graph as G
from ..operators import similarity as S
from ..operators.dedup import normalized_text
from ..operators.similarity import dot
from .base import emb_finite_sql, load, register
from .dedup import _HASHED_JACCARD_SQL
from .similarity import _DOT


def _cents(col):
    return F.round(col * F.lit(100)).cast("bigint")


_CENTS_SQL = "CAST(round({col} * 100) AS BIGINT)"


# --------------------------------------------------------------------------
# z35: GROUPING SETS — the §2.6 multi-granularity aggregation family
# member cube (z07) and rollup (zz_b02) don't cover: an arbitrary,
# non-hierarchical set of granularities in ONE pass over the fact table
# (Catalyst expands to a single Expand + hash-agg — no N scans).
# grouping() flags disambiguate "NULL group value" from "aggregated
# out", same contract as the reference-absent SQL surface Spark gives
# for free.
# --------------------------------------------------------------------------
@register(
    "zz_z35_grouping_sets",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n_orders,
           CAST(sum({_CENTS_SQL.format(col='o_totalprice')}) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
    survey_ref="SURVEY §2.6: grouping sets (free via Spark built-ins)",
    tags=("agg", "olap"),
)
def z35_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupingSets(
        [
            [F.col("o_orderstatus"), F.col("o_orderpriority")],
            [F.col("o_orderstatus")],
            [],
        ],
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    ).agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
    )


# --------------------------------------------------------------------------
# z36: pivot — long→wide with a FIXED value list (['O','F','P']), which
# keeps the output schema static (a data-driven pivot would need an
# extra distinct scan and make the schema nondeterministic under new
# statuses — the wrong default at 100 TB).
# --------------------------------------------------------------------------
@register(
    "zz_z36_pivot_status",
    sql="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY 1
    """,
    survey_ref="SURVEY §2.6: pivot (conditional-agg equivalence)",
    tags=("agg", "olap"),
)
def z36_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    zero = F.lit(0).cast("bigint")
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), zero).alias("n_o"),
        F.coalesce(F.col("F"), zero).alias("n_f"),
        F.coalesce(F.col("P"), zero).alias("n_p"),
    )


# --------------------------------------------------------------------------
# z37: unpivot (melt) — wide→long, the inverse surface. One narrow
# UNION-free Expand in the plan; values pre-cast to one type because
# unpivot requires a common value column type.
# --------------------------------------------------------------------------
@register(
    "zz_z37_unpivot_part_metrics",
    sql=f"""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS val
    FROM part WHERE p_partkey < 512
    UNION ALL
    SELECT p_partkey, 'retail_cents', {_CENTS_SQL.format(col='p_retailprice')}
    FROM part WHERE p_partkey < 512
    """,
    survey_ref="SURVEY §2.6: unpivot/melt (free via Spark built-ins)",
    tags=("olap",),
)
def z37_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = load(spark, sf_dir, "part")
    wide = part.filter(F.col("p_partkey") < 512).select(
        "p_partkey",
        F.col("p_size").cast("bigint").alias("size"),
        _cents(F.col("p_retailprice")).alias("retail_cents"),
    )
    return wide.unpivot(["p_partkey"], ["size", "retail_cents"], "metric", "val")


# --------------------------------------------------------------------------
# z38: sliding event-time windows with EXACT distinct users — the
# overlapping-window companion to zz_e02's tumbling windows. F.window
# assigns each event to its 4 covering (1h, slide 15m) windows; the
# oracle derives the same 4 epoch-aligned starts arithmetically. Window
# starts surface as BIGINT ns so the contract is timezone-proof.
# --------------------------------------------------------------------------
@register(
    "zz_z38_sliding_window_distinct",
    sql="""
    WITH e AS (SELECT epoch_ns(ts) AS tns, user_id FROM events
               WHERE ts IS NOT NULL),
    w AS (
      -- FLOOR-aligned slide start: DuckDB's integer // truncates
      -- toward zero, which on a PRE-EPOCH event emits a window that
      -- does not contain it (Spark's F.window floors — r12 dirty-menu
      -- catch); the positive-mod form is floor-exact for any sign
      SELECT tns - ((tns % 900000000000) + 900000000000) % 900000000000
               - k * 900000000000 AS window_start_ns,
             user_id
      FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) t(k)
    )
    SELECT window_start_ns,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM w GROUP BY 1
    """,
    survey_ref="SURVEY §2.6: event-time windows (sliding, exact distinct)",
    tags=("window", "agg"),
    bench=True,
)
def z38_sliding_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    ts = events.withColumn(
        "__t", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        ts.groupBy(F.window("__t", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) * F.lit(1000)).alias(
                "window_start_ns"
            ),
            "n_users",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# z39: MAD outliers — the ROBUST companion to z29's mean/stddev
# z-scores (one far outlier inflates σ and masks the rest; the median
# absolute deviation doesn't break down until 50% contamination).
# Exactness: med2 = 2·median and mad4 = 2·median(|2x − med2|) are exact
# int64 (midpoint of two int64s is FP-exact; both engines interpolate
# at (n−1)·q), and the 3-MAD rule |x−med| > 3·MAD becomes the pure
# integer comparison 4·dev2 > 3·mad4.
# --------------------------------------------------------------------------
@register(
    "zz_z39_mad_outliers",
    sql=f"""
    WITH v AS (SELECT event_type,
                      {_CENTS_SQL.format(col='value')} AS c FROM events),
    m AS (SELECT event_type,
                 CAST(2 * quantile_cont(c, 0.5) AS BIGINT) AS med2
          FROM v GROUP BY 1),
    d AS (SELECT v.event_type, abs(2 * c - med2) AS dev2, med2
          FROM v JOIN m USING (event_type)),
    s AS (SELECT event_type,
                 CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4,
                 max(med2) AS med2, count(*) AS n
          FROM d GROUP BY 1)
    SELECT d.event_type, s.med2, s.mad4, s.n,
           CAST(sum(CASE WHEN 4 * dev2 > 3 * mad4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN s USING (event_type)
    GROUP BY 1, 2, 3, 4
    """,
    survey_ref="LLM-pipeline: robust outlier gate (median/MAD)",
    tags=("agg", "quality"),
)
def z39_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    v = events.select("event_type", _cents(F.col("value")).alias("c"))
    med = v.groupBy("event_type").agg(
        (F.percentile("c", F.lit(0.5)) * 2).cast("bigint").alias("med2")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(2 * F.col("c") - F.col("med2")).alias("dev2"),
        "med2",
    )
    stats = dev.groupBy("event_type").agg(
        (F.percentile("dev2", F.lit(0.5)) * 2).cast("bigint").alias("mad4"),
        F.max("med2").alias("med2"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        dev.select("event_type", "dev2")
        .join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "med2", "mad4", "n")
        .agg(
            F.sum(
                F.when(4 * F.col("dev2") > 3 * F.col("mad4"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )


# --------------------------------------------------------------------------
# z40: per-group mode with a DETERMINISTIC tiebreak (smallest id among
# the maximally-frequent) — built-in mode() is tie-nondeterministic in
# both engines, so the contract is max(struct(count, -id)) on the Spark
# side and the count-equality join on the oracle side.
# --------------------------------------------------------------------------
@register(
    "zz_z40_group_mode",
    sql="""
    WITH c AS (SELECT event_type, user_id, count(*) AS n
               FROM events GROUP BY 1, 2),
    m AS (SELECT event_type, max(n) AS mx FROM c GROUP BY 1)
    SELECT c.event_type, min(user_id) AS mode_user,
           CAST(max(c.n) AS BIGINT) AS n_events
    FROM c JOIN m ON c.event_type IS NOT DISTINCT FROM m.event_type
               AND c.n = m.mx
    GROUP BY 1
    """,
    survey_ref="SURVEY §2.6: aggregate surface (deterministic mode)",
    tags=("agg",),
)
def z40_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    cnt = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    best = cnt.groupBy("event_type").agg(
        F.max(F.struct(F.col("n"), (-F.col("user_id")).alias("nu"))).alias("b")
    )
    return best.select(
        "event_type",
        (-F.col("b.nu")).alias("mode_user"),
        F.col("b.n").alias("n_events"),
    )


# --------------------------------------------------------------------------
# z41: central-moment components — the exact-integer building blocks
# for skewness/kurtosis (engine built-ins disagree on sample-vs-
# population formulas AND drift on FP reduction order, so the contract
# is the raw power sums). Σx² and Σx³ pass int64 at scale, hence
# 128-bit internally (Spark decimal, DuckDB HUGEINT) and surfaced as
# DIGIT STRINGS: pandas/duckdb degrade DECIMAL(38,0) to float64 on
# .df() conversion, which would destroy exactness at the compare layer.
# --------------------------------------------------------------------------
@register(
    "zz_z41_central_moments",
    sql=f"""
    WITH v AS (SELECT o_orderstatus,
                      CAST({_CENTS_SQL.format(col='o_totalprice')} AS HUGEINT)
                          AS x
               FROM orders)
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(x * x) AS VARCHAR) AS sum_x2,
           CAST(sum(x * x * x) AS VARCHAR) AS sum_x3
    FROM v GROUP BY 1
    """,
    survey_ref="SURVEY §2.6: aggregate surface (exact moment sums)",
    tags=("agg", "stats"),
)
def z41_central_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    x = _cents(F.col("o_totalprice")).cast("decimal(38,0)")
    v = orders.select("o_orderstatus", x.alias("x"))
    return v.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum(F.col("x") * F.col("x"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("sum_x2"),
        F.sum(F.col("x") * F.col("x") * F.col("x"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("sum_x3"),
    )


# --------------------------------------------------------------------------
# z42: triangle counting over the RECURRING supplier-partnership graph
# (pairs sharing ≥4 distinct orders). The raw one-shot co-occurrence
# graph is a TPC-H artifact — near-complete at sf≥0.1, where triangle
# enumeration is Θ(n³) by necessity (166M triangles at sf0.1); the
# support threshold is the standard market-basket move that keeps the
# graph sparse and the count meaningful while co-occurrence density
# falls naturally at larger scale. Edges oriented u<v so each triangle
# is enumerated once; the operator's orient="degree" variant is the
# skew-bounded 100 TB path (see graph.triangle_count) and a pytest pins
# the two orientations equal.
# --------------------------------------------------------------------------
@register(
    "zz_z42_triangle_count",
    sql="""
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= 4
    )
    SELECT (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*)
            FROM e e1 JOIN e e2 ON e1.v = e2.u
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
               AS n_triangles
    """,
    survey_ref="graph analytics: triangle count (compact-forward)",
    tags=("graph", "join"),
    bench=True,
)
def z42_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    # The fact-scale groupBy(basket) stays distributed at every
    # scale (collect_set dedupes suppliers within the order); the
    # fused operator gates everything AFTER it — pair explode,
    # support count, triangle closure — into one Arrow task when the
    # per-order set table fits the broadcast budget, and falls back
    # to the sorted-array pair explode + hash aggregate +
    # triangle_count (its own wedge-volume gate) when it does not.
    # The r11 form — distinct + self-join on l_orderkey + pair
    # groupBy — paid four shuffles for the same answer; the oracle
    # keeps the self-join formulation (engine-plan change only).
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("ss")
    )
    return G.cooccurrence_triangles(per_order, items="ss", min_support=4)


# --------------------------------------------------------------------------
# z43: Zipf/hapax diagnostics per source — type counts, hapax share of
# the vocabulary, and the head token's corpus share: the standard
# quick-look for "is this source natural language or boilerplate/spam"
# (natural text ≈ 40–60% hapax, head share ~ permille-scale; templated
# text collapses both).
# --------------------------------------------------------------------------
@register(
    "zz_z43_hapax_zipf",
    sql="""
    WITH base AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text),
                                                   '[^a-z0-9]+'),
                    x -> x <> '')) AS g
      FROM documents
    ),
    tf AS (SELECT source, g, count(*) AS f FROM base GROUP BY 1, 2)
    SELECT source,
           CAST(sum(f) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           CAST(1000 * sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) // count(*)
                AS BIGINT) AS hapax_permille,
           CAST(1000 * max(f) // sum(f) AS BIGINT) AS top_share_permille
    FROM tf GROUP BY 1
    """,
    survey_ref="LLM-pipeline: Zipf/hapax source diagnostics",
    tags=("text", "agg"),
)
def z43_hapax_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textops import tokens
    from ..operators.util import ensure_parallelism

    (docs,) = load(spark, sf_dir, "documents")
    tf = (
        # spread the single-file scan before the corpus-wide explode —
        # same single-task hotspot class as z33 (see 0e5c85c)
        ensure_parallelism(docs)
        .select("source", F.explode(tokens(F.col("text"))).alias("g"))
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return tf.groupBy("source").agg(
        F.sum("f").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.expr(
            "CAST(1000 * sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)"
            " div count(1) AS BIGINT)"
        ).alias("hapax_permille"),
        F.expr("CAST(1000 * max(f) div sum(f) AS BIGINT)").alias(
            "top_share_permille"
        ),
    )


# --------------------------------------------------------------------------
# z44: full-outer reconciliation audit — fact-vs-detail integrity in one
# pass (matched / header-only / orphan-detail counts + the value at
# risk). The shape every large pipeline runs after a backfill; a
# single-row result regardless of input size.
# --------------------------------------------------------------------------
@register(
    "zz_z44_order_reconciliation",
    sql=f"""
    WITH l AS (SELECT DISTINCT l_orderkey FROM lineitem),
    j AS (
      SELECT o.o_orderkey, l.l_orderkey,
             {_CENTS_SQL.format(col='o.o_totalprice')} AS cents
      FROM orders o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey
    )
    SELECT
      CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_orders_without_lines,
      CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_orphan_lines,
      CAST(sum(CASE WHEN l_orderkey IS NULL THEN cents ELSE 0 END)
           AS BIGINT) AS unmatched_cents
    FROM j
    """,
    survey_ref="C9-adjacent: cross-table consistency audit",
    tags=("join", "audit"),
)
def z44_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    keys = lineitem.select("l_orderkey").distinct()
    j = orders.select(
        "o_orderkey", _cents(F.col("o_totalprice")).alias("cents")
    ).join(keys, F.col("o_orderkey") == F.col("l_orderkey"), "full_outer")
    has_o = F.col("o_orderkey").isNotNull()
    has_l = F.col("l_orderkey").isNotNull()
    return j.agg(
        F.sum((has_o & has_l).cast("long")).alias("n_matched"),
        F.sum((~has_l).cast("long")).alias("n_orders_without_lines"),
        F.sum((~has_o).cast("long")).alias("n_orphan_lines"),
        F.sum(F.when(~has_l, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("unmatched_cents"),
    )


# --------------------------------------------------------------------------
# z45: inter-order gap histogram — lag() over each customer's order
# history bucketed to weeks. The lag/lead family member the suite
# didn't cover (t03/z34 are frame aggregates). Dates compared as DATE
# on both engines, so the session timezone can't shift a bucket.
# --------------------------------------------------------------------------
@register(
    "zz_z45_order_gap_histogram",
    sql="""
    WITH g AS (
      -- NULLS FIRST pinned: Spark's ASC defaults to NULLS FIRST,
      -- DuckDB's to NULLS LAST — with mixed null/non-null dates in
      -- one partition the lag chains diverge (r12 dirty-menu catch)
      SELECT CAST(o_orderdate AS DATE) AS d,
             lag(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC NULLS FIRST,
                        o_orderkey ASC NULLS FIRST) AS pd
      FROM orders
    )
    SELECT CAST((d - pd) // 7 AS BIGINT) AS gap_weeks,
           count(*) AS n_gaps
    FROM g WHERE pd IS NOT NULL GROUP BY 1
    """,
    survey_ref="SURVEY §2.6: window functions (lag/lead)",
    tags=("window", "agg"),
)
def z45_order_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    g = orders.select(
        F.to_date("o_orderdate").alias("d"),
        F.lag(F.to_date("o_orderdate")).over(w).alias("pd"),
    )
    return (
        g.filter(F.col("pd").isNotNull())
        .select(
            F.expr("CAST(datediff(d, pd) div 7 AS BIGINT)").alias("gap_weeks")
        )
        .groupBy("gap_weeks")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


# --------------------------------------------------------------------------
# z46: per-group top-k digest — each supplier's top-3 parts by revenue
# folded into one ordered string (rank via row_number with a unique
# tiebreak; the digest via sort_array over (rank, item) structs so the
# collect order can't leak in). The "summary column" shape dashboards
# and feature stores ask for.
# --------------------------------------------------------------------------
@register(
    "zz_z46_topk_digest",
    sql=f"""
    WITH r AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum({_CENTS_SQL.format(col='l_extendedprice')}) AS BIGINT)
                 AS rev
      FROM lineitem WHERE l_suppkey < 50 GROUP BY 1, 2
    ),
    t AS (
      SELECT *, row_number() OVER (
          PARTITION BY l_suppkey ORDER BY rev DESC, l_partkey ASC) AS rn
      FROM r
    )
    SELECT l_suppkey,
           string_agg(l_partkey || ':' || rev, ',' ORDER BY rn) AS top_parts
    FROM t WHERE rn <= 3 GROUP BY 1
    """,
    survey_ref="Q14/Q15-adjacent: per-group top-k digest column",
    tags=("window", "agg"),
)
def z46_topk_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    r = (
        lineitem.filter(F.col("l_suppkey") < 50)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("rev"))
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("rev"), F.asc("l_partkey")
    )
    t = r.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return (
        t.groupBy("l_suppkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "l_partkey", "rev"))
            ).alias("xs")
        )
        .select(
            "l_suppkey",
            F.array_join(
                F.transform(
                    F.col("xs"),
                    lambda x: F.concat_ws(
                        ":",
                        x["l_partkey"].cast("string"),
                        x["rev"].cast("string"),
                    ),
                ),
                ",",
            ).alias("top_parts"),
        )
    )


# --------------------------------------------------------------------------
# z47: fixed-width value histogram ($5000 buckets over order totals) —
# integer div bucketing, one hash-agg, the width_bucket shape without
# the FP boundary hazard.
# --------------------------------------------------------------------------
@register(
    "zz_z47_value_histogram",
    sql=f"""
    WITH v AS (SELECT {_CENTS_SQL.format(col='o_totalprice')} AS c
               FROM orders)
    SELECT CAST(c // 500000 AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(c) AS BIGINT) AS min_cents,
           CAST(max(c) AS BIGINT) AS max_cents
    FROM v GROUP BY 1
    """,
    survey_ref="SURVEY §2.6: aggregate surface (histogram)",
    tags=("agg",),
)
def z47_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    v = orders.select(_cents(F.col("o_totalprice")).alias("c"))
    return (
        v.withColumn("bucket", F.expr("CAST(c div 500000 AS BIGINT)"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
    )


# --------------------------------------------------------------------------
# z48: Gini concentration of document length per source — the mixture-
# balance diagnostic ("is one crawl bucket dominated by a few huge
# docs?"). Exact integer rational: with lengths ascending (unique
# doc_id tiebreak), G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx); Σi·xᵢ is
# invariant to tie order, so the permille floor is engine-identical.
# --------------------------------------------------------------------------
@register(
    "zz_z48_source_gini",
    sql="""
    WITH r AS (
      SELECT source, n_chars AS v,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars ASC NULLS FIRST,
                                         doc_id ASC NULLS FIRST) AS i
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(v) AS BIGINT) AS total_chars,
           CAST(CASE WHEN coalesce(sum(v), 0) <> 0 THEN
                  (1000 * (2 * sum(i * v) - (count(*) + 1) * sum(v)))
                  // (count(*) * sum(v)) END AS BIGINT) AS gini_permille
    FROM r GROUP BY 1
    """,
    survey_ref="LLM-pipeline: mixture concentration (Gini per source)",
    tags=("agg", "quality"),
)
def z48_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.asc("v"), F.asc("doc_id"))
    r = docs.select(
        "source", F.col("n_chars").alias("v"), "doc_id"
    ).withColumn("i", F.row_number().over(w)).drop("doc_id")
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("v").alias("total_chars"),
            F.sum(F.col("i").cast("long") * F.col("v")).alias("__s1"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            # a group whose total size is 0 (or all-null) has no Gini —
            # an unguarded div crashed the job under ANSI on one dirty
            # group (dirty-twin sweep finding)
            F.expr(
                "CAST(CASE WHEN coalesce(total_chars, 0) <> 0 THEN"
                " (1000 * (2 * __s1 - (n_docs + 1) * total_chars))"
                " div (n_docs * total_chars) END AS BIGINT)"
            ).alias("gini_permille"),
        )
    )


# --------------------------------------------------------------------------
# z49: cross-source duplication matrix — near-dup pairs (the zz_d02
# prefix-filtered engine, lossless) attributed to ordered source pairs:
# the "which crawls copy which" diagnostic that decides what to
# de-prioritize at ingest. Reuses the exact pair semantics, so the
# oracle nests the shared _HASHED_JACCARD_SQL.
# --------------------------------------------------------------------------
@register(
    "zz_z49_cross_source_dup",
    sql=f"""
    WITH hits AS ({_HASHED_JACCARD_SQL}),
    lab AS (
      SELECT least(da.source, db.source) AS src_a,
             greatest(da.source, db.source) AS src_b
      FROM hits
      JOIN documents da ON hits.doc_a = da.doc_id
      JOIN documents db ON hits.doc_b = db.doc_id
    )
    SELECT src_a, src_b, count(*) AS n_pairs FROM lab GROUP BY 1, 2
    """,
    survey_ref="LLM-pipeline: cross-source near-dup attribution",
    tags=("dedup", "join"),
    bench=True,
)
def z49_cross_source_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_prefix_pairs(docs, num=4, den=5).select(
        "doc_a", "doc_b"
    )
    src = docs.select("doc_id", "source")
    lab = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
    )
    return lab.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# --------------------------------------------------------------------------
# z50: exact correlation components per brand — n, Σx, Σy, Σxy, Σx²,
# Σy², and the covariance numerator n·Σxy − Σx·Σy. corr() built-ins
# drift on FP reduction order; the raw sums are exact and sufficient to
# reconstruct r² downstream. Products of sums pass int64 at sf≥1, so
# they are 128-bit internally and surfaced as DIGIT STRINGS (see z41:
# .df() would degrade DECIMAL(38,0) to float64 at the compare layer).
# --------------------------------------------------------------------------
@register(
    "zz_z50_corr_components",
    sql=f"""
    WITH v AS (
      SELECT p.p_brand,
             CAST(l.l_quantity AS HUGEINT) AS x,
             CAST({_CENTS_SQL.format(col='l.l_extendedprice')} AS HUGEINT)
                 AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT p_brand, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS VARCHAR) AS sum_xy,
           CAST(sum(x * x) AS VARCHAR) AS sum_x2,
           CAST(sum(y * y) AS VARCHAR) AS sum_y2,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS VARCHAR)
               AS cov_num
    FROM v GROUP BY 1
    """,
    survey_ref="SURVEY §2.6: aggregate surface (exact correlation sums)",
    tags=("agg", "stats", "join"),
)
def z50_corr_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    v = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem.l_partkey == part.p_partkey,
    ).select(
        "p_brand",
        F.col("l_quantity").cast("long").alias("x"),
        _cents(F.col("l_extendedprice")).alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = v.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(dec(F.col("x")) * dec(F.col("y")))
        .cast("decimal(38,0)")
        .alias("__xy"),
        F.sum(dec(F.col("x")) * dec(F.col("x")))
        .cast("decimal(38,0)")
        .alias("__x2"),
        F.sum(dec(F.col("y")) * dec(F.col("y")))
        .cast("decimal(38,0)")
        .alias("__y2"),
    )
    return agg.select(
        "p_brand",
        "n",
        "sum_x",
        "sum_y",
        F.col("__xy").cast("string").alias("sum_xy"),
        F.col("__x2").cast("string").alias("sum_x2"),
        F.col("__y2").cast("string").alias("sum_y2"),
        (
            dec(F.col("n")) * F.col("__xy")
            - dec(F.col("sum_x")) * dec(F.col("sum_y"))
        )
        .cast("decimal(38,0)")
        .cast("string")
        .alias("cov_num"),
    )


# --------------------------------------------------------------------------
# z51: canonical first-seen attribution — exact-dup groups (zz_d01's
# normalized-md5 contract) enriched with HOW WIDE each duplicate spreads
# (distinct sources) and WHERE the canonical copy lives: the lineage
# record a dedup pipeline keeps when it drops the non-canonical copies.
# --------------------------------------------------------------------------
@register(
    "zz_z51_canonical_first_seen",
    sql="""
    WITH h AS (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                 AS text_hash,
             doc_id, source
      FROM documents
    ),
    c AS (
      SELECT text_hash, min(doc_id) AS canonical_id,
             count(*) AS n_copies,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM h GROUP BY 1
    )
    SELECT c.text_hash, c.canonical_id, c.n_copies, c.n_sources,
           h.source AS canonical_source
    FROM c JOIN h ON h.doc_id = c.canonical_id
    """,
    survey_ref="LLM-pipeline: dedup lineage (canonical attribution)",
    tags=("dedup", "agg"),
)
def z51_canonical_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    h = docs.select(
        F.md5(normalized_text(F.col("text"))).alias("text_hash"),
        "doc_id",
        "source",
    )
    c = h.groupBy("text_hash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.count_distinct("source").alias("n_sources"),
    )
    return c.join(
        h.select(
            F.col("doc_id").alias("canonical_id"),
            F.col("source").alias("canonical_source"),
        ),
        "canonical_id",
    ).select(
        "text_hash", "canonical_id", "n_copies", "n_sources",
        "canonical_source",
    )


# --------------------------------------------------------------------------
# z52: embedding norm QA per label — catches the classic pipeline
# failures (zero vectors, un-normalized batches, scale drift between
# encoder versions) before they poison ANN recall. Norms as floored
# micro-units: the dot fold is the same sequential order both engines
# use everywhere else in the suite, sqrt is IEEE-correctly-rounded, so
# the integers are engine-identical.
# --------------------------------------------------------------------------
@register(
    "zz_z52_embedding_norm_stats",
    sql=f"""
    WITH v AS (
      SELECT label,
             CAST(floor(1000000 * sqrt(
               {_DOT.format(dim=S.EMB_DIM, a='embedding', b='embedding')}
             )) AS BIGINT) AS nm
      FROM embeddings
      WHERE {emb_finite_sql(S.EMB_DIM)}
    )
    SELECT label, count(*) AS n,
           CAST(min(nm) AS BIGINT) AS min_norm_micros,
           CAST(max(nm) AS BIGINT) AS max_norm_micros,
           CAST(sum(nm) // count(*) AS BIGINT) AS avg_norm_micros
    FROM v GROUP BY 1
    """,
    survey_ref="LLM-pipeline: embedding QA (norm distribution)",
    tags=("similarity", "agg"),
)
def z52_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    # integer-exact norms: null/ragged/non-finite vectors quarantined
    # (the oracle's fixed-64-term dot would NULL on ragged rows while
    # the engine's fold uses the actual length — both sides screen)
    emb = S.valid_embeddings(emb, dim=S.EMB_DIM, finite=True)
    v = emb.select(
        "label",
        F.floor(
            F.lit(1_000_000)
            * F.sqrt(dot(F.col("embedding"), F.col("embedding")))
        )
        .cast("bigint")
        .alias("nm"),
    )
    return v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("nm").alias("min_norm_micros"),
        F.max("nm").alias("max_norm_micros"),
        F.expr("CAST(sum(nm) div count(1) AS BIGINT)").alias(
            "avg_norm_micros"
        ),
    )


# --------------------------------------------------------------------------
# zx entries sort AFTER the z03–z52 recorded window (tail evidence via
# strict-parity, rotating into the window in a future round).
#
# zx1: deterministic weighted sampling — systematic cumulative-stride
# selection (probability ∝ weight, exact int64; the A-ES exponential-
# key scheme needs pow/log whose last-ulp differs between engines).
# Distributed prefix sums via cumulative.ordered_prefix — the same
# machinery as T5's global output index, reused on the curation side.
# --------------------------------------------------------------------------
_WS_STRIDE = 5_000


@register(
    "zx1_weighted_sample",
    sql=f"""
    WITH c AS (
      SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (ORDER BY doc_id ASC
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(cum AS BIGINT) AS cum
    FROM c
    WHERE cum // {_WS_STRIDE} > (cum - n_chars) // {_WS_STRIDE}
    """,
    survey_ref="LLM-pipeline: weighted sampling (systematic, exact)",
    tags=("curation", "sampling"),
)
def zx1_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import systematic_weighted_sample

    (docs,) = load(spark, sf_dir, "documents")
    return systematic_weighted_sample(
        docs.select("doc_id", "source", "n_chars"),
        weight_col="n_chars",
        stride=_WS_STRIDE,
        order_cols=["doc_id"],
    ).select("doc_id", "source", "n_chars", "cum")


# --------------------------------------------------------------------------
# zx2: language-ID confusion matrix — the x03 heuristic evaluated
# against the labeled `lang` column: per (truth, prediction) counts,
# the eval artifact a pipeline publishes when it swaps language models.
# --------------------------------------------------------------------------
from ..operators.textops import sql_lang_pred as _sql_lang_pred

_ZX2_TOKS = (
    "list_distinct(list_filter(string_split_regex(lower(text),"
    " '[^a-z0-9]+'), x -> x <> ''))"
)


@register(
    "zx2_lang_confusion",
    sql=f"""
    WITH p AS (
      SELECT lang, {_sql_lang_pred("td")} AS lang_pred
      FROM (SELECT lang, {_ZX2_TOKS} AS td FROM documents)
    )
    SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY 1, 2
    """,
    survey_ref="LLM-pipeline: language-ID evaluation (confusion matrix)",
    tags=("text", "agg"),
)
def zx2_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textops as T

    (docs,) = load(spark, sf_dir, "documents")
    scores = T.lang_scores(F.col("td"))
    return (
        docs.select(
            "lang", F.array_distinct(T.tokens(F.col("text"))).alias("td")
        )
        .select("lang", T.lang_pred(scores).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# zx3: resample + gap-fill (LOCF) — sparse per-type event series onto a
# dense hourly grid, forward-filling gaps: the hypertable
# time_bucket_gapfill/locf shape. Oracle via DuckDB's native ASOF JOIN
# (latest observation ≤ each grid bucket ≡ the engine's
# last-ignorenulls forward fill).
# --------------------------------------------------------------------------
@register(
    "zx3_resample_gap_fill",
    sql="""
    WITH obs AS (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS bucket,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    spans AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
              FROM obs GROUP BY 1),
    grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS bucket
             FROM spans)
    SELECT g.event_type, g.bucket,
           CAST(o.n_events AS BIGINT) AS n_events,
           o.value_cents,
           (o.bucket = g.bucket) AS observed
    FROM grid g ASOF LEFT JOIN obs o
      ON g.event_type = o.event_type AND g.bucket >= o.bucket
    """,
    survey_ref="SURVEY §2.6: time-series resample + gap-fill (LOCF)",
    tags=("window", "temporal"),
)
def zx3_resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import resample_gap_fill

    (events,) = load(spark, sf_dir, "events")
    # ts IS NOT NULL mirrors the oracle's WHERE and is load-bearing:
    # the former grid-join shape let Catalyst infer isnotnull(bucket)
    # below this aggregate, pruning null-ts rows BEFORE the ANSI money
    # cast; the r12 join-free shape lost that inferred filter, so a
    # null-ts row carrying NaN money crashed the cast where the oracle
    # (which filters first) computes (dirty-sweep catch, r12).
    obs = (
        events.where(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.expr("ts div 3600000000000").alias("bucket"),
            _cents(F.col("value")).alias("c"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("c").alias("value_cents"),
        )
    )
    return resample_gap_fill(
        obs, "event_type", "bucket", ["n_events", "value_cents"]
    )


# --------------------------------------------------------------------------
# zx4: DSIR-style hashed-ngram importance scoring (Xie et al. 2023) —
# data selection for pretraining: score every document by how much its
# hashed-bigram feature distribution looks like a TARGET subset (here
# the lang='en' slice) versus the raw corpus. Linear target-minus-raw
# form in integer ppm (see operators/corpus.hashed_ngram_importance)
# so the score — and hence the induced selection ranking — is
# integer-exact on both engines. (zx-name: sorts after the z03–z52
# driver window this round; rotates in next.)
# --------------------------------------------------------------------------
_ZX_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_ZX_BIGRAMS = "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])"
_ZX_HASH_G = "(('0x' || substr(md5(g), 1, 15))::BIGINT)"


@register(
    "zx4_dsir_importance",
    sql=f"""
    WITH toks AS (SELECT doc_id, lang, {_ZX_TOKS} AS t FROM documents),
    grams AS (
      SELECT doc_id, lang = 'en' AS tgt, {_ZX_HASH_G} % 128 AS bucket
      FROM (SELECT doc_id, lang, unnest({_ZX_BIGRAMS}) AS g FROM toks)
    ),
    dim AS (
      SELECT bucket,
             count(*) * 1000000
               // greatest(1, sum(count(*)) OVER ()) AS s_ppm,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) * 1000000
               // greatest(1, sum(sum(CASE WHEN tgt THEN 1 ELSE 0 END))
                               OVER ()) AS t_ppm
      FROM grams GROUP BY bucket
    ),
    pd AS (SELECT doc_id, bucket, count(*) AS n FROM grams GROUP BY 1, 2)
    SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
           CAST(sum(n * (t_ppm - s_ppm)) AS BIGINT) AS score
    FROM pd JOIN dim USING (bucket) GROUP BY doc_id
    """,
    survey_ref="LLM-pipeline: DSIR hashed-ngram importance (Xie et al. 2023)",
    tags=("text", "curation"),
    bench=True,
)
def zx4_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import hashed_ngram_importance

    (docs,) = load(spark, sf_dir, "documents")
    return hashed_ngram_importance(
        docs, target_filter=F.col("lang") == F.lit("en"), n_buckets=128
    )


# --------------------------------------------------------------------------
# zx5: per-document n-gram novelty — permille of a doc's distinct
# trigrams first seen (min doc_id) in that doc. The ordered-ingestion
# diagnostic: where does an append-ordered corpus stop adding new text?
# --------------------------------------------------------------------------
_ZX_SHINGLES3 = (
    "list_transform(range(1, len(t) - 1),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"
)
_ZX_HASH_S = "(('0x' || substr(md5(s), 1, 15))::BIGINT)"


@register(
    "zx5_ngram_novelty",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_ZX_TOKS} AS t FROM documents),
    sh0 AS (SELECT doc_id, unnest({_ZX_SHINGLES3}) AS s FROM toks),
    hs AS (SELECT DISTINCT doc_id, {_ZX_HASH_S} AS h FROM sh0),
    first AS (SELECT h, min(doc_id) AS first_doc FROM hs GROUP BY h)
    SELECT doc_id,
           count(*) AS n_distinct_grams,
           CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000
                AS BIGINT) // count(*) AS novelty_permille
    FROM hs JOIN first USING (h)
    GROUP BY doc_id
    """,
    survey_ref="LLM-pipeline: n-gram novelty curve (dedup analyses, "
    "Lee et al. 2022)",
    tags=("text", "curation"),
    bench=True,
)
def zx5_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import ngram_novelty

    (docs,) = load(spark, sf_dir, "documents")
    return ngram_novelty(docs, n=3)


# --------------------------------------------------------------------------
# zx6: exact Spearman rank correlation per nation between customer
# balance and order activity — the robust-stats family member z50's
# Pearson components don't cover (rank-based, outlier-immune).
# row_number ranks with the unique custkey tiebreak keep the statistic
# integer-exact; the rho division runs 128-bit (DECIMAL/HUGEINT).
# --------------------------------------------------------------------------
@register(
    "zx6_spearman_by_nation",
    sql=f"""
    WITH oc AS (SELECT o_custkey, count(*) AS n_orders
                FROM orders GROUP BY 1),
    base AS (
      SELECT c_nationkey, c_custkey,
             {_CENTS_SQL.format(col='c_acctbal')} AS bal,
             COALESCE(n_orders, 0) AS n_orders
      FROM customer LEFT JOIN oc ON c_custkey = o_custkey
    ),
    r AS (
      SELECT c_nationkey,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY bal ASC, c_custkey ASC) AS rx,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY n_orders ASC, c_custkey ASC) AS ry
      FROM base
    )
    SELECT c_nationkey, count(*) AS n,
           CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
           CAST(1000000 -
                (6000000 * CAST(sum((rx - ry) * (rx - ry)) AS HUGEINT))
                // (CAST(count(*) AS HUGEINT) * count(*) * count(*)
                    - count(*))
                AS BIGINT) AS rho_ppm
    FROM r GROUP BY 1 HAVING count(*) >= 2
    """,
    survey_ref="SURVEY §2.6: robust statistics (rank correlation)",
    tags=("stats", "agg"),
)
def zx6_spearman_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import spearman_by_group

    customer, orders = load(spark, sf_dir, "customer", "orders")
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    base = (
        customer.join(oc, customer.c_custkey == oc.o_custkey, "left")
        .select(
            "c_nationkey",
            "c_custkey",
            _cents(F.col("c_acctbal")).alias("bal"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )
    return spearman_by_group(
        base, "c_nationkey", "bal", "n_orders", "c_custkey", min_n=2
    )


# --------------------------------------------------------------------------
# zx8: exact per-group OLS trend — the algebraic, oracle-exact twin of
# u01's grouped-map (applyInPandas) linear trend: slope of hourly value
# on time from the closed-form normal equations, every term an integer.
#   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
# x = hour bucket, y = value cents; products run 128-bit (Spark
# DECIMAL(38,0) / DuckDB HUGEINT); the big power sums surface as digit
# STRINGS (z41 convention — pandas degrades DECIMAL(38,0) to float64
# at the compare layer) and the slope itself as integer micro-units
# per hour (small quotient → BIGINT). (zx-name: rotates in next round.)
# --------------------------------------------------------------------------
@register(
    "zx8_linear_trend_exact",
    sql=f"""
    WITH v AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 3600000000000 AS HUGEINT) AS x,
             CAST({_CENTS_SQL.format(col='value')} AS HUGEINT) AS y
      FROM events
    )
    SELECT event_type, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS VARCHAR) AS sum_xy,
           CAST(sum(x * x) AS VARCHAR) AS sum_x2,
           CAST((1000000 * (count(*) * sum(x * y) - sum(x) * sum(y)))
                // (count(*) * sum(x * x) - sum(x) * sum(x))
                AS BIGINT) AS slope_micro_per_hour
    FROM v GROUP BY 1
    """,
    survey_ref="LLM-pipeline / SURVEY §2.6: exact closed-form OLS trend "
    "(algebraic twin of u01's grouped-map)",
    tags=("agg", "stats"),
)
def zx8_linear_trend_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        F.expr("CAST(ts div 3600000000000 AS DECIMAL(38,0))").alias("x"),
        _cents(F.col("value")).cast("decimal(38,0)").alias("y"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.sum(F.col("x") * F.col("y"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("sum_xy"),
        F.sum(F.col("x") * F.col("x"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("sum_x2"),
        F.expr(
            "CAST((1000000 * (count(1) * sum(x * y) - sum(x) * sum(y)))"
            " div (count(1) * sum(x * x) - sum(x) * sum(x)) AS BIGINT)"
        ).alias("slope_micro_per_hour"),
    )
