"""Round-7 surface additions, batch 3 (zyb1–zyb5): cross-source
quantile normalization, cohort decile-drift matrices, exact weighted
medians, Tukey-fence (IQR) outlier summaries, and A/B contingency
tables with chi-square sufficient statistics.

Names sort right after zya9 and before the `zz_` tail — all five land
inside the driver's recorded 50-name window this round (displacing only
already-recorded `zz_` entries).

The scalable-rank machinery is the point of this batch: every
rank/quantile below goes through `ordered_prefix` /
`coarse_partition_rank` (range-partitioned global row numbers, few-huge-
partition ranks by offset subtraction) or a value-HISTOGRAM reduction —
never an unpartitioned `Window.orderBy` and never a window partitioned
by a 2–5 value key over raw rows, the two canonical single-task stages
at 100 TB. Exactness rules as usual: integer cents, `div` on
non-negatives, DECIMAL(38,0)/HUGEINT digit strings for 128-bit
products."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import load, register

_CENTS_SQL = "CAST(round({col} * 100) AS BIGINT)"


def _cents(col):
    return F.round(col * F.lit(100)).cast("bigint")


# --------------------------------------------------------------------------
# zyb1: quantile normalization — each doc's length score re-expressed as
# the GLOBAL value at its within-source quantile position (exact integer
# ranks; the corpus-mixing normalizer for per-source scores on
# incomparable scales).
# --------------------------------------------------------------------------
@register(
    "zyb1_quantile_norm",
    sql="""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents
               WHERE source IS NOT NULL AND n_chars IS NOT NULL),
    g AS (
      SELECT n_chars AS v,
             row_number() OVER (ORDER BY n_chars ASC NULLS FIRST,
                                doc_id ASC NULLS FIRST) AS gix
      FROM d
    ),
    ns AS (SELECT source, count(*) AS ns FROM d GROUP BY 1),
    ng AS (SELECT count(*) AS ng FROM d),
    r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars ASC NULLS FIRST,
                                         doc_id ASC NULLS FIRST) AS rs
      FROM d
    )
    SELECT r.doc_id, r.source, r.n_chars, g.v AS norm_val
    FROM r JOIN ns ON r.source IS NOT DISTINCT FROM ns.source CROSS JOIN ng
    JOIN g ON g.gix = (r.rs * ng.ng + ns.ns - 1) // ns.ns
    """,
    survey_ref="LLM-pipeline: cross-source score normalization "
    "(rank→global-quantile map, curation.quantile_normalize)",
    tags=("curation", "window"),
)
def zyb1_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import quantile_normalize

    (docs,) = load(spark, sf_dir, "documents")
    return quantile_normalize(
        docs.select("doc_id", "source", "n_chars"),
        "source",
        "n_chars",
        "doc_id",
    )


# --------------------------------------------------------------------------
# zyb2: decile-drift matrix — each customer's order-value decile in the
# early period vs the late period (cutoff = the data midpoint), as a transition matrix. The cohort-
# drift artifact (are heavy users staying heavy?). Deciles are exact
# rank formulas over `coarse_partition_rank`, not ntile-over-two-
# partition windows.
# --------------------------------------------------------------------------
@register(
    "zyb2_decile_drift",
    sql=f"""
    WITH t AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < DATE '1998-07-01'
                  THEN 'p1' ELSE 'p2' END AS period,
             sum({_CENTS_SQL.format(col='o_totalprice')}) AS cents
      FROM orders GROUP BY 1, 2
    ),
    r AS (
      SELECT o_custkey, period,
             row_number() OVER (PARTITION BY period
                                ORDER BY cents ASC, o_custkey ASC) AS rs,
             count(*) OVER (PARTITION BY period) AS ns
      FROM t
    ),
    d AS (
      SELECT o_custkey, period,
             CAST((rs - 1) * 10 // ns + 1 AS BIGINT) AS dec
      FROM r
    )
    SELECT a.dec AS dec_p1, b.dec AS dec_p2, count(*) AS n_custs
    FROM d a JOIN d b ON a.o_custkey = b.o_custkey
    WHERE a.period = 'p1' AND b.period = 'p2'
    GROUP BY 1, 2
    """,
    survey_ref="SURVEY §2.6 cohort family (z28 retention → value-decile "
    "drift; scalable ranks via coarse_partition_rank)",
    tags=("window", "agg"),
)
def zyb2_decile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cumulative import coarse_partition_rank

    (orders,) = load(spark, sf_dir, "orders")
    t = (
        orders.select(
            "o_custkey",
            F.when(
                F.col("o_orderdate") < F.lit("1998-07-01").cast("date"),
                F.lit("p1"),
            )
            .otherwise(F.lit("p2"))
            .alias("period"),
            _cents(F.col("o_totalprice")).alias("c"),
        )
        .groupBy("o_custkey", "period")
        .agg(F.sum("c").alias("cents"))
    )
    r = coarse_partition_rank(t, "period", ["cents", "o_custkey"], "__rs")
    ns = t.groupBy("period").agg(F.count(F.lit(1)).alias("__ns"))
    d = r.join(F.broadcast(ns), "period").select(
        "o_custkey",
        "period",
        F.expr("(__rs - 1) * 10 div __ns + 1").cast("long").alias("dec"),
    )
    # (o_custkey, period) is unique after the aggregate, so the former
    # p1⋈p2 self-join (which re-evaluated the whole rank DAG per side)
    # collapses to one per-customer pivot pass; inner-join semantics =
    # keep customers present in BOTH periods.
    return (
        d.groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("period") == "p1", F.col("dec"))).alias(
                "dec_p1"
            ),
            F.max(F.when(F.col("period") == "p2", F.col("dec"))).alias(
                "dec_p2"
            ),
        )
        .filter(F.col("dec_p1").isNotNull() & F.col("dec_p2").isNotNull())
        .groupBy("dec_p1", "dec_p2")
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )


# --------------------------------------------------------------------------
# zyb3: exact weighted median — quantity-weighted median line price per
# return flag, via the value-histogram reduction (the window runs over
# distinct cents values, never raw rows).
# --------------------------------------------------------------------------
@register(
    "zyb3_weighted_median",
    sql=f"""
    WITH h AS (
      SELECT l_returnflag,
             {_CENTS_SQL.format(col='l_extendedprice')} AS v,
             sum(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, v, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY v ASC
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM h
    )
    SELECT l_returnflag,
           CAST(max(tw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
             AS wmedian
    FROM c GROUP BY 1
    """,
    survey_ref="a04 family extension: weighted median (histogram "
    "reduction; stats.weighted_median_by_group)",
    tags=("agg", "percentile"),
)
def zyb3_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import weighted_median_by_group

    (lineitem,) = load(spark, sf_dir, "lineitem")
    li = lineitem.select(
        "l_returnflag",
        _cents(F.col("l_extendedprice")).alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    return weighted_median_by_group(li, "l_returnflag", "v", "w").select(
        "l_returnflag", "total_weight", F.col("wmedian").cast("long")
    )


# --------------------------------------------------------------------------
# zyb4: Tukey-fence outlier summary — rank-based quartiles (type-1, no
# interpolation) and 1.5·IQR tail counts per source, all derived from
# one value histogram (the raw rows are scanned once).
# --------------------------------------------------------------------------
@register(
    "zyb4_iqr_fences",
    sql="""
    WITH h AS (
      -- NULL values excluded: quantiles are over OBSERVED values (and
      -- NULLs in the cum window would hit the Spark-NULLS-FIRST vs
      -- DuckDB-NULLS-LAST ordering split — r12 dirty-menu catch)
      SELECT source, n_chars AS v, count(*) AS c
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
    ),
    cc AS (
      SELECT source, v, c,
             sum(c) OVER (PARTITION BY source ORDER BY v ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY source) AS n
      FROM h
    ),
    q AS (
      SELECT source, max(n) AS n,
             min(CASE WHEN cum * 4 >= n THEN v END) AS q1,
             min(CASE WHEN cum * 4 >= 3 * n THEN v END) AS q3
      FROM cc GROUP BY 1
    )
    SELECT q.source, CAST(q.n AS BIGINT) AS n,
           CAST(q.q1 AS BIGINT) AS q1, CAST(q.q3 AS BIGINT) AS q3,
           CAST(sum(CASE WHEN cc.v * 2 < q.q1 * 2 - (q.q3 - q.q1) * 3
                         THEN cc.c ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN cc.v * 2 > q.q3 * 2 + (q.q3 - q.q1) * 3
                         THEN cc.c ELSE 0 END) AS BIGINT) AS n_high
    FROM q JOIN cc ON q.source = cc.source
    GROUP BY 1, 2, 3, 4
    """,
    survey_ref="z29/z39 family: rank-based IQR fences from one "
    "histogram (stats.iqr_outlier_summary)",
    tags=("quality", "percentile"),
)
def zyb4_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import iqr_outlier_summary

    (docs,) = load(spark, sf_dir, "documents")
    return iqr_outlier_summary(
        docs.select("source", "n_chars"), "source", "n_chars"
    )


# --------------------------------------------------------------------------
# zyb5: A/B contingency with chi-square sufficient statistics — variant
# (JSON prop parity) × outcome observed counts, marginals, and the
# exact expected-count numerators as digit strings. Floats appear only
# in the caller's final χ² division.
# --------------------------------------------------------------------------
@register(
    "zyb5_ab_contingency",
    sql="""
    WITH t AS (
      SELECT CASE WHEN CAST(CASE WHEN json_valid(props)
                            THEN props->>'$.k' END AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant,
             event_type AS outcome
      FROM events
      WHERE CAST(CASE WHEN json_valid(props)
                 THEN props->>'$.k' END AS BIGINT) IS NOT NULL
    ),
    o AS (SELECT variant, outcome, count(*) AS obs FROM t GROUP BY 1, 2)
    SELECT variant, outcome, CAST(obs AS BIGINT) AS obs,
           CAST(sum(obs) OVER (PARTITION BY variant) AS BIGINT)
             AS row_total,
           CAST(sum(obs) OVER (PARTITION BY outcome) AS BIGINT)
             AS col_total,
           CAST(CAST(sum(obs) OVER (PARTITION BY variant) AS HUGEINT)
                * CAST(sum(obs) OVER (PARTITION BY outcome) AS HUGEINT)
                AS VARCHAR) AS exp_num
    FROM o
    """,
    survey_ref="LLM-pipeline: experiment analysis (contingency + exact "
    "chi-square sufficient stats; stats.contingency_with_expected)",
    tags=("agg", "json"),
)
def zyb5_ab_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import contingency_with_expected

    (events,) = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    t = events.select(
        F.when(k % 2 == 0, F.lit("A")).otherwise(F.lit("B")).alias("variant"),
        F.col("event_type").alias("outcome"),
    ).filter(k.isNotNull())
    out = contingency_with_expected(t, "variant", "outcome")
    return out.select(
        "variant",
        "outcome",
        "obs",
        "row_total",
        "col_total",
        F.col("exp_num").cast("string").alias("exp_num"),
    )
