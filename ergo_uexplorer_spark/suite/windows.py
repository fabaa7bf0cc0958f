"""Window / sequencing / chain-audit operator surface (SURVEY §2.2 T3-T5,
§2.3 C6-C7) bound to the driver testdata."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cumulative import global_sequence, running_totals
from .base import load, register


def _cents(col):
    return F.round(col * F.lit(100)).cast("bigint")


# --------------------------------------------------------------------------
# T3 cumulative chain stats (BlockBuilder.scala:49-63): running totals over
# a total order, distributed by partition key (per-customer here, per-chain
# in the blockchain tables).
# --------------------------------------------------------------------------
@register(
    "zz_t03_running_totals",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS running_cents
    FROM orders
    """,
    survey_ref="T3 BlockBuilder.scala:49-63",
    tags=("window",),
    bench=True,
)
def zz_t03_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    df = orders.withColumn("__cents", _cents(F.col("o_totalprice")))
    out = running_totals(
        df,
        partition_cols=["o_custkey"],
        order_cols=["o_orderdate", "o_orderkey"],
        sums={"running_cents": F.col("__cents")},
    )
    return out.select("o_orderkey", "o_custkey", "running_cents")


# --------------------------------------------------------------------------
# T4 coinbase flag: last element per group (FullBlockBuilder.scala:86-88)
# --------------------------------------------------------------------------
@register(
    "zz_t04_last_in_group",
    sql="""
    SELECT l_orderkey, l_linenumber
    FROM (
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    survey_ref="T4 FullBlockBuilder.scala:86-88",
    tags=("window",),
)
def zz_t04_last_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_linenumber"))
    return (
        lineitem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# T5 global output index (FullBlockBuilder.scala:116-144): global sequence
# over a total order WITHOUT a single-task window — see
# operators/cumulative.global_sequence.
# --------------------------------------------------------------------------
@register(
    "zz_t05_global_index",
    sql="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderdate NULLS FIRST,
                              o_orderkey NULLS FIRST) AS gix
    FROM orders
    """,
    survey_ref="T5 FullBlockBuilder.scala:116-144",
    tags=("window", "scale"),
    bench=True,
)
def zz_t05_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    out = global_sequence(
        orders, order_cols=["o_orderdate", "o_orderkey"], out_col="gix"
    )
    return out.select("o_orderkey", F.col("gix").cast("long").alias("gix"))


# --------------------------------------------------------------------------
# C6 fork detection: >1 block id registered at one height
# (MvStorage.scala:231-251)
# --------------------------------------------------------------------------
@register(
    "zz_c06_fork_detect",
    sql="""
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date, count(*) AS n_at_height
    FROM orders
    GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    HAVING count(*) > 1
    """,
    survey_ref="C6 MvStorage.scala:231-251",
    tags=("agg",),
)
def zz_c06_fork_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_custkey", F.to_date("o_orderdate").alias("order_date")
        )
        .agg(F.count(F.lit(1)).alias("n_at_height"))
        .filter(F.col("n_at_height") > 1)
    )


# --------------------------------------------------------------------------
# C7 missing-height audit (MvStorage.scala:284-290): full range ∖ stored —
# sequence + explode + left_anti.
# --------------------------------------------------------------------------
@register(
    "zz_c07_missing_keys",
    # NOT EXISTS mirrors left_anti's null semantics (see zz_q08): one
    # NULL l_orderkey in the subquery empties the NOT IN form entirely
    sql="""
    SELECT s.k AS missing_key
    FROM (SELECT unnest(range(0, (SELECT max(o_orderkey) + 1 FROM orders))) AS k) s
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = s.k)
    """,
    survey_ref="C7 MvStorage.scala:284-290",
    tags=("anti-join", "generator"),
)
def zz_c07_missing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    max_key = orders.agg(F.max("o_orderkey").alias("m"))
    # distributed range: spark.range would need the value driver-side;
    # sequence+explode keeps it in-plan (fine for height-scale ranges; for
    # huge ranges use spark.range(N) after a scalar collect)
    full = (
        max_key.select(
            F.explode(F.sequence(F.lit(0), F.col("m"))).alias("missing_key")
        )
        .repartition(8)
    )
    return full.join(
        lineitem.select(F.col("l_orderkey").alias("missing_key")).distinct(),
        "missing_key",
        "left_anti",
    )
