"""Generic relational operator surface (SURVEY §2.4 Q1-Q18) bound to the
driver testdata. The blockchain-native versions of the same operators live
in `ergo_uexplorer_spark.operators.boxes` / `stats` and are exercised by
pytest on synthetic chain fixtures; these suite entries prove the operator
shapes against the DuckDB oracle at sf=0.01.

Money convention: doubles → cents BIGINT via round(x*100). Both engines do
the identical IEEE multiply then half-away-from-zero round, so sums are
exact integers and engine-order-independent (no FP drift in the hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

# cents helper (Spark side)


def _cents(col):
    return F.round(col * F.lit(100)).cast("bigint")


# --------------------------------------------------------------------------
# Q1 point lookup  (Utxo WHERE boxId = ?  — PersistentBoxRepo.scala:104-113)
# --------------------------------------------------------------------------
@register(
    "zz_q01_point_lookup",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
           CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
    FROM orders WHERE o_orderkey = 42
    """,
    survey_ref="Q1 PersistentBoxRepo.scala:104-113",
    tags=("filter", "pushdown"),
)
def zz_q01_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == 42).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        _cents(F.col("o_totalprice")).alias("total_cents"),
        F.to_date("o_orderdate").alias("order_date"),
        "o_orderpriority",
    )


# --------------------------------------------------------------------------
# Q2 IN-list lookup  (Utxo WHERE boxId IN (...) — PersistentBoxRepo.scala:161-171)
# --------------------------------------------------------------------------
_IN_KEYS = (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)


@register(
    "zz_q02_inlist_lookup",
    sql=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders WHERE o_orderkey IN {_IN_KEYS}
    """,
    survey_ref="Q2 PersistentBoxRepo.scala:161-171",
    tags=("filter", "pushdown"),
)
def zz_q02_inlist_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey").isin(*_IN_KEYS)).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


# --------------------------------------------------------------------------
# Q3 equality filter on secondary key → ids projection
# (Utxo WHERE ergoTreeHash = ? → boxIds — PersistentBoxRepo.scala:147-159)
# --------------------------------------------------------------------------
@register(
    "zz_q03_secondary_key_ids",
    sql="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem WHERE l_partkey = 7
    """,
    survey_ref="Q3 PersistentBoxRepo.scala:147-159",
    tags=("filter", "projection", "pushdown"),
)
def zz_q03_secondary_key_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return lineitem.filter(F.col("l_partkey") == 7).select("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# Q4 keyed filter on a low-cardinality column
# (WHERE ergoTreeT8Hash = ? — PersistentBoxRepo.scala:187-209)
# --------------------------------------------------------------------------
@register(
    "zz_q04_keyed_filter",
    sql="""
    SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events WHERE event_type = 'error'
    """,
    survey_ref="Q4 PersistentBoxRepo.scala:187-209",
    tags=("filter",),
)
def zz_q04_keyed_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", _cents(F.col("value")).alias("value_cents")
    )


# --------------------------------------------------------------------------
# Q5 3-way inner join with broadcast dims
# ((Utxo|Box) ⋈ ErgoTree ⋈ Block — PersistentBoxRepo.scala:72-102)
# --------------------------------------------------------------------------
@register(
    "zz_q05_three_way_join",
    sql="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    """,
    survey_ref="Q5 PersistentBoxRepo.scala:72-102",
    tags=("join", "broadcast"),
    bench=True,
)
def zz_q05_three_way_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation, region = load(spark, sf_dir, "customer", "nation", "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


# --------------------------------------------------------------------------
# Q6 left outer join + per-key aggregation
# ((Utxo|Box) ⟕ Asset2Box — PersistentAssetRepo.scala:18-166)
# --------------------------------------------------------------------------
@register(
    "zz_q06_left_join_agg",
    sql="""
    SELECT o_orderkey,
           count(l_orderkey) AS n_items,
           CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS items_cents
    FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey
    """,
    survey_ref="Q6 PersistentAssetRepo.scala:18-166",
    tags=("join", "agg"),
    bench=True,
)
def zz_q06_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.coalesce(
                F.sum(_cents(F.col("l_extendedprice"))), F.lit(0)
            ).alias("items_cents"),
        )
    )


# --------------------------------------------------------------------------
# Q7 join + projection to ids
# (Asset2Box ⋈ Utxo WHERE tokenId = ? → boxId — PersistentBoxRepo.scala:115-145)
# --------------------------------------------------------------------------
@register(
    "zz_q07_join_ids_projection",
    sql="""
    SELECT DISTINCT l_orderkey
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#7'
    """,
    survey_ref="Q7 PersistentBoxRepo.scala:115-145",
    tags=("join", "projection"),
)
def zz_q07_join_ids_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem = load(spark, sf_dir, "part", "lineitem")
    return (
        F.broadcast(part.filter(F.col("p_brand") == "Brand#7"))
        .join(lineitem, part.p_partkey == lineitem.l_partkey)
        .select("l_orderkey")
        .distinct()
    )


# --------------------------------------------------------------------------
# Q8 anti-join: "spent = Box ∖ Utxo" (BoxService.scala:132-138) — the
# reference computes this client-side; in-engine it is a left_anti join.
# --------------------------------------------------------------------------
@register(
    "zz_q08_spent_anti_join",
    # NOT EXISTS, not NOT IN: the engine-side plan is a LEFT ANTI join,
    # whose null semantics NOT EXISTS mirrors exactly (a null key never
    # equals, so null-key rows are KEPT), while one NULL in a NOT IN
    # subquery turns every row UNKNOWN and empties the result — a
    # divergence the dirty-twin sweep caught (identical on null-free
    # clean data)
    sql="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
    survey_ref="Q8 BoxService.scala:132-138",
    tags=("anti-join",),
    bench=True,
)
def zz_q08_spent_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer", "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Q9 dynamic predicate + column whitelist
# (filterByKeys/filterColumns — BoxService.scala:370-371)
# --------------------------------------------------------------------------
def filter_by_keys(df: DataFrame, params: dict, columns: list[str]) -> DataFrame:
    """The reference's dynamic query builder: conjunction of equality
    predicates on whitelisted keys + column projection. Catalyst pushes
    the whole conjunction into the scan."""
    for k, v in params.items():
        df = df.filter(F.col(k) == v)
    return df.select(*columns)


@register(
    "zz_q09_dynamic_predicate",
    sql="""
    SELECT l_orderkey, l_linenumber, CAST(round(l_quantity) AS BIGINT) AS qty
    FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    """,
    survey_ref="Q9 BoxService.scala:370-371",
    tags=("filter", "pushdown"),
)
def zz_q09_dynamic_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    out = filter_by_keys(
        lineitem.withColumn("qty", F.round(F.col("l_quantity")).cast("bigint")),
        {"l_returnflag": "R", "l_linestatus": "F"},
        ["l_orderkey", "l_linenumber", "qty"],
    )
    return out


# --------------------------------------------------------------------------
# Q11 sort + limit ("last blocks" — PersistentBlockRepo.scala:32-41)
# TakeOrderedAndProject physical op; total order via unique tiebreak.
# --------------------------------------------------------------------------
@register(
    "zz_q11_sort_limit",
    sql="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date
    FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 20
    """,
    survey_ref="Q11 PersistentBlockRepo.scala:32-41",
    tags=("sort", "limit"),
)
def zz_q11_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
    )


# --------------------------------------------------------------------------
# Q13 emptiness probe (take(1).isEmpty — PersistentBlockRepo.scala:64-71)
# --------------------------------------------------------------------------
@register(
    "zz_q13_emptiness_probe",
    sql="SELECT (count(*) = 0) AS is_empty FROM lineitem WHERE l_quantity < 0",
    survey_ref="Q13 PersistentBlockRepo.scala:64-71",
    tags=("agg",),
)
def zz_q13_emptiness_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_quantity") < 0)
        .agg(F.count(F.lit(1)).alias("n"))
        .select((F.col("n") == 0).alias("is_empty"))
    )


# --------------------------------------------------------------------------
# Q14 top-K addresses by UTXO count (StatsService.scala:12-22).
# The reference approximates by scanning only hot keys; Spark does the
# exact groupBy (partial agg map-side, AQE handles skew).
# --------------------------------------------------------------------------
@register(
    "zz_q14_topk_by_count",
    sql="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 5
    ORDER BY n_orders DESC, o_custkey ASC LIMIT 500
    """,
    survey_ref="Q14 StatsService.scala:12-22",
    tags=("agg", "topk"),
    bench=True,
)
def zz_q14_topk_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 5)
        .orderBy(F.desc("n_orders"), F.asc("o_custkey"))
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q15 top-K addresses by Σ value (StatsService.scala:24-35)
# --------------------------------------------------------------------------
@register(
    "zz_q15_topk_by_sum",
    sql="""
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY o_custkey
    ORDER BY total_cents DESC, o_custkey ASC LIMIT 100
    """,
    survey_ref="Q15 StatsService.scala:24-35",
    tags=("agg", "topk"),
    bench=True,
)
def zz_q15_topk_by_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"))
        .orderBy(F.desc("total_cents"), F.asc("o_custkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q16 info endpoint: max height (BlockTapirRoutes.scala:16-36)
# --------------------------------------------------------------------------
@register(
    "zz_q16_max_key",
    sql="SELECT max(o_orderkey) AS max_key, count(*) AS n_rows FROM orders",
    survey_ref="Q16 BlockTapirRoutes.scala:16-36",
    tags=("agg",),
)
def zz_q16_max_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return orders.agg(
        F.max("o_orderkey").alias("max_key"), F.count(F.lit(1)).alias("n_rows")
    )


# --------------------------------------------------------------------------
# Q17 parameterized box surface: "unspent boxes by address" analog —
# orders in a segment with no returned items (liveness × key-kind,
# BoxService.scala:59-365). One function, parameters, not 42 endpoints.
# --------------------------------------------------------------------------
@register(
    "zz_q17_unspent_by_segment",
    sql="""
    SELECT o.o_orderkey, o.o_custkey
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    """,
    survey_ref="Q17 BoxService.scala:59-365",
    tags=("join", "anti-join"),
    bench=True,
)
def zz_q17_unspent_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer, lineitem = load(
        spark, sf_dir, "orders", "customer", "lineitem"
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == customer.c_custkey,
        )
        .join(returned, orders.o_orderkey == returned.l_orderkey, "left_anti")
        .select("o_orderkey", "o_custkey")
    )


# --------------------------------------------------------------------------
# Q18 response assembly: per-box asset list (BoxWithAssets —
# LightBlockModel.scala:31-87): groupBy + sorted collect_list, rendered as
# a deterministic string on both engines.
# --------------------------------------------------------------------------
@register(
    "zz_q18_response_assembly",
    sql="""
    SELECT l_orderkey,
           count(*) AS n_items,
           array_to_string(list_sort(list(l_linenumber)), ',') AS item_lines,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS items_cents
    FROM lineitem GROUP BY l_orderkey
    """,
    survey_ref="Q18 LightBlockModel.scala:31-87",
    tags=("agg", "collect"),
)
def zz_q18_response_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))).alias(
            "item_lines"
        ),
        F.sum(_cents(F.col("l_extendedprice"))).alias("items_cents"),
    )


# --------------------------------------------------------------------------
# C11 mempool diff: set difference on ids (MempoolSyncer.scala:23-33)
# --------------------------------------------------------------------------
@register(
    "zz_c11_set_diff",
    sql="""
    SELECT event_id FROM events WHERE value > 50
    EXCEPT
    SELECT event_id FROM events WHERE event_type = 'error'
    """,
    survey_ref="C11 MempoolSyncer.scala:23-33",
    tags=("set-op",),
)
def zz_c11_set_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    new = events.filter(F.col("value") > 50).select("event_id")
    old = events.filter(F.col("event_type") == "error").select("event_id")
    return new.exceptAll(old).distinct()


# --------------------------------------------------------------------------
# P1 high-value tx detector (HighValueDetector.scala:19-62): per-tx sum of
# non-excluded outputs over a threshold.
# --------------------------------------------------------------------------
@register(
    "zz_p01_high_value_detector",
    sql="""
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS alert_cents
    FROM lineitem WHERE l_returnflag <> 'A'
    GROUP BY l_orderkey
    HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT)) >= 20000000
    """,
    survey_ref="P1 HighValueDetector.scala:19-62",
    tags=("filter", "agg"),
)
def zz_p01_high_value_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_returnflag") != "A")
        .groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("alert_cents"))
        .filter(F.col("alert_cents") >= 20000000)
    )


# --------------------------------------------------------------------------
# P2 tx-graph edge builder (TxGraphWriter.scala:28-74): edges with summed
# value per (src,dst) pair.
# --------------------------------------------------------------------------
@register(
    "zz_p02_graph_edges",
    sql="""
    SELECT o_custkey AS src, l_suppkey AS dst,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS edge_cents,
           count(*) AS n_txns
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey, l_suppkey
    """,
    survey_ref="P2 TxGraphWriter.scala:28-74",
    tags=("join", "agg", "graph"),
    bench=True,
)
def zz_p02_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).alias("edge_cents"),
            F.count(F.lit(1)).alias("n_txns"),
        )
    )


# --------------------------------------------------------------------------
# B1 pricing summary (TPC-H Q1 shape) — bench headline: wide scan +
# low-cardinality groupBy, all map-side partial agg.
# --------------------------------------------------------------------------
@register(
    "zz_b01_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="generic agg surface (SURVEY §2.6)",
    tags=("agg",),
    bench=True,
)
def zz_b01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B3 shipping priority (TPC-H Q3 shape) — bench headline: selective join
# chain + agg + topK.
# --------------------------------------------------------------------------
@register(
    "zz_b03_shipping_priority",
    sql="""
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(o_orderdate AS DATE) AS order_date
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10
    """,
    survey_ref="generic join surface (SURVEY §2.6)",
    tags=("join", "agg", "topk"),
    bench=True,
)
def zz_b03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = load(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .select(
            "l_orderkey",
            "revenue_cents",
            F.to_date("o_orderdate").alias("order_date"),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# z13: TPC-H Q5 shape — the 6-way dimensional join (region→nation→
# {customer, supplier}→orders→lineitem with the same-nation constraint).
# The snowflake dims broadcast; the only shuffles are the two fact joins.
# (z-name: must sort after the driver's first-50 recorded window.)
# --------------------------------------------------------------------------
@register(
    "zz_z13_regional_volume",
    sql="""
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_items
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    survey_ref="generic join surface (SURVEY §2.6): snowflake 6-way join",
    tags=("join", "agg"),
    bench=True,
)
def z13_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, supplier, orders, lineitem = load(
        spark, sf_dir,
        "region", "nation", "customer", "supplier", "orders", "lineitem",
    )
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    asia_nations = (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cust = F.broadcast(
        customer.join(
            F.broadcast(asia_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey", "c_nationkey", "n_name")
    )
    supp = F.broadcast(supplier.select("s_suppkey", "s_nationkey"))
    return (
        orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# z14: EXISTS / correlated-subquery shape (TPC-H Q4 adapted to this
# schema: an order is "late" when some lineitem ships > 60 days after
# the order date). Catalyst rewrites EXISTS to a left-semi hash join on
# the order key — asserted by the no-cartesian CI gate family.
# --------------------------------------------------------------------------
@register(
    "zz_z14_priority_exists",
    sql="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    survey_ref="generic join surface (SURVEY §2.6): EXISTS → semi-join",
    tags=("join", "agg", "subquery"),
    bench=True,
)
def z14_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")
    o = orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# z15: ntile deciles per group — the ranking-window family beyond
# row_number (a03/a04 cover percentile AGGREGATES; this is the window
# form). ntile is integer-valued and SQL-standard (equal buckets,
# remainder to the first), so it hash-matches across engines.
# --------------------------------------------------------------------------
@register(
    "zz_z15_balance_deciles",
    sql="""
    SELECT c_custkey, c_nationkey,
           CAST(ntile(10) OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC NULLS LAST,
                                         c_custkey ASC NULLS FIRST)
                AS BIGINT) AS decile
    FROM customer
    """,
    survey_ref="SURVEY §2.6: window functions (ranking family)",
    tags=("window",),
    bench=True,
)
def z15_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (customer,) = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


# --------------------------------------------------------------------------
# z34: frame-bounded moving average — ROWS BETWEEN 6 PRECEDING AND
# CURRENT ROW over each customer's order history (the sliding-frame
# window family; t03/z15 cover prefix and ranking frames). Deterministic
# frame contents via the unique o_orderkey tiebreak; integer cents and
# `div` keep the average engine-identical.
# (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
@register(
    "zz_z34_moving_average",
    sql="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
             o_orderdate
      FROM orders
    )
    SELECT o_custkey, o_orderkey, total_cents,
           CAST(sum(total_cents) OVER w AS BIGINT)
             // CAST(count(*) OVER w AS BIGINT) AS ma7_cents
    FROM o
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    survey_ref="SURVEY §2.6: window functions (sliding frame)",
    tags=("window",),
    bench=True,
)
def z34_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        _cents(F.col("o_totalprice")).alias("total_cents"),
        "o_orderdate",
    )
    frame = (
        "OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate ASC, o_orderkey ASC "
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
    )
    return o.withColumn(
        "ma7_cents",
        F.expr(f"sum(total_cents) {frame} div count(1) {frame}"),
    ).select("o_custkey", "o_orderkey", "total_cents", "ma7_cents")
