"""Transaction-graph construction (SURVEY §2.5 P2, Q19;
TxGraphWriter.scala:28-74).

Vertices are transactions and addresses (tree hashes); edges carry summed
ERG per (tx, address) pair, in both directions. The reference filters
dust (< 1 ERG) and blacklisted protocol addresses before writing to
JanusGraph; the Spark tables are GraphFrames-compatible (`vertices(id,
kind)`, `edges(src, dst, value)`), and traversals are iterative joins
(`two_hop_neighbors`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import EMISSION_TREE, FEE_TREE

NANO = 1_000_000_000
DUST_THRESHOLD = NANO  # skip < 1 ERG edges (TxGraphWriter.scala:44)
PROTOCOL_TREES = (FEE_TREE, EMISSION_TREE)


def graph_edges(
    boxes_main: DataFrame, inputs_main: DataFrame
) -> DataFrame:
    """Edges: address →(value)→ tx for inputs, tx →(value)→ address for
    outputs. Input values/trees come from joining inputs to the boxes
    they spend (the reference reads them from the UTXO cache)."""
    spent = inputs_main.select("tx_id", "box_id").join(
        boxes_main.select(
            "box_id",
            F.col("ergo_tree").alias("tree"),
            F.col("ergo_tree_hash").alias("tree_hash"),
            "value",
        ),
        "box_id",
    )
    from_edges = (
        spent.filter(~F.col("tree").isin(*PROTOCOL_TREES))
        .groupBy("tx_id", "tree_hash")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") >= DUST_THRESHOLD)
        .select(
            F.col("tree_hash").alias("src"),
            F.col("tx_id").alias("dst"),
            "value",
            F.lit("in").alias("direction"),
        )
    )
    to_edges = (
        boxes_main.filter(~F.col("ergo_tree").isin(*PROTOCOL_TREES))
        .groupBy("tx_id", "ergo_tree_hash")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") >= DUST_THRESHOLD)
        .select(
            F.col("tx_id").alias("src"),
            F.col("ergo_tree_hash").alias("dst"),
            "value",
            F.lit("out").alias("direction"),
        )
    )
    return from_edges.unionByName(to_edges)


def graph_vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def k_hop_neighbors(
    edges: DataFrame,
    start_ids: list,
    k: int,
    directed: bool = True,
) -> DataFrame:
    """General bounded traversal (the Gremlin `repeat(out()).times(k)`
    family behind Q19's endpoint — StreamExecutor.scala:37-41): BFS
    min-hop labels from `start_ids` out to `k` hops.

    Distributed shape: the driver loop runs exactly `k` times (O(k),
    never O(data)); each level is one hash equi-join frontier⋈edges on
    `src` plus one anti-join against the visited set — no collect, no
    cartesian. Frontiers are persisted so level n doesn't recompute the
    whole prefix; at cluster scale pre-partition `edges` by `src` so
    every level reuses the same shuffle-free join layout. Returns
    (id, hops) with hops = BFS level = minimum hop distance."""
    spark = edges.sparkSession
    from pyspark.sql import types as T

    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    schema = T.StructType(
        [
            T.StructField("id", edges.schema["src"].dataType),
            T.StructField("hops", T.IntegerType()),
        ]
    )
    visited = spark.createDataFrame([(s, 0) for s in start_ids], schema)
    frontier = visited.persist()
    for level in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier.id == e.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("hops", F.lit(level))
            .persist()
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def co_spend_pairs(edges: DataFrame) -> DataFrame:
    """Wedge motif a→tx←b: pairs of addresses funding the SAME
    transaction (the tx-graph co-spend heuristic used for wallet
    clustering). Bucketed self-join on the shared tx id — candidate
    volume is Σ|inputs per tx|², never an all-pairs product. Returns
    (addr_a, addr_b, n_txs) with addr_a < addr_b."""
    ins = edges.filter(F.col("direction") == "in").select(
        F.col("src").alias("addr"), F.col("dst").alias("tx_id")
    )
    a, b = ins.alias("a"), ins.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tx_id") == F.col("b.tx_id"))
            & (F.col("a.addr") < F.col("b.addr")),
        )
        .groupBy(
            F.col("a.addr").alias("addr_a"), F.col("b.addr").alias("addr_b")
        )
        .agg(F.count(F.lit(1)).alias("n_txs"))
    )


def two_hop_neighbors(edges: DataFrame, address_hash: str) -> DataFrame:
    """Q19-style traversal without a graph engine: addresses reachable
    through one transaction hop (addr → tx → addr)."""
    first = edges.filter(
        (F.col("src") == address_hash) & (F.col("direction") == "in")
    ).select(F.col("dst").alias("tx_id"))
    second = edges.filter(F.col("direction") == "out").select(
        F.col("src").alias("tx_id"), F.col("dst").alias("neighbor")
    )
    return (
        first.join(second, "tx_id")
        .filter(F.col("neighbor") != address_hash)
        .select("neighbor")
        .distinct()
    )
