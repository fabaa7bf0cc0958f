"""Stateful chain operators (SURVEY §2.3 C1-C3, C6-C8): main-chain
resolution, fork detection, chain audits.

Batch fork semantics: instead of the reference's imperative rollback
(BlockWriter.scala:26-77 — find losing blocks, rollbackTo(version),
re-insert winners), the main chain is a *deterministic recomputation*:
anchor at the best tip and walk `parentId` links. Contested regions are
bounded by protocol (the reference keeps a 100-block tip cache,
ChainLinker.scala:10-54; deeper reorgs are impossible to follow), so the
walk collects only the blocks at contested heights — a few hundred rows —
to the driver; every uncontested height is main-chain by construction.
Tie-break at equal height: lexicographically greatest blockId (documented
deterministic rule; the reference takes "latest seen", which a batch
engine cannot reproduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import GENESIS_ID


def detect_forks(headers: DataFrame) -> DataFrame:
    """C6 (MvStorage.scala:231-251): heights carrying >1 block id."""
    return (
        headers.groupBy("height")
        .agg(F.collect_set("block_id").alias("block_ids"))
        .filter(F.size("block_ids") > 1)
        .select(
            "height",
            F.sort_array("block_ids").alias("block_ids"),
            F.size("block_ids").alias("n_blocks"),
        )
    )


def resolve_main_chain(headers: DataFrame) -> DataFrame:
    """Adds `main_chain: boolean`. Only contested heights (and the walk
    from the best tip down to the lowest contested height) are collected
    driver-side; reorg depth is protocol-bounded so this is O(reorg
    window), not O(chain)."""
    by_height = (
        headers.groupBy("height").agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
    )
    contested = [r["height"] for r in by_height.collect()]
    if not contested:
        return headers.withColumn("main_chain", F.lit(True))

    lo = min(contested)
    region = {
        r["block_id"]: (r["parent_id"], r["height"])
        for r in headers.filter(F.col("height") >= lo)
        .select("block_id", "parent_id", "height")
        .collect()
    }
    # best tip: max height, tie-break greatest block id
    tip_id = max(region, key=lambda b: (region[b][1], b))
    winners = set()
    cur = tip_id
    while cur in region:
        winners.add(cur)
        cur, _h = region[cur]
        if cur == GENESIS_ID:
            break
    winners_df = headers.sparkSession.createDataFrame(
        [(w,) for w in sorted(winners)], "block_id string"
    )
    return headers.join(
        F.broadcast(winners_df.withColumn("main_chain", F.lit(True))),
        "block_id",
        "left",
    ).withColumn(
        "main_chain",
        F.when(F.col("height") < lo, F.lit(True)).otherwise(
            F.coalesce(F.col("main_chain"), F.lit(False))
        ),
    )


def missing_heights(headers: DataFrame) -> DataFrame:
    """C7 (MvStorage.scala:284-290): TreeSet(1..last) ∖ stored."""
    max_h = headers.agg(F.max("height").alias("m"))
    full = max_h.select(
        F.explode(F.sequence(F.lit(1), F.col("m"))).alias("height")
    )
    return full.join(headers.select("height").distinct(), "height", "left_anti")


def chain_tip(headers: DataFrame, n: int = 100) -> DataFrame:
    """C8 (MvStorage.scala:41-70): the last-n-heights tip window used to
    link incoming blocks (ChainLinker's FIFO cache, batch form)."""
    max_h = headers.agg(F.max("height")).collect()[0][0] or 0
    return headers.filter(F.col("height") > max_h - n)


def assert_chained(headers_main: DataFrame) -> None:
    """hasParentAndIsChained (BlockWriter.scala:61-66): every main-chain
    block's parent is the main-chain block one height below."""
    h = headers_main.select("block_id", "parent_id", "height")
    parent = h.select(
        F.col("block_id").alias("parent_id"),
        (F.col("height") + 1).alias("height"),
    )
    broken = (
        h.filter(F.col("height") > 1)
        .join(parent, ["parent_id", "height"], "left_anti")
        .count()
    )
    if broken:
        raise AssertionError(f"{broken} main-chain blocks not parent-linked")
