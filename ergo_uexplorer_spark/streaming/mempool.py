"""Mempool operators (SURVEY §2.1 S5, §2.3 C11).

The reference polls `/transactions/unconfirmed` and diffs consecutive
snapshots (`newTxIds = all.keySet.diff(old)`, MempoolSyncer.scala:23-33).
Two equivalent Spark forms:

  * batch: `except` on tx ids between snapshot DataFrames;
  * streaming: snapshots land as files → `readStream` +
    `dropDuplicates("tx_id")` emits each tx exactly once across
    overlapping snapshots (state-store backed; a watermark bounds state
    since mempool txs settle or expire within a known horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.blocks import TX_SCHEMA


def mempool_diff(new_snapshot: DataFrame, old_snapshot: DataFrame) -> DataFrame:
    """C11 batch form: txs present now but not in the previous snapshot."""
    new_ids = new_snapshot.select("id").exceptAll(
        old_snapshot.select("id")
    ).distinct()
    return new_snapshot.join(new_ids, "id", "left_semi")


def unconfirmed_overlay(
    utxo: DataFrame, mempool_txs: DataFrame
) -> DataFrame:
    """The speculative view: confirmed UTXO with the mempool applied —
    boxes spent by unconfirmed txs drop out, unconfirmed outputs join
    with `confirmed = false`. Same anti-join/union algebra as the block
    path (C4/C5), so a settling tx changes a row's flag, never the
    set semantics. Returns (box_id, value, ergo_tree, confirmed)."""
    mem_spent = mempool_txs.select(
        F.explode("inputs").alias("i")
    ).select(F.col("i.boxId").alias("box_id"))
    mem_outputs = (
        mempool_txs.select(F.explode("outputs").alias("o"))
        .select(
            F.col("o.boxId").alias("box_id"),
            F.col("o.value").alias("value"),
            F.col("o.ergoTree").alias("ergo_tree"),
        )
        .withColumn("confirmed", F.lit(False))
    )
    confirmed = (
        utxo.select("box_id", "value", "ergo_tree")
        .join(mem_spent, "box_id", "left_anti")
        .withColumn("confirmed", F.lit(True))
    )
    # an unconfirmed output spent by another unconfirmed tx (chained
    # mempool txs) is not live either
    live_mem = mem_outputs.join(mem_spent, "box_id", "left_anti")
    return confirmed.unionByName(live_mem)


def stream_new_txs(
    spark: SparkSession,
    snapshot_dir: str,
    checkpoint_dir: str,
    state_horizon: str | None = "2 hours",
) -> DataFrame:
    """Streaming form: each snapshot file is an array of unconfirmed txs;
    emits every tx id exactly once (first snapshot that contains it).

    Dedup state is BOUNDED by `state_horizon`: ids are watermarked on
    arrival time and evicted once the horizon passes — correct for a
    mempool because a tx either settles (then it leaves every snapshot)
    or expires within the node's own eviction window, so an id can only
    recur within a bounded interval. Pass ``state_horizon=None`` for the
    unbounded form (exact across arbitrarily spaced snapshots).

    Returns a streaming DataFrame; callers attach their sink, e.g.
    `.writeStream.format("memory")` in tests or `foreachBatch(plugin)`
    for C12 plugin dispatch.
    """
    stream = (
        spark.readStream.schema(TX_SCHEMA)
        .json(snapshot_dir)
        .withColumnRenamed("id", "tx_id")
        .select("tx_id", "size", F.size("inputs").alias("n_inputs"))
    )
    if state_horizon is None:
        return stream.dropDuplicates(["tx_id"])
    return (
        stream.withColumn("arrival", F.current_timestamp())
        .withWatermark("arrival", state_horizon)
        .dropDuplicatesWithinWatermark(["tx_id"])
        .drop("arrival")
    )
