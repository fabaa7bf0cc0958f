"""Analytics plugin operators (SURVEY §2.5 P1;
alert-plugin/HighValueDetector.scala:19-62).

High-value transaction detection: per tx, sum output value EXCLUDING
payback outputs (an output whose tree also appears among the tx's input
trees — change going back to the sender) and fee outputs; alert when the
remainder crosses the threshold. Pure column algebra — in streaming mode
the same function runs inside foreachBatch (C12 plugin dispatch)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import EMISSION_TREE, FEE_TREE

NANO = 1_000_000_000


def high_value_txs(
    boxes_main: DataFrame,
    inputs_main: DataFrame,
    threshold_nano: int = 100 * NANO,
) -> DataFrame:
    """Returns (tx_id, moved_value, out_addresses) for txs moving ≥
    threshold to third parties."""
    input_trees = (
        inputs_main.select("tx_id", "box_id")
        .join(
            boxes_main.select("box_id", F.col("ergo_tree").alias("in_tree")),
            "box_id",
        )
        .select("tx_id", "in_tree")
        .distinct()
    )
    outs = boxes_main.select("tx_id", "ergo_tree", "address", "value").filter(
        ~F.col("ergo_tree").isin(FEE_TREE, EMISSION_TREE)
    )
    third_party = outs.join(
        input_trees,
        (outs.tx_id == input_trees.tx_id)
        & (outs.ergo_tree == input_trees.in_tree),
        "left_anti",
    )
    return (
        third_party.groupBy("tx_id")
        .agg(
            F.sum("value").alias("moved_value"),
            F.sort_array(
                F.collect_set(
                    F.struct(F.col("address"), F.col("value"))
                )
            ).alias("out_addresses"),
        )
        .filter(F.col("moved_value") >= threshold_nano)
    )
