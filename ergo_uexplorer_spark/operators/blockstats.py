"""The 23-column `Block` table (SURVEY §2.2 T3: BlockBuilder.scala:8-66,
LightBlockModel.scala:215-268).

Every `total*` column is a running total over the parent chain and
`maxTxGix`/`maxBoxGix` are global sequence numbers — the reference folds
these block-by-block on one thread; here they are ONE `ordered_prefix`
pass (distributed prefix sums + boundary-corrected lag) over the resolved
main chain.

Reward/fee (T1, RewardCalculator.scala:21-58): reward = emission at
height (pre-EIP-27 closed form; fixtures stay in the 75-ERG era), fee =
Σ outputs whose tree is the fee contract, miner address derived from
header.minerPk (P2PK tree → address UDF over the tiny headers table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import FEE_TREE, NANO
from ..functions.crypto import ergo_tree_to_address
from .cumulative import ordered_prefix

FIXED_RATE_PERIOD = 525600
FIXED_RATE = 75 * NANO
EPOCH_LENGTH = 64800
DECREASE_STEP = 3 * NANO


def emission_at_height(height: Column) -> Column:
    """Per-block emission (nanoERG), pre-EIP-27 schedule
    (RewardCalculator.scala / Const.scala:98-113)."""
    epoch = ((height - F.lit(FIXED_RATE_PERIOD)) / F.lit(EPOCH_LENGTH)).cast(
        "long"
    ) + 1
    declining = F.greatest(
        F.lit(FIXED_RATE) - F.lit(DECREASE_STEP) * epoch, F.lit(0)
    )
    return F.when(height <= FIXED_RATE_PERIOD, F.lit(FIXED_RATE)).otherwise(
        declining
    )


def build_block_table(
    headers_main: DataFrame,
    transactions: DataFrame,
    outputs: DataFrame,
    num_partitions: int | None = None,
) -> DataFrame:
    """headers (main chain only) + per-block tx/output aggregates →
    cumulative Block rows. Aggregates are partial map-side; the prefix
    pass is `ordered_prefix` over height (total order on the main
    chain)."""
    per_tx = transactions.groupBy("block_id").agg(
        F.count(F.lit(1)).alias("txs_count"),
        F.sum("tx_size").alias("txs_size"),
    )
    per_out = outputs.groupBy("block_id").agg(
        F.sum("value").alias("all_outputs_value"),
        F.count(F.lit(1)).alias("outputs_count"),
        F.sum(F.when(F.col("ergo_tree") == FEE_TREE, F.col("value"))).alias(
            "block_fee_raw"
        ),
    )
    base = (
        headers_main.drop("txs_count")
        .join(per_tx, "block_id", "left")
        .join(per_out, "block_id", "left")
        .withColumn("block_fee", F.coalesce("block_fee_raw", F.lit(0)))
        .withColumn("miner_reward", emission_at_height(F.col("height")))
        .withColumn(
            "miner_revenue", F.col("miner_reward") + F.col("block_fee")
        )
        .withColumn(
            "block_coins",
            F.coalesce("all_outputs_value", F.lit(0)) - F.col("miner_revenue"),
        )
        .withColumn(
            "miner_address",
            ergo_tree_to_address(F.concat(F.lit("0008cd"), F.col("miner_pk"))),
        )
    )
    # prev timestamp for mining time; reference quirk preserved:
    # totalMiningTime's increment for the FIRST block is its raw timestamp
    # (prev.getOrElse(0L)), while the blockMiningTime COLUMN is 0
    # (BlockBuilder.scala:22-25, 44).
    with_lag = ordered_prefix(
        base,
        order_cols=["height"],
        lag_cols={"prev_timestamp": "timestamp"},
        num_partitions=num_partitions,
    )
    with_lag = with_lag.withColumn(
        "mining_time_increment",
        F.col("timestamp") - F.coalesce(F.col("prev_timestamp"), F.lit(0)),
    ).withColumn(
        "block_mining_time",
        F.when(
            F.col("prev_timestamp").isNotNull(),
            F.col("timestamp") - F.col("prev_timestamp"),
        ).otherwise(F.lit(0)),
    ).withColumn("emission", emission_at_height(F.col("height")))

    cum = ordered_prefix(
        with_lag,
        order_cols=["height"],
        sum_cols={
            "block_chain_total_size": "block_size",
            "total_txs_count": "txs_count",
            "total_mining_time": "mining_time_increment",
            "total_fees": "block_fee",
            "total_miners_reward": "miner_reward",
            "total_coins_in_txs": "block_coins",
            "total_coins_issued": "emission",
            "max_tx_gix_1b": "txs_count",
            "max_box_gix_1b": "outputs_count",
        },
        num_partitions=num_partitions,
    )
    return cum.select(
        "block_id",
        "parent_id",
        "timestamp",
        "height",
        "block_size",
        "block_coins",
        "block_mining_time",
        F.col("txs_count").cast("int").alias("txs_count"),
        "txs_size",
        "miner_address",
        "miner_reward",
        "miner_revenue",
        "block_fee",
        "block_chain_total_size",
        "total_txs_count",
        "total_coins_issued",
        "total_mining_time",
        "total_fees",
        "total_miners_reward",
        "total_coins_in_txs",
        # gix are 0-based indexes of the LAST element: prev + count
        # ⇒ running count − 1 (BlockBuilder.scala:27-32)
        (F.col("max_tx_gix_1b") - 1).alias("max_tx_gix"),
        (F.col("max_box_gix_1b") - 1).alias("max_box_gix"),
    )
