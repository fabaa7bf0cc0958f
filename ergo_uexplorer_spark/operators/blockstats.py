"""The 23-column `Block` table (SURVEY §2.2 T3: BlockBuilder.scala:8-66,
LightBlockModel.scala:215-268).

Every `total*` column is a running total over the parent chain and
`maxTxGix`/`maxBoxGix` are global sequence numbers — the reference folds
these block-by-block on one thread; here they are ONE `ordered_prefix`
pass (distributed prefix sums + boundary-corrected lag) over the resolved
main chain.

Reward/fee (T1, RewardCalculator.scala:21-57 + Const.scala:98-113):
reward = min(TeamTreasuryThreshold, emission-at-height) with the EIP-27
re-emission branch from the activation height; fee = Σ outputs whose
tree is the fee contract; miner address = Pay2S of the reward-output
script embedding header.minerPk (synthetic serialized form — full
sigmastate serialization is out of scope per SURVEY §7, but the address
is a P2S of a pk-bearing script exactly like the reference's
`ErgoScriptPredef.rewardOutputScript`, not a bare P2PK).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import FEE_TREE, NANO
from ..functions.crypto import ergo_tree_to_address
from .cumulative import ordered_prefix


@dataclass(frozen=True)
class MonetarySettings:
    """Emission/reward constants (mainnet defaults). Heights in blocks,
    amounts in nanoERG. Sources: Const.scala:98-113 and Ergo's public
    EmissionRules (fixed-rate 75 ERG for 525600 blocks, then −3 ERG per
    64800-block epoch)."""

    fixed_rate_period: int = 525600
    epoch_length: int = 64800
    fixed_rate: int = 75 * NANO
    one_epoch_reduction: int = 3 * NANO
    team_treasury_threshold: int = 67_500_000_000  # Const.scala:102
    eip27_upper_point: int = 15 * NANO  # Const.scala:107
    eip27_default_reemission: int = 12 * NANO
    eip27_lower_point: int = 3 * NANO
    eip27_residual_emission: int = 3 * NANO
    eip27_activation_height: int = 777217  # mainnet, Const.scala:112


MAINNET = MonetarySettings()

# the reward-output script's spending delay (Const.scala:100
# MinerRewardDelta); baked into the synthetic reward tree form below
MINER_REWARD_DELAY = 720


def miner_reward_tree(miner_pk: Column) -> Column:
    """Synthetic serialized form of `rewardOutputScript(delay, minerPk)`
    (RewardCalculator.scala:29-35): a P2S script embedding the delay and
    the pk. Deterministic and collision-free per pk; `ergo_tree_to_
    address` renders it as a Pay2S address (prefix 0x03 + checksum)."""
    return F.concat(F.lit("1a" + format(MINER_REWARD_DELAY, "08x")), miner_pk)


def emission_at_height(
    height: Column, s: MonetarySettings = MAINNET
) -> Column:
    """Per-block emission (nanoERG). Strict `<` at the fixed-rate
    boundary: block 525600 is already epoch 1 (72 ERG), matching
    EmissionRules.emissionAtHeight."""
    epoch = (
        F.floor(
            (height - F.lit(s.fixed_rate_period)) / F.lit(s.epoch_length)
        ).cast("long")
        + 1
    )
    declining = F.greatest(
        F.lit(s.fixed_rate) - F.lit(s.one_epoch_reduction) * epoch, F.lit(0)
    )
    return F.when(height < s.fixed_rate_period, F.lit(s.fixed_rate)).otherwise(
        declining
    )


def miner_reward_at_height(
    height: Column, s: MonetarySettings = MAINNET
) -> Column:
    """T1 reward fidelity (RewardCalculator.scala:38-57): the treasury
    cap `min(TeamTreasuryThreshold, emission)` applies always (7.5 of
    the first 75 ERG went to the foundation), and from the EIP-27
    activation height the re-emission branch kicks in:
    reward ≥ 15 ERG → reward − 12; 3 < reward < 15 → 3 (residual);
    else unchanged."""
    reward = F.least(
        F.lit(s.team_treasury_threshold), emission_at_height(height, s)
    )
    eip27 = (
        F.when(
            reward >= s.eip27_upper_point,
            reward - F.lit(s.eip27_default_reemission),
        )
        .when(
            reward > s.eip27_lower_point, F.lit(s.eip27_residual_emission)
        )
        .otherwise(reward)
    )
    return F.when(
        height >= F.lit(s.eip27_activation_height), eip27
    ).otherwise(reward)


def build_block_table(
    headers_main: DataFrame,
    transactions: DataFrame,
    outputs: DataFrame,
    num_partitions: int | None = None,
    settings: MonetarySettings = MAINNET,
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
    # the Python address render runs over the DISTINCT miner_pk dimension
    # (a few thousand miners for millions of blocks), never per block row
    pk_dim = (
        headers_main.select("miner_pk")
        .distinct()
        .withColumn(
            "miner_address",
            ergo_tree_to_address(miner_reward_tree(F.col("miner_pk"))),
        )
    )
    base = (
        headers_main.drop("txs_count")
        .join(per_tx, "block_id", "left")
        .join(per_out, "block_id", "left")
        .withColumn("block_fee", F.coalesce("block_fee_raw", F.lit(0)))
        .withColumn(
            "miner_reward", miner_reward_at_height(F.col("height"), settings)
        )
        .withColumn(
            "miner_revenue", F.col("miner_reward") + F.col("block_fee")
        )
        .withColumn(
            "block_coins",
            F.coalesce("all_outputs_value", F.lit(0)) - F.col("miner_revenue"),
        )
        .join(F.broadcast(pk_dim), "miner_pk")
        .withColumn("emission", emission_at_height(F.col("height"), settings))
    )
    # ONE prefix pass: the lag (prev timestamp) and every running sum are
    # independent of each other, and totalMiningTime needs no second pass —
    # the reference folds increments of (ts − prev.getOrElse(0L))
    # (BlockBuilder.scala:22-25, 44), which telescope to the block's own
    # timestamp, so the running total IS `timestamp`. The blockMiningTime
    # COLUMN still uses the quirk's other half: 0 for the first block.
    cum = ordered_prefix(
        base,
        order_cols=["height"],
        lag_cols={"prev_timestamp": "timestamp"},
        sum_cols={
            "block_chain_total_size": "block_size",
            "total_txs_count": "txs_count",
            "total_fees": "block_fee",
            "total_miners_reward": "miner_reward",
            "total_coins_in_txs": "block_coins",
            "total_coins_issued": "emission",
            "max_tx_gix_1b": "txs_count",
            "max_box_gix_1b": "outputs_count",
        },
        num_partitions=num_partitions,
    )
    cum = cum.withColumn(
        "block_mining_time",
        F.when(
            F.col("prev_timestamp").isNotNull(),
            F.col("timestamp") - F.col("prev_timestamp"),
        ).otherwise(F.lit(0)),
    ).withColumn("total_mining_time", F.col("timestamp").cast("long"))
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
