"""Stats endpoints (SURVEY §2.4 Q14-Q16, StatsService.scala:12-35).

The reference iterates only supernode (hot) maps — an approximation exact
only above the hot threshold. Spark computes the exact answer over the
whole live set: groupBy with map-side partial aggregation; AQE splits the
skewed (exchange) keys. A `hot_keys` helper mirrors the reference's
hot-key report (MvStorage.scala:107-121) for fast-path reuse."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000
HOT_KEY_THRESHOLD = 500  # SuperNodeCounter.scala:19


def top_addresses_by_utxo_count(
    address_stats: DataFrame, min_count: int = 1, k: int = 500
) -> DataFrame:
    return (
        address_stats.filter(F.col("utxo_count") >= min_count)
        .orderBy(F.desc("utxo_count"), F.asc("address"))
        .limit(k)
        .select("address", "utxo_count")
    )


def top_addresses_by_value(
    address_stats: DataFrame, min_erg: int = 1, k: int = 500
) -> DataFrame:
    return (
        address_stats.filter(F.col("total_value") >= min_erg * NANO)
        .orderBy(F.desc("total_value"), F.asc("address"))
        .limit(k)
        .select("address", "total_value")
    )


def hot_keys(address_stats: DataFrame) -> DataFrame:
    """Keys above the supernode threshold — the skew report the reference
    persists as hot-keys-*.csv.gz; useful as a broadcast dimension for
    salting decisions."""
    return address_stats.filter(
        F.col("utxo_count") > HOT_KEY_THRESHOLD
    ).select("ergo_tree_hash", "address", "utxo_count")
