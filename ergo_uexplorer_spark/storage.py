"""Lakehouse storage layout (SURVEY §4: replaces the reference's B-tree
indexes + MVStore page cache with partition pruning and file-level
clustering).

Layout rules (SCALE.md):
  * fact tables (`boxes`, `inputs`, `transactions`) partition by
    `height_bucket` (height div 65536) — bounded partition count over any
    chain length, natural append pattern (new blocks touch one bucket),
    and range queries prune directories;
  * NEVER partition by address/tree hash — hot addresses (supernode
    problem) would produce pathological partitions; instead rows are
    sorted within files by `ergo_tree_hash` (`sortWithinPartitions`) so
    parquet row-group min/max statistics prune address lookups — the
    poor man's Z-order, swap for OPTIMIZE ZORDER on Delta;
  * dimensions (`ergo_trees`, `blocks`, `tokens`) write unpartitioned
    single-digit-file tables (they broadcast anyway).

`overwrite_buckets` gives idempotent incremental appends: re-writing a
height bucket replaces exactly that bucket (dynamic partition
overwrite), which is the parquet-level analogue of Delta's
`replaceWhere` MERGE used for fork rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEIGHT_BUCKET_SIZE = 65536

FACT_SORT_KEYS = {
    "boxes": ["ergo_tree_hash", "box_id"],
    "inputs": ["box_id"],
    "transactions": ["tx_id"],
    "assets": ["token_id", "box_id"],
}


def with_height_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "height_bucket", F.expr(f"height div {HEIGHT_BUCKET_SIZE}")
    )


def write_fact(
    df: DataFrame, path: str, sort_keys: list[str] | None = None
) -> None:
    """Partition by height bucket, cluster rows by the lookup key."""
    out = with_height_bucket(df)
    if sort_keys:
        out = out.repartition("height_bucket").sortWithinPartitions(*sort_keys)
    (
        out.write.mode("overwrite")
        .partitionBy("height_bucket")
        .parquet(path)
    )


def overwrite_buckets(df: DataFrame, path: str) -> None:
    """Dynamic partition overwrite: replaces only the height buckets
    present in `df` (incremental append / fork rewrite path)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            with_height_bucket(df)
            .write.mode("overwrite")
            .partitionBy("height_bucket")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_dimension(df: DataFrame, path: str, files: int = 1) -> None:
    df.coalesce(files).write.mode("overwrite").parquet(path)


def write_lakehouse(tables: dict[str, DataFrame], root: str) -> dict[str, str]:
    """Persist the gold tables with the scale layout; returns paths."""
    paths: dict[str, str] = {}
    for name in ("boxes_main", "inputs_main", "transactions_main"):
        base = name.removesuffix("_main")
        p = f"{root}/{base}"
        write_fact(tables[name], p, FACT_SORT_KEYS.get(base))
        paths[base] = p
    for name in ("blocks", "ergo_trees", "tokens", "address_stats"):
        p = f"{root}/{name}"
        write_dimension(tables[name], p)
        paths[name] = p
    p = f"{root}/utxo"
    write_fact(tables["utxo"], p, FACT_SORT_KEYS["boxes"])
    paths["utxo"] = p
    return paths


def read_lakehouse(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    names = (
        "boxes",
        "inputs",
        "transactions",
        "blocks",
        "ergo_trees",
        "tokens",
        "address_stats",
        "utxo",
    )
    out = {n: spark.read.parquet(f"{root}/{n}") for n in names}
    # query-surface aliases (the serving tables are the main-chain ones)
    out["boxes_main"] = out["boxes"]
    out["inputs_main"] = out["inputs"]
    out["transactions_main"] = out["transactions"]
    return out
