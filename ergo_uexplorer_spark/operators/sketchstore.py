"""Persisted mergeable HLL sketch store — the incremental
distinct-count analogue of the MinHash signature store (sigstore.py):
each ingested batch writes its per-key Datasketches HLL sketches
(binary, KB-sized per key) under an idempotent ``batch=<id>``
partition; any later query answers "distinct values per key across ALL
data so far" by unioning the tiny sketch table — the raw data is never
re-read. This is the mergeable-summary shape that makes continuous
distinct-user / distinct-token dashboards O(keys) instead of O(data)
at 100 TB (reference gap: readme.md:226 lists datasketches as TODO).

Built entirely on Spark 3.5+ built-ins (`hll_sketch_agg`,
`hll_union_agg`, `hll_sketch_estimate`) — JVM-side, no UDFs; sketches
from different batches merge losslessly because Datasketches HLL union
is associative and idempotent (re-delivered batches overwrite their own
partition AND union to the same state)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # 4096 registers ≈ 1.6% rsd, ~4 KB per key


def write_hll_batch(
    df: DataFrame,
    path: str,
    batch: str,
    key_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> None:
    """Aggregate one batch's per-key sketches and (re)write them under
    ``{path}/batch={batch}`` — idempotent under redelivery: the same
    batch overwrites exactly its own partition, and HLL union is
    idempotent so a rewritten batch never double-counts."""
    (
        df.groupBy(*key_cols)
        .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"))
        .write.mode("overwrite")
        .parquet(f"{path}/batch={batch}")
    )


def distinct_estimates(
    spark: SparkSession, path: str, key_cols: list[str]
) -> DataFrame:
    """Distinct-count estimates per key over EVERY batch written so far:
    one scan of the key-dim sketch table + one union-agg per key. The
    fact data is never touched."""
    df = spark.read.option("basePath", path).parquet(path).drop("batch")
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "n_distinct_est"
        )
    )
