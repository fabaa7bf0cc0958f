"""Streaming corpus refresh: the continuous form of the z21 operator.

New documents arrive as a stream; every micro-batch is screened against
the ACCEPTED base corpus with `dedup.incremental_dedup` (cross-side-only
MinHash-LSH + exact verify) and the survivors append to the base — so a
document accepted in batch k is part of the dedup base for batch k+1.
This is the loop a continuously-crawling pipeline actually runs: the
base corpus only ever grows by screened batches, and nothing ever
re-pairs the base against itself.

Idempotency: each batch's accepted docs land in their own
``batch=<id>`` subdirectory with mode=overwrite, so foreachBatch
redelivery (at-least-once) rewrites the same directory instead of
double-appending — the same per-batch-commit idea as
streaming/incremental.UtxoState, with the directory name as the commit
marker. The base read is partition-discovery over those directories.

At 100 TB the base side's banded signatures would be a stored artifact
(see incremental_dedup's docstring); here each batch derives them from
the base parquet, which keeps this module self-contained and still
touches base text only for candidate verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import incremental_dedup

SEED_BATCH = "seed"


def seed_base(docs: DataFrame, base_path: str) -> None:
    """Write the initial accepted corpus (batch=seed)."""
    docs.write.mode("overwrite").parquet(f"{base_path}/batch={SEED_BATCH}")


def read_base(spark: SparkSession, base_path: str) -> DataFrame | None:
    """The accepted corpus across all committed batches (None before
    any seed/commit)."""
    try:
        return spark.read.parquet(base_path).drop("batch")
    except Exception:  # AnalysisException: path missing / empty
        return None


def corpus_refresh_stream(
    docs_stream: DataFrame,
    base_path: str,
    checkpoint: str,
    decisions_path: str | None = None,
    num: int = 4,
    den: int = 5,
    available_now: bool = True,
):
    """Start the refresh loop over a streaming documents DataFrame
    (doc_id, text, ...). Returns the StreamingQuery. Decisions
    (doc_id, dup_of, keep) are optionally recorded per batch under
    `decisions_path` with the same idempotent batch=<id> layout."""

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        base = read_base(spark, base_path)
        if base is None:
            decisions = batch.select(
                "doc_id",
                F.lit(None).cast("long").alias("dup_of"),
                F.lit(True).alias("keep"),
            )
        else:
            decisions = incremental_dedup(
                batch, base.select(*batch.columns), num=num, den=den
            )
        kept = batch.join(
            decisions.filter(F.col("keep")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        kept.write.mode("overwrite").parquet(f"{base_path}/batch={batch_id}")
        if decisions_path:
            decisions.write.mode("overwrite").parquet(
                f"{decisions_path}/batch={batch_id}"
            )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )
