"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_and_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Pin `result` with an eager ``localCheckpoint`` and unpersist the
    `cached` intermediates that fed it.

    Multi-stage candidate/verify operators persist expensive
    intermediates (shingle sets, candidate pairs) that the lazily
    returned result still references — so the operator itself can't
    unpersist them before the caller materializes. Left alone, those
    ``persist()`` entries pin executor storage for the LIFETIME of the
    session (the CacheManager holds strong references; the driver runs
    ~50 queries in one session). Checkpointing the result first is safe
    because it is the operator's OUTPUT — near-dup/verified-pair sets,
    orders of magnitude smaller than the corpus — and RDD-level
    checkpoint blocks are reclaimed by the ContextCleaner once the
    DataFrame is garbage collected, unlike CacheManager entries.
    """
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist(blocking=False)
    return out


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Tokenize/shingle stages are CPU-bound string work: a corpus that
    arrives in few files (one 128 MB parquet = 1 partition) would pin a
    single core. Spread it before exploding; no-op when the scan already
    has enough splits (the 100 TB case).

    Streaming frames pass through untouched (their parallelism is the
    source's; `df.rdd` would throw). The batch probe via `df.rdd` is a
    driver-side plan conversion only — no job runs."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
