"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin_corpus_dim(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint for reduced-but-CORPUS-sized tables
    (doc-dim hash arrays, per-doc token stats), with an opt-in
    SERIALIZED disk-spillable storage level.

    The default localCheckpoint holds DESERIALIZED JVM objects in
    memory — fast (measured ~1.7× faster than serialized on the sf0.1
    dedup paths), but on a single box it OOMs once a few 100×-scale
    doc-dim tables coexist in one session (measured: two ~4 GB array
    tables in a 12 GB driver). Set the session conf
    ``spark.graft.pin.serialized=true`` for memory-tight giant runs:
    blocks then store serialized (3-5× smaller) and spill to disk
    under pressure, at a decode cost per downstream consumer. On a
    real cluster the blocks spread across executors, so the default
    stays the fast path; tiny pins — candidate pairs, signatures,
    scalars — always use plain localCheckpoint regardless."""
    serialized = (
        df.sparkSession.conf.get("spark.graft.pin.serialized", "false")
        == "true"
    )
    if not serialized:
        return df.localCheckpoint(eager=True)
    from pyspark.storagelevel import StorageLevel

    return df.localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )


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
