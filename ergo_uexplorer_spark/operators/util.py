"""Shared operator plumbing."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _input_bytes(df: DataFrame) -> int:
    """Best-effort size of the files feeding `df` (0 when unknown —
    in-memory fixtures, non-local URIs). Driver-side only, no job."""
    total = 0
    try:
        for f in df.inputFiles():
            p = f[7:] if f.startswith("file:") and f[5:7] == "//" else f
            p = p[5:] if p.startswith("file:") else p
            try:
                total += os.path.getsize(p)
            except OSError:
                pass
    except Exception:
        return 0
    return total


def _free_storage_bytes(df: DataFrame) -> int:
    """Remaining block-manager storage memory across executors (driver
    included in local mode). 0 when the probe fails."""
    try:
        status = (
            df.sparkSession.sparkContext._jsc.sc().getExecutorMemoryStatus()
        )
        it = status.iterator()
        total = 0
        while it.hasNext():
            total += it.next()._2()._2()
        return total
    except Exception:
        return 0


def pin_corpus_dim(df: DataFrame, force: bool = True) -> DataFrame:
    """Eagerly pin a reduced-but-CORPUS-sized table (doc-dim hash
    arrays, per-doc token stats) so multi-stage candidate/verify
    operators derive every stage from ONE materialization.

    Storage is the SQL columnar cache (`persist` + forced build), not a
    `localCheckpoint`: cached batches are compressed columnar buffers
    that unroll in bounded ~10k-row chunks and spill to disk under
    pressure — the deserialized row blocks the old checkpoint pin held
    were 3-5× larger and OOM'd a 12 GB single-box session once two
    100×-scale pins coexisted (SCALE.md round-8 soak) — and, unlike
    checkpoint blocks (reclaimed only when the Python wrapper is GC'd),
    a persisted pin is EXPLICITLY released by `materialize_and_release`
    once the operator's output is materialized, so repeated dedup calls
    in one session no longer accumulate corpus-sized blocks.

    Adaptive level: when the projected pin size (input file bytes — the
    hashed-array dim is the same order as the text it came from) crowds
    the storage memory currently free, the disk tier is mandatory
    anyway, so the pin uses MEMORY_AND_DISK serialized; otherwise the
    deserialized columnar default. ``spark.graft.pin.serialized``
    (true/false) still overrides both ways."""
    from pyspark.storagelevel import StorageLevel

    conf = df.sparkSession.conf.get("spark.graft.pin.serialized", "")
    if conf == "true":
        serialized = True
    elif conf == "false":
        serialized = False
    else:
        est = _input_bytes(df) * 3  # raw rows ≈ 3× compressed parquet
        free = _free_storage_bytes(df)
        if free:
            serialized = est > free // 2
        else:
            # The probe uses a private JVM API; when it breaks (any
            # Spark upgrade) or the frame isn't file-backed (est==0,
            # size unknowable) we must fail toward the SAFE level —
            # deserialized is exactly what OOM'd at 100× in round 8.
            # Only a provably small pin (<256 MB of source files) keeps
            # the fast deserialized default without memory evidence.
            serialized = est == 0 or est > 256 * 1024 * 1024
    level = (
        StorageLevel.MEMORY_AND_DISK
        if serialized
        else StorageLevel.MEMORY_AND_DISK_DESER
    )
    df = df.persist(level)
    if force:
        df.count()  # force the cache build (the checkpoint pin was eager)
    # force=False: the CALLER's first action builds the cache — use when
    # that action is itself a full pass over the pin (e.g. a stats
    # aggregate), so pinning costs no extra scheduled job (r13)
    return df


def materialize_and_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Pin `result` with an eager ``localCheckpoint`` and unpersist the
    `cached` intermediates (corpus pins, persisted shingle tables) that
    fed it.

    Multi-stage candidate/verify operators persist expensive
    intermediates (doc-dim hash arrays, shingle sets) that the lazily
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
