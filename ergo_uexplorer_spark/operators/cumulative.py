"""Cumulative/sequencing operators (SURVEY §2.2 T3-T5).

The reference computes running chain totals and global box/tx indexes by
folding block-after-block on a single thread (BlockBuilder.scala:8-66,
FullBlockBuilder.scala:116-144). Spark-first, these are window functions —
but a naive `Window.orderBy(...)` with no partition key collapses the whole
dataset into ONE task, which is exactly what dies at 100 TB. The operators
here keep the computation distributed:

  * running totals partitioned by a real key (address/customer/...) use a
    plain partitioned window — scales with key cardinality;
  * global sequences (maxBoxGix-style) use range partitioning + per-
    partition window + a tiny driver-side prefix-sum of partition counts
    (the only data collected is ONE long per partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gseq_pid"
_LOCAL = "__gseq_local"
_OFF = "__gseq_off"


def global_sequence(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str = "gix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable global row_number() over a total order.

    Equivalent of the reference's global output index
    (FullBlockBuilder.scala:116-144: gix = previous block's maxBoxGix +
    rank within block) — generalized: range-partition on the order key so
    ranges are contiguous, number rows within each partition, then shift
    each partition by the exact count of all earlier partitions. The
    prefix-sum touches one row per partition on the driver; everything
    else stays fully parallel (vs. the single-task naive global window).

    `order_cols` must be a total order (include a unique tiebreak).
    Returns df + `out_col` with 1-based global indexes.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    # cache: the partition-count job and the final job must see identical
    # range boundaries
    ranged = ranged.persist()
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    local = ranged.withColumn(_LOCAL, F.row_number().over(w))
    counts = sorted(
        (r[_PID], r["cnt"])
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{_PID} int, {_OFF} long"
    )
    return (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.col(_LOCAL) + F.col(_OFF)).cast("long"))
        .drop(_PID, _LOCAL, _OFF)
    )


def running_totals(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str | Column],
    sums: dict[str, Column],
) -> DataFrame:
    """Partitioned running totals (BlockBuilder.scala:49-63 semantics,
    distributed by partition key). `sums` maps output column name → input
    column expression."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for out, col in sums.items():
        df = df.withColumn(out, F.sum(col).over(w))
    return df
