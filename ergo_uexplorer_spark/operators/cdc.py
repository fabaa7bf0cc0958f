"""Change-data-capture operators: latest-wins snapshot reconstruction
(the batch twin of MERGE INTO / apply-changes semantics).

The reference maintains its current-state view by applying per-block
mutations in order (MvStorage.scala's insert/spend application; SURVEY
§2.3 C4/C5). Spark-first, reconstructing "the state after the last
change" from a change LOG is one hash-aggregate — `max_by` over the
sequence key — not an ordered fold: every row carries its own sequence
position, so the reduction is commutative and map-side combinable, and
delete markers simply filter the winners. That shape survives any
scale: one shuffle on the key, no window, no driver ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    changes: DataFrame,
    key_col: str,
    seq_cols: list[str],
    op_col: str,
    delete_ops: tuple[str, ...] = (),
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a change log latest-wins → one row per LIVE key:
    (key, last_op, *value_cols as last_<v>, n_changes). A key whose
    LATEST change is a delete op is absent from the snapshot (it was
    deleted); earlier deletes are overridden by later upserts, exactly
    MERGE semantics replayed from the log.

    seq_cols must totally order each key's changes (include a unique
    tiebreak) — `max_by` ties would otherwise be nondeterministic.
    One hash-agg (map-side combined), one shuffle on the key.
    """
    value_cols = value_cols or []
    picked = F.max_by(
        F.struct(
            F.col(op_col).alias("__op"),
            *[F.col(v).alias(f"__{v}") for v in value_cols],
        ),
        F.struct(*[F.col(c) for c in seq_cols]),
    ).alias("__last")
    agg = changes.groupBy(key_col).agg(
        picked, F.count(F.lit(1)).alias("n_changes")
    )
    live = agg
    if delete_ops:
        live = agg.filter(~F.col("__last.__op").isin(list(delete_ops)))
    return live.select(
        key_col,
        F.col("__last.__op").alias("last_op"),
        *[F.col(f"__last.__{v}").alias(f"last_{v}") for v in value_cols],
        "n_changes",
    )
