"""Interval / history operators: SCD2 dimension building from an event
log, and sweep-line interval analytics (peak concurrency).

The reference keeps only each entity's LATEST state (its UTXO view,
MvStorage.scala's current-map semantics); a warehouse additionally wants
the full validity history — the slowly-changing-dimension type-2 table —
and load questions over intervals ("how many sessions were open at the
worst moment?"). Both are classic Spark-first shapes:

* SCD2 is gaps-and-islands: a change flag via `lag`, a running version
  number, one group per (entity, version), then `lead` to close each
  interval. Every window is PARTITIONED BY the entity key — fully
  parallel at any scale.
* Peak concurrency is the sweep line: ±1 boundary points, a GLOBAL
  running sum over (t, delta) — which must NOT be a naive
  `Window.orderBy(t)` (one task). `cumulative.ordered_prefix` computes
  it range-partitioned with a per-partition-offset correction, so the
  sweep parallelizes; the answer is a single lexicographic max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cumulative import ordered_prefix


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an event log into SCD2 validity intervals → one row per
    (entity, consecutive-state run): (key, state, version, valid_from,
    valid_to, is_current, n_events).

    Only state CHANGES open a new version (consecutive equal states
    merge into one interval — the defining SCD2 property; the raw
    `lead`-per-event table is NOT SCD2). `valid_to` is the next
    version's `valid_from` (end-exclusive convention); the open
    interval has NULL `valid_to` and `is_current=true`. Ordering within
    an entity is (ts, tiebreak) — pass a unique tiebreak so equal
    timestamps produce a deterministic history.

    Two entity-partitioned windows + one hash-agg, all shuffling once
    on the entity key.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    flagged = df.withColumn(
        "__chg",
        F.when(
            F.lag(F.col(state_col)).over(w).isNull()
            | (F.lag(F.col(state_col)).over(w) != F.col(state_col)),
            1,
        ).otherwise(0),
    ).withColumn(
        "version",
        F.sum("__chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    runs = flagged.groupBy(key_col, "version").agg(
        F.min(F.col(state_col)).alias(state_col),
        F.min(F.col(ts_col)).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return runs.withColumn(
        "valid_to", F.lead("valid_from").over(wv)
    ).select(
        key_col,
        state_col,
        "version",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        "n_events",
    )


def peak_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Maximum number of simultaneously-open intervals → ONE row
    (peak, ts_at_peak): the sweep-line classic. Ends are EXCLUSIVE (an
    interval ending at t does not overlap one starting at t) — encoded
    by sorting the −1 boundary before the +1 at equal timestamps, so no
    epsilon arithmetic is needed.

    The running sum over the global (t, delta) order goes through
    `ordered_prefix` (range-partitioned + offset correction), never a
    single-task window; the final reduction is one lexicographic
    struct-max: max over (cum, −t) = (peak, earliest t reaching it).
    Permutation-proof under timestamp ties: rows tied on (t, delta)
    carry identical deltas, so the multiset of prefix values — and
    therefore the max and its earliest t — is order-independent.
    """
    pts = intervals.select(
        F.col(start_col).cast("long").alias("__pt"),
        F.lit(1).alias("__d"),
    ).unionByName(
        intervals.select(
            F.col(end_col).cast("long").alias("__pt"),
            F.lit(-1).alias("__d"),
        )
    )
    swept = ordered_prefix(
        pts,
        ["__pt", "__d"],
        sum_cols={"__cum": "__d"},
        num_partitions=num_partitions,
    )
    best = swept.agg(
        F.max(F.struct(F.col("__cum"), (-F.col("__pt")).alias("__nt"))).alias(
            "__b"
        )
    )
    return best.select(
        F.col("__b.__cum").cast("long").alias("peak"),
        (-F.col("__b.__nt")).cast("long").alias("ts_at_peak"),
    )
