"""Temporal join operators Spark lacks as built-ins (SURVEY §2.6 notes
the reference has none either — these are the training-pipeline/analytics
extensions): as-of join and range join.

`asof_join` is the union-tag algorithm, not a correlated lookup: tag both
sides, union, and forward-fill the most recent right-side payload with a
`last(ignorenulls)` window partitioned by key — one shuffle on (key),
linear in |L|+|R|, no per-row probing. This is the shape that scales to
100 TB (a broadcast-probe as-of dies when the right side is large; a
correlated subquery never distributes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_SIDE = "__asof_side"  # 0 = right (sorts first on ties → inclusive match)
_TB = "__asof_tb"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    left_id_col: str,
    payload_cols: list[str],
    right_tiebreak_col: str | None = None,
) -> DataFrame:
    """For each left row: the payload of the latest right row with
    right_ts <= left_ts and equal key (backward as-of, inclusive).

    Ties on right_ts resolve to the greatest `right_tiebreak_col`
    (deterministic). Returns left's (id, key, ts) + payload columns
    (null when no right row precedes).

    NULL timestamps never match: a right row with unknown ts cannot be
    "as of" anything (it is dropped from the fill stream), and a left
    row with unknown ts gets a null payload (it is kept, unmatched) —
    mirroring the correlated-subquery semantics where ts <= NULL is
    UNKNOWN. Without this, null-ts rows sort into the nulls-first
    region together and silently match each other (dirty-twin sweep
    finding).
    """
    tb = right_tiebreak_col or payload_cols[0]
    right = right.filter(F.col(right_ts_col).isNotNull())
    r = right.select(
        F.col(key_col).alias("__key"),
        F.col(right_ts_col).cast("long").alias(_T),
        F.lit(0).alias(_SIDE),
        F.col(tb).cast("long").alias(_TB),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    l = left.select(
        F.col(key_col).alias("__key"),
        F.col(left_ts_col).cast("long").alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias(_TB),
        F.col(left_id_col).alias("__lid"),
    )
    for c in payload_cols:
        l = l.withColumn(f"__p_{c}", F.lit(None).cast(r.schema[f"__p_{c}"].dataType))
    r = r.withColumn("__lid", F.lit(None).cast(l.schema["__lid"].dataType))

    unioned = r.unionByName(l.select(*r.columns))
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col(_T), F.col(_SIDE), F.col(_TB).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in payload_cols:
        filled = filled.withColumn(
            f"__p_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w)
        )
    out = filled.filter(F.col(_SIDE) == 1).select(
        F.col("__lid").alias(left_id_col),
        F.col("__key").alias(key_col),
        F.col(_T).alias(left_ts_col),
        *[
            # a null LEFT ts matches nothing (ts <= NULL is UNKNOWN)
            F.when(F.col(_T).isNotNull(), F.col(f"__p_{c}")).alias(c)
            for c in payload_cols
        ],
    )
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    left_id_col: str,
    window_len: int,
) -> DataFrame:
    """Count right rows per left row within [left_ts, left_ts+window_len).

    Expressed as an equi-join on key + range predicates so Catalyst keeps
    the equi part as the shuffle key and applies the range as a post-join
    filter; with AQE the skewed keys split. (For key-less range joins,
    bucketize both sides by floor(ts/window) first — the classic
    interval-bucket trick.)"""
    l = left.select(
        F.col(left_id_col),
        F.col(key_col).alias("__key"),
        F.col(left_ts_col).cast("long").alias("__lt"),
    )
    r = right.select(
        F.col(key_col).alias("__key"),
        F.col(right_ts_col).cast("long").alias("__rt"),
    )
    joined = l.join(
        r,
        (l["__key"] == r["__key"])
        & (r["__rt"] >= l["__lt"])
        & (r["__rt"] < l["__lt"] + window_len),
        "left",
    )
    return joined.groupBy(left_id_col, l["__key"].alias(key_col)).agg(
        F.count(r["__rt"]).alias("n_in_range")
    )


def resample_gap_fill(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_cols: list[str],
    max_span: int = 50_000_000,
) -> DataFrame:
    """Regularize a sparse per-key time series onto a dense integer
    bucket grid and forward-fill the gaps — the hypertable
    resample/locf shape. Input: one row per (key, bucket) with the
    bucket-level aggregates already computed (integer buckets from
    `ts div bucket_ns`). Output: every bucket in [min, max] per key;
    missing buckets carry the most recent observed values (`observed`
    marks real rows).

    Distributed shape (r12 optimization): ONE exchange on the key and
    ONE sort. A single Window pass finds each observation's NEXT
    bucket (lead) and the per-key span (unbounded min/max over the
    same partitioning); each observed row then emits itself plus the
    gap buckets up to (exclusive) the next observation via
    sequence+explode — the LOCF carry is the emitting row itself, so
    filled rows reproduce the most recent OBSERVED ROW's values
    including genuine NULLs, and an observed row is never rewritten.
    The former shape (per-key min/max agg → dense grid → left join →
    IGNORE NULLS struct carry) computed the same rows with three more
    exchanges and a join. Leading gaps before a key's first
    observation stay absent by construction (the grid starts at the
    first observation). Buckets must be unique per key (the resample
    contract — upstream is a (key, bucket) aggregate).

    The grid is SPAN-bounded, not observation-count-bounded: one key
    with two observations eons apart would ask sequence() for a
    2^31+-element array (Spark hard limit) or OOM the task before the
    explode. Fail fast inside the plan with a clear message instead —
    the guard feeds the sequence bound itself, so column pruning can
    never elide it. Raise `max_span` deliberately (or pre-bucket
    coarser) for genuinely wider grids."""
    w = Window.partitionBy(key_col).orderBy(F.asc("__b0"))
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bucket_type = dict(df.dtypes)[bucket_col]
    stepped = (
        df.withColumnRenamed(bucket_col, "__b0")
        .withColumn("__b1", F.lead("__b0").over(w))
        .withColumn(
            "__span", F.max("__b0").over(w_full) - F.min("__b0").over(w_full)
        )
    )
    end_checked = F.when(
        F.col("__span") <= F.lit(max_span),
        F.coalesce(F.col("__b1") - F.lit(1), F.col("__b0")),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("resample_gap_fill: bucket span for key "),
                F.col(key_col).cast("string"),
                F.lit(" is "),
                F.col("__span").cast("string"),
                F.lit(
                    f" buckets (> max_span={max_span}); pre-bucket "
                    "coarser or raise max_span explicitly"
                ),
            )
        ).cast(bucket_type)
    )
    return stepped.select(
        key_col,
        F.explode(F.sequence(F.col("__b0"), end_checked)).alias(bucket_col),
        *value_cols,
        F.col("__b0").alias("__b0"),
    ).select(
        key_col,
        bucket_col,
        # NULL-key groups reproduce the former grid-LEFT-JOIN shape:
        # a NULL equi-key never matches, so their grid rows carry NULL
        # values and observed=false (coalesce(__obs, false) in the old
        # shape) — the window partitioning above WOULD treat NULL as a
        # real group, which is the divergence the r12 dirty sweep
        # caught on the interpolation twin.
        *[
            F.when(F.col(key_col).isNotNull(), F.col(c)).alias(c)
            for c in value_cols
        ],
        (
            F.col(key_col).isNotNull()
            & (F.col(bucket_col) == F.col("__b0"))
        ).alias("observed"),
    )


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int,
) -> DataFrame:
    """Blocked fuzzy self-join → (id_a, id_b, dist): the entity-
    resolution primitive. Candidate pairs must share EVERY blocking key
    (one equi-join shuffled on the block keys — the all-pairs product
    never appears in the plan; block design bounds |block|² work, the
    standard record-linkage posture), then exact Levenshtein edit
    distance filters to ≤ max_dist. `levenshtein` is the JVM built-in
    (whole-stage codegen, no Python), and ids are ordered a < b so each
    undirected pair appears once.

    Scale: the join shuffles on the blocking keys; a hot block (shared
    key held by k rows) costs k² comparisons — pick blocks so k stays
    bounded (e.g. attribute equality + name prefix), exactly like the
    LSH band join in dedup.py bounds bucket width."""
    a = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("__name_a"),
    )
    b = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("__name_b"),
    )
    return (
        a.join(b, block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("__name_a", "__name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def linear_interpolate(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    max_span: int = 50_000_000,
) -> DataFrame:
    """Regularize a sparse per-key integer series onto the dense
    [min, max] bucket grid and LINEARLY interpolate the gaps (the
    hypertable `interpolate` companion of `resample_gap_fill`'s LOCF).

    For a missing bucket b between observations (b0, v0) and (b1, v1):

        v(b) = (v0·(b1 − b) + v1·(b − b0)) div (b1 − b0)

    — the lerp arranged so the numerator is a sum of NON-NEGATIVE
    products (values must be ≥ 0), because integer `div` is floor
    division in DuckDB but truncation in Spark and the two only agree
    on non-negative operands. Exact int64 everywhere → engine-identical.

    Distributed shape (r12 optimization): ONE exchange on the key and
    ONE sort — a single Window pass computes the NEXT observation
    (lead) and the per-key span (unbounded min/max share the same
    partitioning), then each observed row emits itself plus the gap
    buckets up to the next observation via sequence+explode. The
    former shape (dense grid built from a spans aggregate, left-joined
    back, then two IGNORE NULLS carries) paid three more exchanges and
    a join for the same rows — plan diff in plans/r12/zy3_*.txt.
    Buckets must be unique per key (the resample contract — upstream
    is a (key, bucket) aggregate); the span guard raises the same
    max_span error as before, evaluated per key from the window span."""
    w = Window.partitionBy(key_col).orderBy(F.asc("__b0"))
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bucket_type = dict(df.dtypes)[bucket_col]
    stepped = (
        df.select(
            key_col,
            F.col(bucket_col).alias("__b0"),
            F.col(value_col).alias("__v0"),
        )
        .withColumn("__b1", F.lead("__b0").over(w))
        .withColumn("__v1", F.lead("__v0").over(w))
        .withColumn(
            "__span", F.max("__b0").over(w_full) - F.min("__b0").over(w_full)
        )
    )
    # emit [b0, b1) per observed row (the last observation emits just
    # itself); the guard raises BEFORE any oversized sequence allocates
    end_checked = F.when(
        F.col("__span") <= F.lit(max_span),
        F.coalesce(F.col("__b1") - F.lit(1), F.col("__b0")),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("linear_interpolate: bucket span for key "),
                F.col(key_col).cast("string"),
                F.lit(" exceeds max_span="),
                F.lit(str(max_span)),
            )
        ).cast(bucket_type)
    )
    return (
        stepped.select(
            key_col,
            "__b0",
            "__v0",
            "__b1",
            "__v1",
            F.explode(F.sequence(F.col("__b0"), end_checked)).alias(
                bucket_col
            ),
        )
        .select(
            key_col,
            bucket_col,
            # NULL-key groups reproduce the former grid-LEFT-JOIN
            # shape: a NULL equi-key never matches, so their grid rows
            # carry NULL value and observed=false (the window
            # partitioning above WOULD treat NULL as a real group —
            # that divergence is exactly what the r12 dirty sweep
            # caught vs the join-formulated oracle).
            F.when(
                F.col(key_col).isNotNull()
                & (F.col(bucket_col) == F.col("__b0")),
                F.col("__v0"),
            )
            .when(
                F.col(key_col).isNotNull(),
                F.expr(
                    f"(__v0 * (__b1 - {bucket_col}) + __v1 * "
                    f"({bucket_col} - __b0)) div (__b1 - __b0)"
                ),
            )
            .alias(value_col),
            (
                F.col(key_col).isNotNull()
                & (F.col(bucket_col) == F.col("__b0"))
            ).alias("observed"),
        )
    )


def windowed_conversion(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    window: int,
) -> DataFrame:
    """Windowed funnel conversion → one row per entity that performed
    `from_type`: (key, t0, t1, delay) where t0 is the entity's FIRST
    from-event and t1 the EARLIEST to-event in (t0, t0 + window]
    (null / null-delay when no conversion landed inside the window).
    The attribution primitive: "did the signup purchase within an
    hour?" — z27's path funnel without the time bound answers a
    different question.

    Scale shape: both sides reduce by key FIRST (a min-aggregate each,
    map-side combined), then one equi-join on the key with the range
    condition as a post-filter — never a range join against raw
    events, never a window. The to-side pre-aggregation is
    conditional-min over (t0-joined) candidates, so each entity
    contributes one row per side regardless of event count."""
    firsts = (
        events.filter(F.col(type_col) == from_type)
        .groupBy(key_col)
        .agg(F.min(F.col(ts_col).cast("long")).alias("t0"))
    )
    # firsts feeds the conversion join AND the final left join — pin the
    # per-key dim once so the fact-table scan+agg doesn't run twice
    if not firsts.isStreaming:
        firsts = firsts.localCheckpoint(eager=True)
    tos = events.filter(F.col(type_col) == to_type).select(
        key_col, F.col(ts_col).cast("long").alias("__tt")
    )
    conv = (
        firsts.join(tos, key_col)
        .filter(
            (F.col("__tt") > F.col("t0"))
            & (F.col("__tt") <= F.col("t0") + F.lit(window))
        )
        .groupBy(key_col)
        .agg(F.min("__tt").alias("t1"))
    )
    return firsts.join(conv, key_col, "left").select(
        key_col,
        "t0",
        "t1",
        (F.col("t1") - F.col("t0")).alias("delay"),
    )
