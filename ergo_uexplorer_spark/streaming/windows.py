"""Event-time windowed aggregation with watermarks — late data handled
by watermark eviction rather than the reference's rollback machinery
(SURVEY §2.6 notes the reference has no event-time windows at all; its
"late data" is only forks, handled by C3).

Input events carry `ts` as epoch nanos (the driver testdata shape);
the stream converts to a proper timestamp, bounds state with
`withWatermark`, and aggregates per tumbling/session window. Append mode
emits a window only once its watermark passes — the exactly-once analog
of the reference's per-epoch finalized stats."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """nanos long → TIMESTAMP event_time (micros precision)."""
    return events.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    )


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str = "event_type",
) -> DataFrame:
    """Windowed counts with bounded state: rows later than `watermark`
    behind the max seen event time are dropped, and closed windows are
    finalized (append mode) — state size is O(open windows × groups)."""
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_len), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "n_events",
            "value_cents",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Built-in session windows (gap-merged per user) — the declarative
    sibling of streaming/stateful.sessionize_stream, finalized by
    watermark instead of explicit state handling."""
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    bound_seconds: int = 3600,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked stream-stream interval join (the click⋈impression
    attribution shape): pair each left event with right events for the
    same `key` whose event time falls in [l_time, l_time + bound].

    BOTH sides carry watermarks and the join condition bounds the time
    range in both directions, so Spark can evict buffered state once the
    watermark passes the interval — state is O(events per key within
    the bound + watermark horizon), never O(stream history). Without
    the time bound a stream-stream join must buffer one side forever.
    Returns (key, l_id, r_id, l_time, r_time).
    """
    l = (
        with_event_time(left, ts_col)
        .select(
            F.col(key),
            F.col("event_id").alias("l_id"),
            F.col("event_time").alias("l_time"),
        )
        .withWatermark("l_time", watermark)
    )
    r = (
        with_event_time(right, ts_col)
        .select(
            F.col(key).alias("__rk"),
            F.col("event_id").alias("r_id"),
            F.col("event_time").alias("r_time"),
        )
        .withWatermark("r_time", watermark)
    )
    return l.join(
        r,
        (F.col(key) == F.col("__rk"))
        & (F.col("r_time") >= F.col("l_time"))
        & (
            F.col("r_time")
            <= F.col("l_time") + F.expr(f"INTERVAL {bound_seconds} SECONDS")
        ),
    ).select(key, "l_id", "r_id", "l_time", "r_time")


def dedup_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state — the ingestion-side
    twin of the batch `operators/dedup` family, and the shape a
    continuous training-data feed needs (at-least-once upstreams:
    re-crawls, redelivered queue messages). `dropDuplicatesWithinWatermark`
    keeps one row per key and evicts key state once the watermark passes
    it, so state is O(keys per watermark window), never O(stream); a
    plain `dropDuplicates` on a stream would grow state forever."""
    return (
        with_event_time(events, ts_col)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark([*id_cols])
    )


def sliding_distinct_users(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window EXACT distinct users — the streaming twin of the
    batch z38 entry. Streaming aggregation forbids count_distinct
    directly (distinct state would be unbounded per group), so this is
    the canonical two-stage form: watermark-bounded dropDuplicates on
    (window, user) collapses each user to one row per window, then a
    plain count per window — two chained stateful operators (Spark 4.x
    propagates the event-time watermark through the dedup into the
    aggregation), each with state bounded by the watermark horizon.
    Append mode: a window's count emits exactly once, after the
    watermark passes its end."""
    e = with_event_time(events, ts_col).withWatermark(
        "event_time", watermark
    )
    per_user = e.select(
        F.window("event_time", window_len, slide).alias("w"), "user_id"
    ).dropDuplicates(["w", "user_id"])
    return (
        per_user.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            (F.unix_micros(F.col("w.start")) * F.lit(1000)).alias(
                "window_start_ns"
            ),
            "n_users",
        )
    )
