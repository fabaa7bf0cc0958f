"""Watermarked event-time windows: finalized results equal the batch
computation; a too-late row is dropped by the watermark."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ergo_uexplorer_spark.streaming.windows import (
    session_windows,
    tumbling_counts,
    with_event_time,
)

HOUR_NS = 3_600_000_000_000
BASE = 1_700_000_000_000_000_000  # aligned-ish epoch nanos


def _write(path, rows):
    with open(path, "w") as f:
        for u, t, ts, v in rows:
            f.write(
                json.dumps(
                    {"user_id": u, "event_type": t, "ts": ts, "value": v}
                )
                + "\n"
            )


def _run_stream(spark, src_dir, ck_dir, builder, name):
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    q = (
        builder(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ck_dir))
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join: the streamed result over
    micro-batched files equals the batch join of the same data; pairs
    outside the [l_time, l_time + bound] interval or across keys never
    appear. Both sides are watermarked so buffered state is evictable."""
    import json as _json
    import time as _time

    from ergo_uexplorer_spark.streaming.windows import interval_join_streams

    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()

    def w(path, rows):
        with open(path, "w") as f:
            for eid, u, ts in rows:
                f.write(_json.dumps(
                    {"event_id": eid, "user_id": u, "ts": ts}) + "\n")

    # left: clicks; right: conversions. u1 converts within the bound
    # (twice: at +10min and +50min), u2 converts too late (+2h), u3
    # converts for a DIFFERENT user's click only.
    w(ldir / "b0.json", [(100, 1, BASE), (101, 2, BASE)])
    w(rdir / "b0.json", [(200, 1, BASE + HOUR_NS // 6),
                         (201, 1, BASE + 5 * HOUR_NS // 6)])
    _time.sleep(1.1)
    w(ldir / "b1.json", [(102, 3, BASE + 10 * HOUR_NS)])  # advances wm
    w(rdir / "b1.json", [(202, 2, BASE + 2 * HOUR_NS),
                         (203, 4, BASE + HOUR_NS // 6)])

    schema = "event_id long, user_id long, ts long"

    def src(d):
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).json(str(d)))

    q = (
        interval_join_streams(src(ldir), src(rdir), bound_seconds=3600)
        .writeStream.format("memory").queryName("ssj")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_ssj")).start()
    )
    q.awaitTermination(180)
    streamed = {(r["l_id"], r["r_id"])
                for r in spark.sql("select * from ssj").collect()}

    batch_l = spark.read.schema(schema).json(str(ldir))
    batch_r = spark.read.schema(schema).json(str(rdir))
    expected = {
        (r["l_id"], r["r_id"])
        for r in interval_join_streams(batch_l, batch_r,
                                       bound_seconds=3600).collect()
    }
    assert expected == {(100, 200), (100, 201)}
    assert streamed == expected


def test_tumbling_watermark_finalizes_windows(spark, tmp_path):
    """Append-mode guarantees under watermarks: a window emits exactly
    once, only after the watermark passes its end; windows still inside
    the horizon never emit; doornail-late rows arriving well after
    finalization do not resurrect an emitted window. (Spark's lateness
    drop is best-effort one batch behind — the hard guarantee is
    no-reemission, which is what downstream consumers rely on.)"""
    src = tmp_path / "src"
    src.mkdir()
    import time as _time

    # batch 0: two events in hour-window W0, one in W1
    _write(src / "b0.json", [
        (1, "click", BASE, 1.0),
        (2, "click", BASE + HOUR_NS // 2, 2.0),
        (1, "view", BASE + HOUR_NS + 1, 3.0),
    ])
    _time.sleep(1.1)
    # batch 1: jump event time far beyond the watermark horizon → W0/W1
    # finalize in a later batch
    _write(src / "b1.json", [(3, "click", BASE + 10 * HOUR_NS, 4.0)])
    _time.sleep(1.1)
    _write(src / "b2.json", [(4, "view", BASE + 11 * HOUR_NS, 5.0)])
    _time.sleep(1.1)
    # batch 3: a doornail-late click for long-finalized W0
    _write(src / "b3.json", [(9, "click", BASE + 1, 99.0)])
    out = _run_stream(
        spark, src, tmp_path / "ck",
        lambda s: tumbling_counts(s, "1 hour", "2 hours"), "wm_tumble",
    )
    rows = [
        (r["window_start"], r["event_type"], r["n_events"])
        for r in out.collect()
    ]
    keys = [(w, t) for w, t, _ in rows]
    # exactly-once emission: no window/group appears twice
    assert len(keys) == len(set(keys)), f"re-emitted window: {rows}"
    # W0 and W1 finalized
    finalized = {(t, n) for _, t, n in rows}
    assert ("click", 2) in finalized, rows
    assert ("view", 1) in finalized, rows
    # the last-batch windows (10h/11h clicks) are still open → not emitted
    assert all(n <= 2 for _, _, n in rows), rows


def test_session_windows_match_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    GAP = 1_800_000_000_000
    rows = [
        (1, "click", BASE, 1.0),
        (1, "click", BASE + GAP // 2, 1.0),       # same session
        (1, "click", BASE + 3 * GAP, 1.0),        # new session
        (2, "view", BASE, 1.0),
        # sentinel far in the future so watermark closes everything above
        (99, "view", BASE + 100 * GAP, 0.0),
    ]
    _write(src / "b0.json", rows[:4])
    import time as _time

    _time.sleep(1.1)
    _write(src / "b1.json", rows[4:])
    out = _run_stream(
        spark, src, tmp_path / "ck2",
        lambda s: session_windows(s, "30 minutes", "1 hour"), "wm_sess",
    )
    got = {
        (r["user_id"], r["n_events"]) for r in out.collect() if r["user_id"] != 99
    }
    assert got == {(1, 2), (1, 1), (2, 1)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids across micro-batches (redelivered upstream)
    emit exactly once; state is evicted by the watermark."""
    from ergo_uexplorer_spark.streaming.windows import dedup_stream

    src = tmp_path / "dd_src"
    src.mkdir()
    rows1 = [(1, "a", BASE + i * HOUR_NS // 10, 1.0) for i in range(6)]
    rows2 = rows1[3:] + [  # batch 2 redelivers 3 rows, adds 3 new
        (1, "a", BASE + (6 + i) * HOUR_NS // 10, 1.0) for i in range(3)
    ]
    # event_id = deterministic from ts so redelivery means same id
    def _w(path, rows):
        with open(path, "w") as f:
            for u, t, ts, v in rows:
                f.write(
                    json.dumps(
                        {"event_id": ts, "user_id": u, "event_type": t,
                         "ts": ts, "value": v}
                    )
                    + "\n"
                )

    _w(src / "b0.json", rows1)
    _w(src / "b1.json", rows2)
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = dedup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dd_ck"))
        .start()
    )
    q.awaitTermination(300)
    got = [r["event_id"] for r in spark.sql("select * from dd_out").collect()]
    assert len(got) == len(set(got)) == 9  # 6 + 3 new, redelivery deduped


def test_sliding_distinct_users_matches_batch(spark, tmp_path):
    """Streaming sliding-window exact distinct (two chained stateful
    operators: watermarked dedup → count) equals the batch computation
    for every FINALIZED window; users seen twice in one window count
    once; the final far-future event advances the watermark so the
    early windows emit."""
    import time as _time

    from ergo_uexplorer_spark.streaming.windows import (
        sliding_distinct_users,
    )

    Q_NS = 900_000_000_000  # 15 min
    src = tmp_path / "src"
    src.mkdir()
    _write(src / "b0.json", [
        (1, "click", BASE + 1, 1.0),
        (1, "click", BASE + 2 * Q_NS, 1.0),   # same user, same windows
        (2, "view", BASE + Q_NS, 1.0),
        (3, "view", BASE + 3 * Q_NS + 5, 1.0),
    ])
    _time.sleep(1.1)
    _write(src / "b1.json", [(9, "click", BASE + 30 * HOUR_NS, 1.0)])
    out = _run_stream(
        spark, src, tmp_path / "ck",
        lambda s: sliding_distinct_users(s), "wm_sliding",
    )
    streamed = {
        (r["window_start_ns"], r["n_users"]) for r in out.collect()
    }
    assert streamed, "no windows finalized"

    # batch truth over the SAME rows, same window spec (drop the last
    # far-future row's own windows: still open at stream end)
    batch = spark.createDataFrame(
        [(1, BASE + 1), (1, BASE + 2 * Q_NS), (2, BASE + Q_NS),
         (3, BASE + 3 * Q_NS + 5), (9, BASE + 30 * HOUR_NS)],
        "user_id long, ts long",
    )
    expected = {
        (r["window_start_ns"], r["n_users"])
        for r in (
            with_event_time(batch)
            .groupBy(F.window("event_time", "1 hour", "15 minutes").alias("w"))
            .agg(F.count_distinct("user_id").alias("n_users"))
            .select(
                (F.unix_micros(F.col("w.start")) * F.lit(1000)).alias(
                    "window_start_ns"
                ),
                "n_users",
            )
        ).collect()
        if r["window_start_ns"] < BASE + 29 * HOUR_NS
    }
    assert streamed == expected


def test_stateful_eviction_under_rate_source(spark, tmp_path):
    """applyInPandasWithState under a REAL rate-limited continuous
    trigger with OUT-OF-ORDER event times: `session_window_stream`
    (EventTimeTimeout) must emit each finished user's session exactly
    once — evicted when the watermark passes last_event + gap — and the
    emitted window must equal the batch replay of that user's events.

    Construction: rate-source value v → user v//6, event minute v^1
    (adjacent values swap, so arrival order ≠ event order by up to one
    minute; watermark delay 2 min). Each user owns exactly minutes
    [6u, 6u+5] — one session of 6 events — and never appears again, so
    only watermark-driven TIMEOUT can finalize it (gap 10 min ≫ the
    1-min in-session spacing, and no later same-key event exists to
    close it in-line). If eviction never fires → zero rows; if it fires
    early → a partial session (n_events < 6) or a split (duplicate
    user) — all assertion failures."""
    import time

    from ergo_uexplorer_spark.streaming.stateful import (
        session_window_stream,
    )

    base_ms = 1_700_000_000_000
    gap_ms = 10 * 60_000

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 400)
        .option("numPartitions", 2)
        .load()
    )
    events = rate.select(
        (F.col("value") / 6).cast("long").alias("user_id"),
        F.timestamp_millis(
            F.lit(base_ms)
            + F.col("value").bitwiseXOR(F.lit(1)) * F.lit(60_000)
        ).alias("event_time"),
    ).withWatermark("event_time", "2 minutes")

    q = (
        session_window_stream(events, gap_ms=gap_ms)
        .writeStream.format("memory")
        .queryName("evicted_sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="300 milliseconds")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("SELECT * FROM evicted_sessions").count() >= 4:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM evicted_sessions").collect()
    finally:
        q.stop()

    assert len(rows) >= 4, "watermark eviction never fired"
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users)), "session split across evictions"
    for r in rows:
        u = r["user_id"]
        # batch replay of user u's six events (minutes 6u..6u+5 — the
        # v^1 swap permutes arrival order, not the event-time set)
        start = base_ms + 6 * u * 60_000
        assert r["n_events"] == 6, f"user {u}: partial session evicted"
        assert r["session_start_ms"] == start
        assert r["session_end_ms"] == start + 5 * 60_000


def test_session_window_tws_matches_groupstate_twin(spark, tmp_path):
    """`session_window_tws` (transformWithStateInPandas + RocksDB state
    store + event-time timers) must emit exactly the rows the GroupState
    twin emits for the same rate-source construction: one finalized
    session per finished user, identical window bounds, evicted by
    timer when the watermark passes last_event + gap.

    Gated on `google.protobuf`: the transformWithState Python state
    server speaks protobuf to the JVM, and the package is not installed
    in this sandbox (install-blocked, same class as delta-spark) — the
    rate-source eviction semantics themselves are pinned un-gated by
    test_stateful_eviction_under_rate_source on the GroupState twin."""
    import pytest as _pytest

    _pytest.importorskip("google.protobuf")
    import time

    from ergo_uexplorer_spark.streaming.stateful import session_window_tws

    base_ms = 1_700_000_000_000
    gap_ms = 10 * 60_000
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 400)
            .option("numPartitions", 2)
            .load()
        )
        events = rate.select(
            (F.col("value") / 6).cast("long").alias("user_id"),
            F.timestamp_millis(
                F.lit(base_ms)
                + F.col("value").bitwiseXOR(F.lit(1)) * F.lit(60_000)
            ).alias("event_time"),
        ).withWatermark("event_time", "2 minutes")

        q = (
            session_window_tws(events, gap_ms=gap_ms)
            .writeStream.format("memory")
            .queryName("tws_sessions")
            .option("checkpointLocation", str(tmp_path / "ck_tws"))
            .trigger(processingTime="300 milliseconds")
            .outputMode("append")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline:
                if spark.sql("SELECT * FROM tws_sessions").count() >= 4:
                    break
                time.sleep(0.5)
            rows = spark.sql("SELECT * FROM tws_sessions").collect()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    assert len(rows) >= 4, "timer eviction never fired"
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users)), "session split across timers"
    for r in rows:
        start = base_ms + 6 * r["user_id"] * 60_000
        assert r["n_events"] == 6
        assert r["session_start_ms"] == start
        assert r["session_end_ms"] == start + 5 * 60_000
