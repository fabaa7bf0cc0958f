"""Custom stateful streaming operator via applyInPandasWithState:
gap-based sessionization (the streaming twin of suite.temporal
zz_e01_sessionization — same semantics, unbounded input).

State per user: (last_event_ts, sessions_so_far). Each micro-batch
sorts its rows (file/kafka sources don't guarantee order within a
batch), continues the session count across batches through the state
store, and emits (user_id, event_id, session_id) rows. This is the
`flatMapGroupsWithState` pattern the reference would need for C1-style
tip tracking, expressed Arrow-batched in Python.

Ordering contract: within a micro-batch rows may arrive in any order
(sorted here); ACROSS batches the source must deliver events roughly
time-ordered — a batch whose events predate the stored last_ts joins
the current session rather than retro-splitting (standard streaming
semantics; add a watermark + append-mode reprocessing for late data)."""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_GAP_NS = 1_800_000_000_000  # 30 min

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("session_id", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("last_ts", LongType()), StructField("n_sessions", LongType())]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    last_ts, n_sessions = state.get if state.exists else (None, 0)
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out_event, out_session = [], []
    for ts, event_id in zip(rows["ts"], rows["event_id"]):
        if last_ts is None or ts - last_ts > SESSION_GAP_NS:
            n_sessions += 1
        last_ts = ts
        out_event.append(event_id)
        out_session.append(n_sessions)
    state.update((int(last_ts), int(n_sessions)))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": out_event,
            "session_id": out_session,
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts[nanos]) → (user_id, event_id,
    session_id), stateful across micro-batches. Works on both streaming
    and batch DataFrames (batch = one "micro-batch" with empty state,
    which makes the operator unit-testable without a stream)."""
    return events.select("user_id", "event_id", "ts").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Ship this module by VALUE to Spark python workers (they don't share the
# driver's sys.path; see functions/crypto.py for the same pattern).
try:  # pragma: no cover
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; --py-files is the fallback
    pass


EWMA_A_NUM = 1
EWMA_A_DEN = 4

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("v", LongType()),
        StructField("s", LongType()),
        StructField("resid", LongType()),
    ]
)

EWMA_STATE_SCHEMA = StructType([StructField("last_s", LongType())])


def _ewma_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    (last_s,) = state.get if state.exists else (None,)
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out_event, out_v, out_s, out_r = [], [], [], []
    for event_id, v in zip(rows["event_id"], rows["v"]):
        v = int(v)
        if last_s is None:
            last_s = v
        else:
            last_s = (
                EWMA_A_NUM * v + (EWMA_A_DEN - EWMA_A_NUM) * last_s
            ) // EWMA_A_DEN
        out_event.append(event_id)
        out_v.append(v)
        out_s.append(last_s)
        out_r.append(v - last_s)
    state.update((int(last_s),))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": out_event,
            "v": out_v,
            "s": out_s,
            "resid": out_r,
        }
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts[nanos], v[int]) → per-row running
    EWMA states + residuals, stateful across micro-batches — the
    STREAMING twin of `cumulative.ewma_states` (same recurrence
    s₀=v₀, sᵢ=(vᵢ+3·sᵢ₋₁) div 4; state per key = ONE int64, the
    anomaly-score shape for continuous quality monitoring).

    Same ordering contract as `sessionize_stream`: rows sort within a
    micro-batch; across batches the source must deliver roughly
    time-ordered data (a late row continues from the stored state
    rather than retro-folding). Works on batch DataFrames too (one
    "micro-batch", empty state) — which is what pins it equal to the
    batch operator in pytest."""
    return events.select("user_id", "event_id", "ts", "v").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _ewma_group,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_FINAL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_WINDOW_STATE = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _session_window_group_fn(gap_ms: int):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        cols = ("session_start_ms", "session_end_ms", "n_events")
        if state.hasTimedOut:
            # watermark passed last_ms + gap with no new data for this
            # key: the open session is FINAL — emit it and evict the
            # state (this is the path the rate-source test pins; a
            # NoTimeout operator would hold the state forever)
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [last_ms],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ms")
        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        closed = []
        for ms in rows["ms"]:
            ms = int(ms)
            if last_ms is None:
                start_ms, last_ms, n = ms, ms, 1
            elif ms - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = ms, ms, 1
            else:
                # out-of-order within the watermark delay: extend the
                # open session without regressing its bounds
                start_ms = min(start_ms, ms)
                last_ms = max(last_ms, ms)
                n += 1
        timeout = last_ms + gap_ms
        if timeout <= state.getCurrentWatermarkMs():
            # the open session is already past eviction (a whole gap of
            # event time arrived in one batch): finalize immediately —
            # setTimeoutTimestamp would reject a timestamp ≤ watermark
            closed.append((start_ms, last_ms, n))
            if state.exists:
                state.remove()
        else:
            state.update((int(start_ms), int(last_ms), int(n)))
            state.setTimeoutTimestamp(timeout)
        yield pd.DataFrame(
            {
                "user_id": user_id,
                **{c: [row[i] for row in closed] for i, c in enumerate(cols)},
            }
        )

    return _fn


def session_window_stream(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_NS // 1_000_000,
    time_col: str = "event_time",
) -> DataFrame:
    """events(user_id, `time_col` timestamp, watermark REQUIRED) →
    FINALIZED session windows (user_id, session_start_ms,
    session_end_ms, n_events), one row per session, emitted exactly when
    the watermark proves no more events can join it — the session-window
    rollup with WATERMARK-CORRECT STATE EVICTION (EventTimeTimeout), vs
    `sessionize_stream`'s per-event labeling that keeps state forever.

    A session closes through one of two paths: (a) a later event beyond
    the gap arrives for the same key (closed in-line), or (b) the key
    goes quiet and the watermark passes last_event + gap (the timeout
    fires, the state is evicted). Late events within the watermark delay
    merge into the open session even when they arrive out of order;
    events later than the delay are the caller's contract to bound
    (delay < gap keeps sessions unsplittable).

    Reference frame: the tip-tracking cache eviction the reference's
    scheduler does by block depth (StreamScheduler.scala:25-64) — here
    by event-time watermark, the Spark-native bound."""
    prepared = events.select(
        "user_id",
        F.col(time_col).alias("event_time"),
        F.unix_millis(F.col(time_col)).alias("ms"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_window_group_fn(gap_ms),
        outputStructType=SESSION_FINAL_SCHEMA,
        stateStructType=SESSION_WINDOW_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("state", StringType()),
        StructField("version", LongType()),
        StructField("valid_from", LongType()),
        StructField("valid_to", LongType()),
        StructField("n_events", LongType()),
    ]
)

SCD2_STATE_SCHEMA = StructType(
    [
        StructField("cur_state", StringType()),
        StructField("version", LongType()),
        StructField("valid_from", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _scd2_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    cur_state, version, valid_from, n_events = (
        state.get if state.exists else (None, 0, None, 0)
    )
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = {k: [] for k in ("state", "version", "valid_from", "valid_to", "n_events")}
    for ts, st in zip(rows["ts"], rows["state"]):
        ts = int(ts)
        if cur_state is None:
            cur_state, version, valid_from, n_events = st, 1, ts, 1
        elif st == cur_state:
            n_events += 1
        else:
            # the new run's start CLOSES the previous one (end-exclusive)
            out["state"].append(cur_state)
            out["version"].append(version)
            out["valid_from"].append(valid_from)
            out["valid_to"].append(ts)
            out["n_events"].append(n_events)
            cur_state, version, valid_from, n_events = st, version + 1, ts, 1
    state.update((cur_state, int(version), int(valid_from), int(n_events)))
    yield pd.DataFrame({"user_id": user_id, **out})


def scd2_stream(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts[nanos], state) → CLOSED SCD2
    intervals, stateful across micro-batches — the STREAMING twin of
    `intervals.scd2_intervals`: an interval is emitted exactly when a
    later event changes the entity's state (append-mode streaming can
    only ever emit closed facts); the open run lives in the state store
    (one small tuple per key). Streamed closed intervals == the batch
    operator's `is_current = false` rows for any time-ordered
    micro-batch split — pinned in pytest.

    Same ordering contract as the other stateful twins: rows sort
    within a micro-batch; across batches the source delivers roughly
    time-ordered data."""
    return events.select("user_id", "event_id", "ts", "state").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _scd2_group,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4.x stateful-processor API)
# ---------------------------------------------------------------------------


def _load_stateful_processor_cls():
    """The StatefulProcessor import is deferred so the module loads on
    runtimes without the API (it exists from Spark 4.0 and needs the
    RocksDB state-store provider plus python protobuf at run time);
    `session_window_tws` raises ImportError there — callers that must
    degrade use `session_window_stream`, the GroupState twin with the
    same output contract."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _SessionWindowProcessor(StatefulProcessor):
        """Session windows with watermark eviction on the modern
        stateful-processor API — the semantics twin of
        `session_window_stream` (same finalized rows), expressed with
        ValueState + explicit event-time TIMERS instead of
        GroupState.setTimeoutTimestamp. One open-session tuple per key;
        the timer at last_event + gap is re-registered as the session
        extends (the stale timer is deleted) and fires exactly when the
        watermark proves the session closed."""

        def __init__(self, gap_ms: int):
            self.gap_ms = gap_ms

        def init(self, handle):
            self.handle = handle
            self.state = handle.getValueState(
                "open_session",
                "start_ms LONG, last_ms LONG, n_events LONG",
            )

        def _final_row(self, user_id, start_ms, last_ms, n):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [last_ms],
                    "n_events": [n],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            got = self.state.get() if self.state.exists() else None
            start_ms, last_ms, n = got if got else (None, None, 0)
            stale_timer = (
                last_ms + self.gap_ms if last_ms is not None else None
            )
            closed = []
            # sort across ALL Arrow chunks, not per chunk: a group whose
            # micro-batch rows span chunk boundaries with out-of-order
            # times would otherwise merge sessions the GroupState twin
            # (global pd.concat + sort) correctly splits
            for ms in sorted(int(m) for pdf in rows for m in pdf["ms"]):
                if last_ms is None:
                    start_ms, last_ms, n = ms, ms, 1
                elif ms - last_ms > self.gap_ms:
                    closed.append((start_ms, last_ms, n))
                    start_ms, last_ms, n = ms, ms, 1
                else:
                    start_ms = min(start_ms, ms)
                    last_ms = max(last_ms, ms)
                    n += 1
            timeout = last_ms + self.gap_ms
            if stale_timer is not None and stale_timer != timeout:
                self.handle.deleteTimer(stale_timer)
            if timeout <= timerValues.getCurrentWatermarkInMs():
                # a whole gap of event time arrived within one batch:
                # the open session is already evictable — finalize now
                closed.append((start_ms, last_ms, n))
                self.state.clear()
            else:
                self.state.update((int(start_ms), int(last_ms), int(n)))
                self.handle.registerTimer(timeout)
            for c in closed:
                yield self._final_row(user_id, *c)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            got = self.state.get() if self.state.exists() else None
            if got is not None:
                self.state.clear()
                yield self._final_row(user_id, *got)

        def close(self):
            pass

    return _SessionWindowProcessor


def session_window_tws(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_NS // 1_000_000,
    time_col: str = "event_time",
) -> DataFrame:
    """`session_window_stream` on `transformWithStateInPandas` — same
    contract (watermarked events in, finalized session windows out, one
    row per session at eviction time), same output schema, pinned equal
    to the GroupState twin in pytest. Requires the RocksDB state-store
    provider (`spark.sql.streaming.stateStore.providerClass` →
    RocksDBStateStoreProvider), which is what a 100 TB deployment runs
    anyway: RocksDB state scales past executor heap and supports
    changelog checkpointing, where the default HDFS-backed store holds
    every key in memory."""
    proc_cls = _load_stateful_processor_cls()
    prepared = events.select(
        "user_id",
        F.col(time_col).alias("event_time"),
        F.unix_millis(F.col(time_col)).alias("ms"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(gap_ms),
        outputStructType=SESSION_FINAL_SCHEMA,
        outputMode="append",
        timeMode="EventTime",
    )
