"""Streaming session windows — ST7's gap-session shape, two ways.

The batch twin is the lag+cumsum ``sessionization`` query
(plans/timeseries.py). In streaming:

- ``stream_session_counts`` — the built-in ``session_window``
  aggregation: right whenever "a session" is just (start, end,
  count). State, merging and watermark eviction are all JVM-side.
- ``stream_sessionize_stateful`` — ``applyInPandasWithState``: the
  custom-state escape hatch for semantics session_window can't
  express (emit-on-close rows, per-user running session ordinals).
- ``stream_sessionize_tws`` — the SAME sessionizer on Spark 4's
  ``transformWithStateInPandas`` (typed ValueState, explicit timers,
  RocksDB provider) — the API new stateful operators should target;
  both custom variants share one merge loop
  (``_merge_session_events``), so their semantics are pinned by one
  set of tests. The TWS integration test is protobuf-gated: the
  Python<->JVM state protocol needs google.protobuf, absent in this
  container.
  Sessions are emitted when CLOSED, either by a later event more than
  ``gap`` after the session end, or by the event-time timeout firing
  once the watermark passes end+gap. State per user is three longs —
  bounded regardless of stream length; the watermark bounds how long
  an idle user's state survives.

Both run under availableNow for scheduled-batch drains (the
reference's 5-minute tick) and keep exactly-once output through the
checkpoint + idempotent-merge sink (jobs.foreach_batch_merge).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id string, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_STATE_SCHEMA = "start_us long, end_us long, n long"


def stream_session_counts(
    source: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Built-in gap sessions: one row per (key, session) with bounds
    and event count."""
    return (
        source.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def stream_sessionize_stateful(
    source: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "1 day",
) -> DataFrame:
    """Custom stateful sessionizer: emits one row per CLOSED session.

    A session closes when a later event for the key arrives more than
    ``gap_seconds`` after its end, or when the watermark passes
    end+gap (event-time timeout) — so trailing sessions emit without
    waiting for the user to return.

    Late-data semantics (state is ONE open session, three longs):
    events within ``gap`` of either session bound extend it (backward
    extension included); an event more than gap BEFORE the open
    session's start emits immediately as its own closed singleton
    session. Known deviation from the built-in ``session_window``:
    several such pre-session late events that would chain into one
    multi-event session emit as singletons instead — merging them
    needs unbounded interval-buffer state; use
    ``stream_session_counts`` when that matters.
    """
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(rows):
            return pd.DataFrame(
                rows,
                columns=["user_id", "session_start", "session_end", "n_events"],
            ).astype(
                {
                    "session_start": "datetime64[us]",
                    "session_end": "datetime64[us]",
                    "n_events": "int64",
                }
            )

        def to_ts(us):
            return pd.Timestamp(us, unit="us")

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield emit([(user_id, to_ts(start_us), to_ts(end_us), n)])
            return

        ts_us = (
            pd.concat([p[ts_col] for p in pdfs])
            .sort_values()
            .astype("datetime64[us]")
            .astype("int64")
        )
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = -1
            n = 0

        # gap close / backward extension / pre-session singleton —
        # the shared loop (also driven by the transformWithState twin)
        closed, start_us, end_us, n = _merge_session_events(
            user_id, ts_us, start_us, end_us, n, gap_us
        )
        state.update((start_us, end_us, n))
        # close the open session once event time moves past end+gap;
        # timeout must sit beyond the current watermark to register
        timeout_ms = max(
            end_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield emit(closed)

    return (
        source.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedupe(
    source: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Drop redelivered rows by key across micro-batches, keeping state
    only within the watermark horizon (dropDuplicatesWithinWatermark —
    bounded state, unlike a plain dropDuplicates stream whose state
    grows forever). The streaming face of the reference's
    at-least-once + idempotent-upsert contract: dedupe near the source,
    MERGE at the sink."""
    return source.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
) -> DataFrame:
    """Stream-stream inner join on ``key`` with an event-time interval
    condition: right.ts in [left.ts + lower, left.ts + upper].

    Both sides carry watermarks, and the interval bound on BOTH join
    columns lets Spark expire buffered state once the watermark passes
    the window — bounded state, the same discipline as the reference's
    "whole item recomputed on arrival" guarantee but for genuinely
    cross-stream correlation (e.g. match each error event to the
    deploys that preceded it). Columns are prefixed l_/r_ to keep the
    joined schema unambiguous."""
    lw = left.withWatermark(left_ts, watermark).select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (key, left_ts)
        ],
    )
    rw = right.withWatermark(right_ts, watermark).select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") + F.expr(f"INTERVAL {lower}"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "inner")


# ---------------------------------------------------------------------------
# Spark 4 transformWithState twin of the custom sessionizer
# ---------------------------------------------------------------------------

def _session_frame(rows) -> pd.DataFrame:
    return pd.DataFrame(
        rows,
        columns=["user_id", "session_start", "session_end", "n_events"],
    ).astype(
        {
            "session_start": "datetime64[us]",
            "session_end": "datetime64[us]",
            "n_events": "int64",
        }
    )


def _us_ts(us: int) -> pd.Timestamp:
    return pd.Timestamp(us, unit="us")


def _merge_session_events(user_id, ts_us, start_us, end_us, n, gap_us):
    """The session merge loop both stateful APIs share (gap close,
    backward extension, pre-session singleton): feed sorted event
    micros into the open (start, end, n) session; returns (closed
    session rows, new open session). Pure function — unit-tested
    directly, so the transformWithState wiring (which this container
    cannot execute, see stream_sessionize_tws) reuses semantics the
    GroupState integration test already pins."""
    closed = []
    for t in ts_us:
        if n == 0:
            start_us, end_us, n = t, t, 1
        elif t - end_us > gap_us:
            closed.append((user_id, _us_ts(start_us), _us_ts(end_us), n))
            start_us, end_us, n = t, t, 1
        elif start_us - t > gap_us:
            closed.append((user_id, _us_ts(t), _us_ts(t), 1))
        else:
            start_us = min(start_us, int(t))
            end_us = max(end_us, int(t))
            n += 1
    return closed, int(start_us), int(end_us), int(n)


try:  # pyspark >= 4.0 only; the applyInPandasWithState twin covers 3.x
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TwsSessionProcessor(StatefulProcessor):
        """``transformWithState`` sessionizer — IDENTICAL semantics to
        ``stream_sessionize_stateful`` (gap close, backward extension,
        pre-session singleton, event-time timeout) restated on Spark
        4's production state API: typed ValueState instead of the
        tuple blob, explicit timers instead of the single implicit
        GroupStateTimeout slot (timers accumulate, so each batch
        deletes the stale one before registering the new close time).
        Parity is pytest-pinned against the applyInPandasWithState
        twin on the same input."""

        def __init__(self, ts_col: str, gap_seconds: int):
            self._ts_col = ts_col
            self._gap_us = gap_seconds * 1_000_000
            self._gap_ms = gap_seconds * 1_000

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            ts_us = (
                pd.concat([p[self._ts_col] for p in rows])
                .sort_values()
                .astype("datetime64[us]")
                .astype("int64")
            )
            if self._state.exists():
                start_us, end_us, n = self._state.get()
            else:
                start_us = end_us = -1
                n = 0
            closed, start_us, end_us, n = _merge_session_events(
                user_id, ts_us, start_us, end_us, n, self._gap_us
            )
            self._state.update((start_us, end_us, n))
            # timers accumulate (unlike the GroupState timeout slot):
            # drop the previous close timer so an extension cannot be
            # closed early by a stale one
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                max(
                    end_us // 1000 + self._gap_ms,
                    timerValues.getCurrentWatermarkInMs() + 1,
                )
            )
            if closed:
                yield _session_frame(closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if self._state.exists():
                start_us, end_us, n = self._state.get()
                # guard against a stale timer surviving a restart: the
                # session only closes once its end + gap has passed
                if (
                    expiredTimerInfo.getExpiryTimeInMs()
                    >= end_us // 1000 + self._gap_ms
                ):
                    self._state.clear()
                    yield _session_frame(
                        [(user_id, _us_ts(start_us), _us_ts(end_us), n)]
                    )

        def close(self) -> None:
            pass

    def stream_sessionize_tws(
        source: DataFrame,
        ts_col: str = "ts",
        key_col: str = "user_id",
        gap_seconds: int = 1800,
        watermark: str = "1 day",
    ) -> DataFrame:
        """Spark 4 ``transformWithStateInPandas`` twin of
        ``stream_sessionize_stateful`` — the API new stateful
        operators should target (typed state variables, TTL, explicit
        timers, queryable state schema). Requires the RocksDB state
        store provider: set
        ``spark.sql.streaming.stateStore.providerClass`` to
        ``org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
        on the session running the query."""
        return (
            source.withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .transformWithStateInPandas(
                statefulProcessor=_TwsSessionProcessor(ts_col, gap_seconds),
                outputStructType=SESSION_SCHEMA,
                outputMode="append",
                timeMode="eventTime",
            )
        )

except ImportError:  # pragma: no cover - pyspark 3.x fallback
    stream_sessionize_tws = None
