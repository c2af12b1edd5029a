"""Custom stateful streaming operator: session windows per user via
applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2.9); this is the engine's
custom-stateful-operator pattern required of a training-data pipeline:
sessionize an event stream by inactivity gap, maintaining per-user state
(current session start / last-seen / aggregates) with a processing-time
timeout so idle users' sessions close without new input.

The same callable is unit-tested in batch form (sessionize_batch — identical
gap semantics expressed with windows) and wired for streams through
applyInPandasWithState; the test asserts the streaming operator over a
file-source AvailableNow run equals the batch sessionization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, s double"

GAP_SECONDS = 30 * 60


def _sessionize_state(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user stateful sessionizer. Emits a row per CLOSED session;
    the open session lives in state until the gap passes or timeout."""
    (user_id,) = key
    rows = []
    start, last, n, s = state.get if state.exists else (None, None, 0, 0.0)
    events = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
    if not events.empty:
        events = events.sort_values("ts")
        for ts, value in zip(events["ts"], events["value"]):
            t = int(ts.timestamp() * 1_000_000)
            if start is None:
                start, last, n, s = t, t, 1, float(value)
            elif t - last > GAP_SECONDS * 1_000_000:
                rows.append((user_id, start, last, n, s))
                start, last, n, s = t, t, 1, float(value)
            else:
                last, n, s = t, n + 1, s + float(value)
    if state.hasTimedOut:
        if start is not None:
            rows.append((user_id, start, last, n, s))
        state.remove()
    else:
        state.update((start, last, n, s))
        state.setTimeoutDuration(60 * 1000)
    if rows:
        out = pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events", "sum_value"]
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """events(user_id, ts, value) stream → closed sessions stream."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_state,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Batch reference implementation with identical semantics: session id =
    cumulative count of gap breaks per user (classic lag/cumsum windows)."""
    # parquet naive timestamps arrive as TIMESTAMP_NTZ; normalize (UTC session)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = (
        F.col("ts").cast("double")
        - F.lag(F.col("ts").cast("double"), 1).over(w)
    ) > gap_seconds
    sess = F.sum(F.when(F.coalesce(gap, F.lit(False)), 1).otherwise(0)).over(w)
    return (
        events.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("session_id")
    )
