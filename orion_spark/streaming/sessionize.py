"""Custom stateful streaming operator: event sessionization with
applyInPandasWithState (the `applyInPandasWithState` extension point for
operators Structured Streaming lacks natively).

Semantics: events per user are grouped into sessions closed after
`gap_seconds` of inactivity; when a session times out, ONE summary row is
emitted: (user_id, session_start, session_end, n_events, total_value).
Event-time + watermark driven, so replays are deterministic.

State per user = the open session aggregate (5 scalars) — bounded and tiny,
which is exactly what keeps a 1000-executor streaming job stable: state
size is O(active users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start bigint, last bigint, n int, total double"


def _sessionize_fn(
    gap_seconds: int,
):
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs))
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).sort_values()
        values = rows.loc[ts_ms.index, "value"]

        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = int(ts_ms.iloc[0]), int(ts_ms.iloc[0]), 0, 0.0

        closed = []
        for t, v in zip(ts_ms, values):
            if n > 0 and t - last > gap_ms:
                closed.append((start, last, n, total))
                start, n, total = int(t), 0, 0.0
            last = int(t)
            n += 1
            total += float(v)
        state.update((start, last, n, total))
        state.setTimeoutTimestamp(last + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _ in closed],
                    "n_events": [c for _, _, c, _ in closed],
                    "total_value": [t for _, _, _, t in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Apply the stateful sessionizer to a streaming events DataFrame."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
