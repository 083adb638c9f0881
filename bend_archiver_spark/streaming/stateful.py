"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The streaming twin of queries/sessions.py: per-user session state
(start, last-seen, count) lives in the state store; events extend the
open session, a gap closes it, and a processing-time timeout flushes
sessions for users who go quiet. This is the pattern the engine offers
for any custom stateful operator Spark lacks natively — Arrow-batched
per-group pandas with explicit state, the streaming analog of
``applyInPandas``.

Scale notes: state is partitioned by user (one shuffle), bounded by
the timeout (quiet users are flushed and dropped), and each
micro-batch touches only the groups present in it plus timed-out
state — the standard sizing model for 100 TB event streams.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .timecol import ensure_event_time

__all__ = ["sessionize_stream", "SESSION_OUTPUT_SCHEMA"]

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_func(gap_sec: int, timeout_ms: int):
    gap_us = gap_sec * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_us, last_us, n)

        if state.hasTimedOut:
            # quiet user: flush the open session and drop state
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(v) for v in pdf["ts"].astype("int64") // 1000
                )
            ts_us.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = ts_us[0]
                n = 0
            for t_us in ts_us:
                if n > 0 and t_us - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, n = t_us, 0
                last_us = t_us
                n += 1
            state.update((start_us, last_us, n))
            if timeout_ms > 0:
                state.setTimeoutDuration(timeout_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        datetime.utcfromtimestamp(s / 1e6) for s, _, _ in closed
                    ],
                    "session_end": [
                        datetime.utcfromtimestamp(e / 1e6) for _, e, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_min: int = 30,
    timeout_ms: int = 60_000,
) -> DataFrame:
    """Streaming sessionization: emits each CLOSED session exactly once
    (a session closes when a later event exceeds the gap, or the user's
    state times out). Input needs ``user_id`` and timestamp ``ts``.

    ``timeout_ms=0`` disables the processing-time timeout — required
    for drain-style runs (``trigger(availableNow=True)``), where a
    pending timeout keeps the query scheduling empty micro-batches
    forever instead of terminating. Use a positive timeout only for
    always-on streams, where it flushes sessions of quiet users.
    """
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        ensure_event_time(events.select("user_id", "ts"), "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_min * 60, timeout_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
