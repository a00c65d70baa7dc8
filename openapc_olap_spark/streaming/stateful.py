"""Custom stateful streaming operator (SURVEY.md §2.9 X6 / brief:
"applyInPandasWithState for custom stateful operators").

``stateful_sessionize`` keeps ONE open session per user as explicit state
(start, last, count, sum) and emits a row whenever an inactivity gap closes
a session — the hand-rolled twin of the built-in ``session_window`` path in
``streaming.sessionized``, for session logic the built-in can't express
(custom close conditions, per-session derived features, caps).

Scale shape: state is O(active users), not O(events); each microbatch
shuffles only on user_id and the per-group work is Arrow-batched pandas.
Within a batch, events are sorted by event time; cross-batch late events are
NOT reordered (pair with a watermark + source-side ordering for that — the
built-in session_window path handles late data, this one trades that for
programmability).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),     # last event ts
    StructField("n_events", LongType()),
    StructField("value_sum", DoubleType()),
])

# (start_us, last_us, n, value_sum) — plain tuple state, epoch microseconds
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("vsum", DoubleType()),
])


def _session_fn(gap_us: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            start_us, last_us, n, vsum = state.get
        else:
            start_us = last_us = None
            n, vsum = 0, 0.0
        closed = []
        # concatenate the group's Arrow chunks BEFORE sorting: a group
        # larger than arrow.maxRecordsPerBatch arrives as multiple chunks
        # in shuffle order, and sorting each independently would treat an
        # older event in a later chunk as forward-in-time, fabricating
        # session splits. Memory is bounded by one user's events per
        # microbatch — the quantity the sessionizer must hold anyway.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0])
            pdf = pdf.sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000   # ns -> us
            for t, val in zip(ts_us, pdf["value"]):
                t = int(t)
                if last_us is None:
                    start_us, last_us, n, vsum = t, t, 1, float(val)
                elif t - last_us >= gap_us:               # gap closes session
                    closed.append((user, start_us, last_us, n, vsum))
                    start_us, last_us, n, vsum = t, t, 1, float(val)
                else:
                    last_us, n, vsum = t, n + 1, vsum + float(val)
        state.update((start_us, last_us, n, vsum))
        yield pd.DataFrame(
            {"user_id": [c[0] for c in closed],
             "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
             "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
             "n_events": [c[3] for c in closed],
             "value_sum": [round(c[4], 4) for c in closed]})
    return fn


def stateful_sessionize(events: DataFrame, gap: str = "6 hours",
                        user_col: str = "user_id") -> DataFrame:
    """Emit closed sessions (user_id, session_start, session_end, n_events,
    value_sum) from a streaming events frame. The session still open when
    input ends stays in state (it has not closed; the built-in path's final
    watermark flush differs here by design)."""
    amount, unit = gap.split()
    per = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
           "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    gap_us = int(amount) * per * 1_000_000
    return events.groupBy(user_col).applyInPandasWithState(
        _session_fn(gap_us), OUTPUT_SCHEMA, STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)
