"""Custom stateful streaming operator: gap-based session windows over an
event stream via applyInPandasWithState.

The batch equivalent (lag + cumulative counter) is the oracled `sessionize`
driver query; this is the Structured Streaming form — per-user state
carries the open session across micro-batches, a processing-time timeout
closes idle sessions.  Pattern from the PySpark guide's stateful section;
the reference has no streaming surface (SURVEY §2.9), so this is the
engine's scale path for continuous event feeds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start", T.LongType(), False),   # epoch sec
    T.StructField("session_end", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("closed", T.BooleanType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start", T.LongType()),
    T.StructField("last", T.LongType()),
    T.StructField("n", T.LongType()),
])


def sessionize_stream(events: DataFrame, gap_sec: int = 1800,
                      timeout_ms: int | None = 30_000) -> DataFrame:
    """events(user_id long, ts timestamp) → one row per CLOSED session plus
    a final open-session row on state timeout.

    State per user: (start, last, n).  An event farther than `gap_sec`
    from `last` closes the current session (emitted with closed=true) and
    opens a new one.  Idle users time out after `timeout_ms` processing
    time and flush their open session.

    timeout_ms=None disables timeouts (GroupStateTimeout.NoTimeout) —
    required for availableNow drains that must TERMINATE: with a pending
    processing-time timeout the trigger stays alive "cleaning up state"
    until the timeout fires.  Use a timeout only with continuous triggers.
    """

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([dict(user_id=user_id, session_start=start,
                                     session_end=last, n_events=n,
                                     closed=True)])
            return
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out = []
        ts_all = []
        for pdf in pdfs:
            ts_all.append(pdf["ts"].astype("int64") // 10 ** 9)
        for t in pd.concat(ts_all).sort_values():
            t = int(t)
            if start is None:
                start = last = t
                n = 1
            elif t - last > gap_sec:
                out.append(dict(user_id=user_id, session_start=start,
                                session_end=last, n_events=n, closed=True))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        state.update((start, last, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(out)

    conf = (GroupStateTimeout.ProcessingTimeTimeout if timeout_ms is not None
            else GroupStateTimeout.NoTimeout)
    return (events.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=SESSION_SCHEMA, stateStructType=_STATE_SCHEMA,
        outputMode="append", timeoutConf=conf))
