"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no event-time streaming (its "stream" is progressive
refinement, ``VerdictResultStream.java:17-42``); this module covers the
training-data-pipeline side: per-key state machines over unbounded
event streams that Spark's built-in windowed aggregations can't
express — gap-based sessionization with per-session aggregates emitted
on session CLOSE (not on trigger), and timeout-driven state eviction so
state size tracks ACTIVE keys, not all keys ever seen.

Scale design: state lives in the state store partitioned by key
(groupBy shuffle), one Arrow batch per key group per trigger; a
watermark bounds how late events may arrive, and ProcessingTime/
EventTime timeouts close idle sessions without waiting for the next
event of that key.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def session_schema(key_field: T.StructField) -> T.StructType:
    """Output schema: the key column keeps the INPUT's name and type."""
    return T.StructType(
        [
            key_field,
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )


# fixed default kept for callers that reference it directly
SESSION_SCHEMA = session_schema(T.StructField("user_id", T.LongType()))

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _ms(ts: pd.Series) -> pd.Series:
    return ts.astype("datetime64[ms]").astype("int64")


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming gap sessionization: one output row per CLOSED session.

    A session closes when a same-user event arrives more than
    ``gap_minutes`` after the last one, or when the event-time timeout
    fires (watermark passed last_event + gap) — so idle users' state is
    evicted, keeping the store proportional to ACTIVE sessions.

    Streaming DataFrames only (Spark rejects applyInPandasWithState in
    batch queries); for batch/backfill sessionization use the window
    sessionizer (``queries.sessionize_events``'s lag+gap pattern).
    """
    gap_ms = gap_minutes * 60_000
    out_schema = session_schema(events.schema[user_col])
    key_name = user_col

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int, int, float]] = []
        if state.hasTimedOut:
            start_ms, last_ms, n, sv = state.get
            closed.append((key[0], start_ms, last_ms, n, sv))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(ts_col)
            ts_ms = _ms(rows[ts_col]).to_numpy()
            vals = rows[value_col].fillna(0.0).to_numpy()
            if state.exists:
                start_ms, last_ms, n, sv = state.get
            else:
                start_ms, last_ms, n, sv = int(ts_ms[0]), int(ts_ms[0]), 0, 0.0
            for t, v in zip(ts_ms, vals):
                t = int(t)
                if n > 0 and t - last_ms > gap_ms:
                    closed.append((key[0], start_ms, last_ms, n, sv))
                    start_ms, n, sv = t, 0, 0.0
                elif n == 0:
                    start_ms = t
                last_ms, n, sv = t, n + 1, sv + float(v)
            state.update((start_ms, last_ms, n, sv))
            # evict once the watermark passes last_event + gap; a batch
            # of late-but-admissible events can put last+gap at or below
            # the current watermark, which Spark rejects — clamp just
            # past the watermark so the session closes on the next tick
            timeout = last_ms + gap_ms
            try:
                wm = state.getCurrentWatermarkMs()
            except Exception:
                wm = 0
            state.setTimeoutTimestamp(max(timeout, wm + 1))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=[key_name, "session_start", "session_end", "n_events", "sum_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="ms")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="ms")
            yield out

    # a NULL event time has no place on an event-time axis (NaT would
    # poison the state timeout with int64-min and fail every retry)
    stream = events.where(F.col(ts_col).isNotNull())
    if events.isStreaming:
        # watermarks need instant semantics: NTZ event times are taken
        # as session-local wall clock (the driver tables are NTZ)
        if isinstance(stream.schema[ts_col].dataType, T.TimestampNTZType):
            stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        stream = stream.withWatermark(ts_col, watermark)
    return stream.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
