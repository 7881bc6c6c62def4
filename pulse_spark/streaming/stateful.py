"""Custom stateful streaming operator: arbitrary-gap sessionization with
applyInPandasWithState.

The windowed aggregations in incremental.py cover fixed windows; session
windows with a data-dependent gap need USER state: per user, an open
session (start, last_ts, n, sum) lives in the state store across
micro-batches and is EMITTED when a later event closes it (gap
exceeded).  This is the Structured Streaming analog of
datapipe/events.sessionize — the batch twin is the correctness oracle in
tests (closed sessions must match it exactly).

Scale notes: state is keyed by user_id (uniform hash); each key holds a
fixed-size tuple, so the state store grows with ACTIVE users, not with
events.  Sessions still open at end-of-input stay in state (correct:
a stream never knows a session is over until the gap passes — tests
close them with sentinel events).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pulse_spark.datapipe.events import SESSION_GAP_MIN

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
OUT_SCHEMA = (
    "user_id long, session_start string, n_events long, sum_value double"
)
STATE_SCHEMA = "start double, last double, n long, s double"


def _fmt(epoch: float) -> str:
    from datetime import datetime, timezone

    return datetime.fromtimestamp(epoch, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def make_sessionizer(gap_min: int = SESSION_GAP_MIN):
    """Returns the applyInPandasWithState function: closes and emits
    sessions whose gap to the next event exceeds gap_min."""

    gap_sec = gap_min * 60

    def sessionize_user(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        out = []
        for ts, val in zip(rows["ts"], rows["value"]):
            # naive pandas timestamps are session-tz (UTC) wall time;
            # .timestamp() alone would interpret them as machine-local
            t = (ts.tz_localize("UTC") if ts.tzinfo is None else ts).timestamp()
            if last is None:
                start, last, n, s = t, t, 1, float(val)
            elif t - last > gap_sec:
                out.append((int(key[0]), _fmt(start), int(n), round(s, 6)))
                start, last, n, s = t, t, 1, float(val)
            else:
                # out-of-order ACROSS micro-batches (rows within a batch
                # are sorted above): an event with t < last folds into the
                # open session without moving its start forward or its
                # watermark backwards
                start = min(start, t)
                last = max(last, t)
                n += 1
                s += float(val)
        state.update((float(start), float(last), int(n), float(s)))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start", "n_events", "sum_value"]
        )

    return sessionize_user


def start_stateful_sessions(
    spark,
    input_dir: str,
    out_dir: str,
    gap_min: int = SESSION_GAP_MIN,
    trigger_available_now: bool = True,
):
    """Stream parquet files appearing in input_dir; append CLOSED sessions
    to out_dir/sessions as parquet (exactly-once via the checkpoint)."""
    import os

    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_min),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
