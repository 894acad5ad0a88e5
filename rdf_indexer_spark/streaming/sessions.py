"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the arbitrary-state API the built-in windowed
aggs can't express).

Semantics: per ``user_id``, consecutive events belong to one session while
the gap between them is ≤ ``gap_minutes``; a longer gap closes the session.
Sessions closed *within* a micro-batch emit immediately; the trailing open
session is held in state with an event-time timeout at ``last + gap``, so
once the watermark passes it the session flushes in a later batch. State is
bounded: one fixed-width row per active user, removed on flush — safe for
an unbounded stream.

The reference has no streaming at all (SURVEY.md §2.J); this is part of the
engine's live-corpus surface alongside streaming/events.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, s double"


def _emit(user: int, sessions: list[tuple[int, int, int, float]]) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": [user] * len(sessions),
        "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _ in sessions],
        "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _ in sessions],
        "n_events": [n for _, _, n, _ in sessions],
        "sum_value": [v for _, _, _, v in sessions],
    })


def _session_fn(gap_ms: int):
    def fn(key, pdfs, state: GroupState):
        user = int(key[0])
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield _emit(user, [(start, last, n, s)])
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_ms = rows["ts"].astype("int64") // 10**6
        start = last = n = s = None
        if state.exists:
            start, last, n, s = state.get
        closed: list[tuple[int, int, int, float]] = []
        for t, v in zip(ts_ms, rows["value"]):
            t = int(t)
            if start is None:
                start, last, n, s = t, t, 1, float(v)
            elif t - last > gap_ms:
                closed.append((start, last, n, s))
                start, last, n, s = t, t, 1, float(v)
            else:
                # an in-gap late event older than the open session's start
                # still belongs to it — extend the start downward so the
                # output matches sessionize_batch on out-of-order input
                start = min(start, t)
                last = max(last, t)
                n += 1
                s += float(v)
        state.update((int(start), int(last), int(n), float(s)))
        # Spark requires the timeout to be STRICTLY greater than the current
        # watermark; clamp up by 1ms when last+gap has already been passed
        timeout = int(last) + gap_ms
        wm = state.getCurrentWatermarkMs()
        if timeout <= wm:
            timeout = wm + 1
        state.setTimeoutTimestamp(timeout)
        if closed:
            yield _emit(user, closed)

    return fn


def sessionize_events(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(ts, user_id, value) stream → closed-session rows (append mode)."""
    gap_ms = gap_minutes * 60 * 1000
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin of :func:`sessionize_events` (EVERY session, including the
    trailing one) — declarative: a gap flag + running session id per user,
    then one groupBy. Used by the equivalence test; also useful standalone
    for backfills."""
    from pyspark.sql.window import Window

    gap_ms = gap_minutes * 60 * 1000
    w = Window.partitionBy("user_id").orderBy("ts")
    ts_ms = (F.col("ts").cast("timestamp").cast("double") * 1000).cast("long")
    d = (
        df.withColumn("_ts_ms", ts_ms)
        .withColumn("_prev", F.lag("_ts_ms").over(w))
        .withColumn(
            "_new_sess",
            (F.col("_prev").isNull() | (F.col("_ts_ms") - F.col("_prev") > gap_ms)).cast("long"),
        )
        .withColumn("_sess", F.sum("_new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        d.groupBy("user_id", "_sess")
        .agg(
            F.min(F.col("ts").cast("timestamp")).alias("session_start"),
            F.max(F.col("ts").cast("timestamp")).alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("_sess")
    )
