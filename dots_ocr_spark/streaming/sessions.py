"""Event-time streaming operators over the events stream.

Two patterns the batch engine's A7 sessionization maps onto in
Structured Streaming:

  * ``stream_window_counts`` — tumbling event-time window aggregation
    with a watermark: the built-in path; late rows beyond the watermark
    are dropped, windows emit once closed (append mode).
  * ``stream_sessionize`` — custom stateful operator via
    ``applyInPandasWithState``: per-user session tracking (30-min
    inactivity gap, matching queries.q_sessionize) with explicit state
    carried across micro-batches and an event-time timeout that flushes
    a user's final session when the watermark passes it.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def _events_stream(spark: SparkSession, input_dir: str,
                   max_files: int | None) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    return reader.load(input_dir)


def stream_window_counts(spark: SparkSession, input_dir: str,
                         output_dir: str, checkpoint_dir: str,
                         window: str = "1 hour",
                         watermark: str = "30 minutes",
                         max_files: int | None = None):
    """Tumbling-window per-event-type counts with late-data watermark;
    append mode emits each window exactly once, when it closes."""
    events = _events_stream(spark, input_dir, max_files)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
             .cast("double").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "total_value")
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


SESSION_OUT_SCHEMA = ("user_id long, session_id long, n_events long, "
                      "first_ts timestamp, last_ts timestamp, final boolean")
SESSION_STATE_SCHEMA = ("session_id long, n_events long, "
                        "first_us long, last_us long")


def _sessionize_group(key, pdf_iter, state: GroupState):
    """applyInPandasWithState body: fold this micro-batch's events for one
    user into the carried (session_id, n_events, first_us, last_us) state,
    emitting a row per closed session plus the live session's snapshot.
    On event-time timeout the live session flushes as final."""
    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            session_id, n_events, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id], "session_id": [session_id],
                "n_events": [n_events],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "final": [True],
            })
        return

    if state.exists:
        session_id, n_events, first_us, last_us = state.get
    else:
        session_id, n_events, first_us, last_us = 0, 0, None, None

    closed = []
    ts_all = []
    for pdf in pdf_iter:
        for ts in pdf["ts"]:
            ts_all.append(ts)
    ts_all.sort()
    for ts in ts_all:
        us = int(pd.Timestamp(ts).value // 1000)
        if last_us is not None and us <= last_us:
            # late-but-within-watermark arrival (a prior micro-batch
            # already advanced last_us past this event): fold it into the
            # LIVE session without moving time backwards — last_us going
            # backwards would both miscount session breaks and make the
            # event-time timeout regress below the watermark. A late
            # event never reopens a closed session (the standard
            # session-window approximation for in-watermark disorder).
            n_events += 1
            if first_us is not None and us < first_us:
                first_us = us
            continue
        if last_us is not None and us - last_us > SESSION_GAP_S * 1_000_000:
            closed.append((session_id, n_events, first_us, last_us, True))
            session_id += 1
            n_events, first_us = 0, us
        if first_us is None:
            first_us = us
        n_events += 1
        last_us = us

    state.update((session_id, n_events, first_us, last_us))
    # the timeout must never sit at/below the current watermark — Spark
    # raises (and kills the query) on such a request, which can happen
    # when this batch delivered only old-but-valid events for this user
    timeout_ms = last_us // 1000 + SESSION_GAP_S * 1000
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

    rows = closed + [(session_id, n_events, first_us, last_us, False)]
    yield pd.DataFrame({
        "user_id": [user_id] * len(rows),
        "session_id": [r[0] for r in rows],
        "n_events": [r[1] for r in rows],
        "first_ts": [pd.Timestamp(r[2], unit="us") for r in rows],
        "last_ts": [pd.Timestamp(r[3], unit="us") for r in rows],
        "final": [r[4] for r in rows],
    })


def stream_sessionize(spark: SparkSession, input_dir: str, output_dir: str,
                      checkpoint_dir: str, watermark: str = "1 hour",
                      max_files: int | None = None):
    """Custom stateful streaming sessionization (the A7 session-window
    semantics of queries.q_sessionize as an incremental operator)."""
    events = _events_stream(spark, input_dir, max_files)
    sessions = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
