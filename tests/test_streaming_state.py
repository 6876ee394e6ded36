"""Event-time streaming gates: watermarked window aggregation matches the
batch equivalent for closed windows, and the applyInPandasWithState
sessionizer carries state across micro-batches, matching the batch
sessionization (queries.q_sessionize) for users whose sessions closed."""

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from dots_ocr_spark.streaming.sessions import (
    stream_sessionize,
    stream_window_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_window_counts_match_batch_for_closed_windows(spark, events, tmp_path):
    input_dir = str(tmp_path / "in")
    events.repartition(4).write.parquet(input_dir)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_window_counts(spark, input_dir, out, ckpt, max_files=4)
    q.awaitTermination(180)

    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got, "at least the early windows must have closed and emitted"

    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
             .cast("double").alias("v"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "v")
    )
    exp = {(str(r["ws"]), r["event_type"]): (r["n"], r["v"])
           for r in batch.collect()}
    # every emitted window must match the batch result exactly
    for k, v in got.items():
        assert exp[k] == v, k
    # and emission must cover everything strictly before the watermark
    max_emitted = max(k[0] for k in got)
    missing = [k for k in exp if k[0] < max_emitted and k not in got]
    assert not missing, missing


def test_sessionize_tolerates_late_in_watermark_events(spark, tmp_path):
    """A micro-batch delivering an event OLDER than the carried last_ts
    (late but inside the watermark) must neither move session time
    backwards nor request an event-time timeout below the watermark
    (which would kill the query); the late event folds into the live
    session."""
    import datetime as dt
    import time

    from dots_ocr_spark.streaming.sessions import EVENTS_SCHEMA

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)
    input_dir = str(tmp_path / "in")
    batch1 = [(1, m(0), 7, "click", 1.0, "{}"),
              (2, m(10), 7, "click", 1.0, "{}")]
    batch2 = [(3, m(5), 7, "click", 1.0, "{}"),    # LATE: before last_ts
              (4, m(20), 7, "click", 1.0, "{}")]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).repartition(1) \
        .write.mode("append").parquet(input_dir)
    time.sleep(1.1)  # distinct mod-times => deterministic file order
    spark.createDataFrame(batch2, EVENTS_SCHEMA).repartition(1) \
        .write.mode("append").parquet(input_dir)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_sessionize(spark, input_dir, out, ckpt, max_files=1)
    q.awaitTermination(120)

    res = spark.read.parquet(out).collect()
    assert res, "stream must emit snapshots, not die on the late batch"
    live = max((r for r in res if not r["final"]),
               key=lambda r: (r["session_id"], r["n_events"]))
    # all 4 events in one session (every gap < 30 min), time monotone
    assert live["session_id"] == 0
    assert live["n_events"] == 4
    assert live["last_ts"] == m(20)
    assert live["first_ts"] == m(0)


def test_stateful_sessionize_matches_batch(spark, events, tmp_path):
    input_dir = str(tmp_path / "in")
    # two landing batches split mid-stream: sessions spanning the split
    # exercise cross-micro-batch state carry
    cut = events.selectExpr("percentile(event_id, 0.5) p").first()["p"]
    events.where(F.col("event_id") <= cut).repartition(2) \
        .write.mode("append").parquet(input_dir)
    events.where(F.col("event_id") > cut).repartition(2) \
        .write.mode("append").parquet(input_dir)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_sessionize(spark, input_dir, out, ckpt, max_files=4)
    q.awaitTermination(240)

    res = spark.read.parquet(out)
    # per user take the LAST snapshot (largest session_id, then n_events):
    # sessions count = session_id + 1, events seen = sum over closed + live
    per_user = (
        res.groupBy("user_id")
        .agg(F.max("session_id").alias("max_sid"),
             F.sum(F.when(F.col("final"), F.col("n_events"))).alias("closed_events"))
    )

    from dots_ocr_spark import queries as Q
    batch = {r["user_id"]: (r["n_sessions"], r["n_events"])
             for r in Q.q_sessionize(spark, SF).collect()}

    got_counts = {r["user_id"]: r["max_sid"] for r in per_user.collect()}
    assert set(got_counts) == set(batch)
    for uid, max_sid in got_counts.items():
        # stream counts sessions 0-based; batch counts 1-based
        assert max_sid + 1 == batch[uid][0], uid

    # total events across closed+live snapshots per user == batch n_events
    last_live = (
        res.where(~F.col("final"))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("user_id")
            .orderBy(F.col("session_id").desc(), F.col("n_events").desc())))
        .where(F.col("rn") == 1)
        .select("user_id", "session_id", "n_events")
    )
    closed = res.where(F.col("final")).select("user_id", "session_id", "n_events")
    sid_done = {(r["user_id"], r["session_id"]) for r in closed.collect()}
    live_rows = [r for r in last_live.collect()
                 if (r["user_id"], r["session_id"]) not in sid_done]
    totals: dict = {}
    for r in closed.collect():
        totals[r["user_id"]] = totals.get(r["user_id"], 0) + r["n_events"]
    for r in live_rows:
        totals[r["user_id"]] = totals.get(r["user_id"], 0) + r["n_events"]
    for uid, n in totals.items():
        assert n == batch[uid][1], uid
