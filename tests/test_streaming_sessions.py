"""Custom stateful streaming operator (applyInPandasWithState):
gap-sessionization — in-batch session closing, event-time-timeout flushes,
and batch-twin equivalence."""

import datetime as dt
import os

UTC = dt.timezone.utc


def _ts(h, m):
    return dt.datetime(2024, 1, 1, h, m, tzinfo=UTC)


def test_sessionize_stream_and_batch(spark, tmp_path):
    from rdf_indexer_spark.streaming import sessionize_batch, sessionize_events

    batch1 = [
        # user 1, session A (2 events), then session B starts 55 min later
        (_ts(10, 0), 1, 1.0), (_ts(10, 5), 1, 2.0), (_ts(11, 0), 1, 4.0),
        # user 2: one open session
        (_ts(10, 0), 2, 10.0), (_ts(10, 2), 2, 20.0),
    ]
    batch2 = [
        # user 1: 2h gap closes session B in-batch; session C stays open
        (_ts(13, 0), 1, 8.0),
    ]
    schema = "ts timestamp, user_id long, value double"
    stream_dir = str(tmp_path / "sessions_stream")
    os.makedirs(stream_dir)
    for i, rows in enumerate([batch1, batch2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"b{i}")
        )
        src = [f for f in os.listdir(str(tmp_path / f"b{i}"))
               if f.endswith(".parquet")][0]
        os.rename(os.path.join(str(tmp_path / f"b{i}"), src),
                  os.path.join(stream_dir, f"batch-{i}.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)      # two micro-batches
        .parquet(stream_dir)
    )
    q = (
        sessionize_events(stream, gap_minutes=10)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"].replace(tzinfo=UTC)):
            (r["session_end"].replace(tzinfo=UTC), r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions").collect()
    }
    # closed in-batch: u1 session A; timeout-flushed: u2's session (watermark
    # from batch 1 passes its last+gap); closed in batch 2: u1 session B.
    # NOT emitted: u1 session C (trailing open state at stream end).
    assert got == {
        (1, _ts(10, 0)): (_ts(10, 5), 2, 3.0),
        (1, _ts(11, 0)): (_ts(11, 0), 1, 4.0),
        (2, _ts(10, 0)): (_ts(10, 2), 2, 30.0),
    }

    # batch twin over ALL events: the same sessions plus the trailing one
    all_df = spark.createDataFrame(batch1 + batch2, schema)
    bt = {
        (r["user_id"], r["session_start"].replace(tzinfo=UTC)):
            (r["session_end"].replace(tzinfo=UTC), r["n_events"], r["sum_value"])
        for r in sessionize_batch(all_df, gap_minutes=10).collect()
    }
    assert bt == {**got, (1, _ts(13, 0)): (_ts(13, 0), 1, 8.0)}


def test_sessionize_batch_is_partitioned(spark):
    """The batch twin's window is partitioned by user — no single-task
    global sort."""
    from rdf_indexer_spark.streaming import sessionize_batch

    df = spark.createDataFrame(
        [(_ts(10, i % 60), i % 7, float(i)) for i in range(200)],
        "ts timestamp, user_id long, value double",
    )
    plan = sessionize_batch(df)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_out_of_order_in_gap_event_extends_session_start(spark, tmp_path):
    """VERDICT r3 item 4 regression: an in-gap late event OLDER than the
    open session's start (above watermark) must extend the session start
    downward (sessions.py _session_fn), keeping streaming ≡ batch on
    out-of-order input. In r2 the start stayed put and the emitted session
    began at the wrong timestamp."""
    from rdf_indexer_spark.streaming import sessionize_batch, sessionize_events

    schema = "ts timestamp, user_id long, value double"
    batches = [
        [(_ts(10, 0), 1, 1.0)],
        # late but in-gap (5 min ≤ 10) and above watermark (9:50)
        [(_ts(9, 55), 1, 2.0)],
        # 60-min jump closes the session in-batch
        [(_ts(11, 0), 1, 4.0)],
    ]
    stream_dir = str(tmp_path / "ooo_stream")
    os.makedirs(stream_dir)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"ob{i}")
        )
        src = [f for f in os.listdir(str(tmp_path / f"ob{i}"))
               if f.endswith(".parquet")][0]
        os.rename(os.path.join(str(tmp_path / f"ob{i}"), src),
                  os.path.join(stream_dir, f"batch-{i}.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        sessionize_events(stream, gap_minutes=10)
        .writeStream.format("memory").queryName("ooo_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = [
        (r["user_id"], r["session_start"].replace(tzinfo=UTC),
         r["session_end"].replace(tzinfo=UTC), r["n_events"], r["sum_value"])
        for r in spark.sql("select * from ooo_sessions").collect()
    ]
    # ONE closed session, starting at the LATE event's 9:55
    assert got == [(1, _ts(9, 55), _ts(10, 0), 2, 3.0)]

    # batch twin agrees (plus the trailing open session)
    all_df = spark.createDataFrame(sum(batches, []), schema)
    bt = sorted(
        (r["user_id"], r["session_start"].replace(tzinfo=UTC),
         r["session_end"].replace(tzinfo=UTC), r["n_events"], r["sum_value"])
        for r in sessionize_batch(all_df, gap_minutes=10).collect()
    )
    assert bt == [got[0], (1, _ts(11, 0), _ts(11, 0), 1, 4.0)]
