"""Stateful streaming sessionization == batch window/lag oracle."""

from __future__ import annotations

from datetime import datetime, timedelta

from posik_engine_spark.streaming import sessionize


def _mk_events():
    base = datetime(2024, 1, 1, 8, 0, 0)
    rows = []
    for uid in (1, 2, 3):
        t = base + timedelta(minutes=uid)
        for sess in range(3):
            for j in range(4):  # 4 events per session, 5-min gaps
                rows.append((uid, t, float(uid * 100 + sess * 10 + j)))
                t += timedelta(minutes=5)
            t += timedelta(hours=2)  # > gap -> new session
    return rows


def test_stream_sessions_equal_batch_oracle(spark, tmp_path):
    events = _mk_events()
    schema = "user_id long, ts timestamp, value double"
    in_dir = str(tmp_path / "ev")
    spark.createDataFrame(events, schema).coalesce(1).write.mode("append").parquet(in_dir)
    # flush file: a far-future event advances the watermark so every
    # real session times out and emits
    flush = [(999, datetime(2024, 3, 1), 0.0)]
    spark.createDataFrame(flush, schema).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "1 minute")
    )
    q = (
        sessionize.sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions").collect()
    }
    oracle = sessionize.sessionize_batch(
        spark.createDataFrame(events, schema), gap_minutes=30
    )
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in oracle.collect()
    }
    assert expect, "oracle produced no sessions"
    assert got == expect, f"missing={expect - got}\nextra={got - expect}"


def test_stream_sessions_exact_under_out_of_order(spark, tmp_path):
    """Late (in-watermark) events that extend AND bridge earlier
    sessions must land exactly where the batch dataflow puts them —
    the state buffers raw events, not collapsed aggregates."""
    schema = "user_id long, ts timestamp, value double"
    base = datetime(2024, 1, 1, 10, 0, 0)
    batch1 = [
        (1, base, 1.0),                           # 10:00
        (1, base + timedelta(minutes=10), 2.0),   # 10:10
        (1, base + timedelta(minutes=120), 3.0),  # 12:00
    ]
    # arrives LATER but is event-time earlier: extends the first
    # session (10:30) and bridges toward 12:00 (11:30)
    batch2 = [
        (1, base + timedelta(minutes=30), 4.0),   # 10:30
        (1, base + timedelta(minutes=90), 5.0),   # 11:30
    ]
    flush = [(999, datetime(2024, 3, 1), 0.0)]

    in_dir = str(tmp_path / "ev")
    for rows in (batch1, batch2, flush):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "3 hours")
    )
    q = (
        sessionize.sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_ooo")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions_ooo").collect()
    }
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in sessionize.sessionize_batch(
            spark.createDataFrame(batch1 + batch2, schema), gap_minutes=30
        ).collect()
    }
    # expected structure: [10:00..10:30] and [11:30..12:00]
    assert len(expect) == 2
    assert got == expect, f"missing={expect - got}\nextra={got - expect}"
