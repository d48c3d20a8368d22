"""Streaming tumbling-window agg: closed windows emitted once (append
mode), late data dropped past the watermark, and stream output matching
the batch operator on the same events."""

from datetime import datetime, timedelta

from pyspark.sql import Row
from pyspark.sql import types as T

from feast_spark.operators.window_agg import tumbling_window_agg
from feast_spark.streaming.window_agg import streaming_tumbling_agg

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def ts(s):
    return datetime.fromisoformat(s)


def test_streaming_windows_match_batch_and_drop_late(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    emitted = []

    def write_batch(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    def run_stream():
        # foreachBatch sink: supports checkpoint recovery (the memory
        # sink does not), so run 2 restores state + watermark
        stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
        out = streaming_tumbling_agg(
            stream,
            ["user_id"],
            "ts",
            timedelta(minutes=5),
            {"n": ("count", "value"), "s": ("sum", "value")},
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # batch 1: two windows' worth of events for user 1. Run the stream
    # to completion so the watermark (= max event time, delay 0) is
    # checkpointed at 10:06.
    write_batch("b1", [
        Row(user_id=1, ts=ts("2024-01-01 10:00:10"), value=1.0),
        Row(user_id=1, ts=ts("2024-01-01 10:01:10"), value=2.0),
        Row(user_id=1, ts=ts("2024-01-01 10:06:00"), value=10.0),
    ])
    run_stream()
    # batch 2 (same checkpoint -> state + watermark restored): an event
    # far ahead closes both earlier windows; a late event inside the
    # already-watermarked-past 10:00 window must be dropped
    write_batch("b2", [
        Row(user_id=1, ts=ts("2024-01-01 10:30:00"), value=100.0),
        Row(user_id=1, ts=ts("2024-01-01 10:00:30"), value=1000.0),
    ])
    run_stream()

    got = {
        (r.user_id, r.window_start.isoformat(), r.event_ts.isoformat()): (r.n, r.s)
        for r in emitted
    }
    # only the two CLOSED windows are emitted; 10:30 stays open in state
    assert got == {
        (1, "2024-01-01T10:00:00", "2024-01-01T10:05:00"): (2, 3.0),
        (1, "2024-01-01T10:05:00", "2024-01-01T10:10:00"): (1, 10.0),
    }, got

    # the batch operator over the non-late, closed-window events agrees
    batch_df = spark.createDataFrame(
        [
            Row(user_id=1, ts=ts("2024-01-01 10:00:10"), value=1.0),
            Row(user_id=1, ts=ts("2024-01-01 10:01:10"), value=2.0),
            Row(user_id=1, ts=ts("2024-01-01 10:06:00"), value=10.0),
        ],
        SCHEMA,
    )
    want = {
        (r.user_id, r.window_start.isoformat(), r.event_ts.isoformat()): (r.n, r.s)
        for r in tumbling_window_agg(
            batch_df, ["user_id"], "ts", timedelta(minutes=5),
            {"n": ("count", "value"), "s": ("sum", "value")},
        ).collect()
    }
    assert got == want
