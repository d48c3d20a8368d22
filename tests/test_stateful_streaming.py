"""Stateful streaming operators (applyInPandasWithState) + batch
sessionization, cross-checked against each other."""

import pytest

import time
from datetime import datetime, timedelta

from pyspark.sql import Row
from pyspark.sql import types as T

from feast_spark.operators.sessionize import sessionize_batch
from feast_spark.streaming.stateful import latest_changelog, sessionize_stream


SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def ts(s):
    return datetime.fromisoformat(s)


def test_sessionize_batch_islands(spark):
    t0 = ts("2021-04-12 10:00:00")
    rows = [
        # user 1: two sessions (gap 30 min, events 40 min apart split)
        Row(user_id=1, ts=t0, value=1.0),
        Row(user_id=1, ts=t0 + timedelta(minutes=10), value=1.0),
        Row(user_id=1, ts=t0 + timedelta(minutes=50), value=1.0),
        # user 2: one session, one event
        Row(user_id=2, ts=t0, value=1.0),
    ]
    out = sessionize_batch(
        spark.createDataFrame(rows, SCHEMA), ["user_id"], "ts",
        timedelta(minutes=30),
    ).collect()
    by_key = {(r["user_id"], r["session_id"]): r for r in out}
    assert len(by_key) == 3
    s0 = by_key[(1, 0)]
    assert s0["session_start"] == t0
    assert s0["session_end"] == t0 + timedelta(minutes=10)
    assert s0["n_events"] == 2
    s1 = by_key[(1, 1)]
    assert s1["session_start"] == t0 + timedelta(minutes=50)
    assert s1["n_events"] == 1
    assert by_key[(2, 0)]["n_events"] == 1


def _run_stream_once(spark, src_dir, ckpt, build, mode="append"):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src_dir) + "/*")
    q = (
        build(stream)
        .writeStream.format("memory")
        .outputMode(mode)
        .queryName(f"stateful_{time.time_ns()}")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q.name


def test_latest_changelog_suppresses_stale_updates(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    t0 = ts("2021-04-12 10:00:00")
    spark.createDataFrame(
        [
            Row(user_id=1, ts=t0, value=0.5),
            Row(user_id=1, ts=t0 + timedelta(hours=1), value=0.9),
            Row(user_id=2, ts=t0, value=0.6),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1"))

    emitted: list = []

    def run_once():
        emitted.clear()
        stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
        q = (
            latest_changelog(stream, ["user_id"], "ts")
            .writeStream.foreachBatch(
                lambda df, _id: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    rows = {r["user_id"]: r for r in emitted}
    # one changelog row per key, carrying the newest value
    assert len(emitted) == 2
    assert rows[1]["value"] == 0.9
    assert rows[2]["value"] == 0.6

    # second batch: stale event for user 1 (suppressed), newer for user 2
    spark.createDataFrame(
        [
            Row(user_id=1, ts=t0 - timedelta(hours=5), value=0.1),
            Row(user_id=2, ts=t0 + timedelta(hours=2), value=0.7),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b2"))
    run_once()
    # only user 2 advanced -> exactly one changelog row in this run
    assert len(emitted) == 1
    assert emitted[0]["user_id"] == 2
    assert emitted[0]["value"] == 0.7


@pytest.mark.nightly
def test_sessionize_stream_matches_batch_on_closed_sessions(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    t0 = ts("2021-04-12 10:00:00")
    rows = [
        Row(user_id=1, ts=t0, value=1.0),
        Row(user_id=1, ts=t0 + timedelta(minutes=10), value=1.0),
        Row(user_id=1, ts=t0 + timedelta(minutes=50), value=1.0),
        Row(user_id=2, ts=t0, value=1.0),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))

    name = _run_stream_once(
        spark, src, tmp_path / "ck",
        lambda s: sessionize_stream(s, ["user_id"], "ts", gap_seconds=1800),
    )
    got = spark.sql(f"select * from {name}").collect()
    # within one batch, user 1's first session closes when the 50-min
    # event opens the next one; open sessions stay in state
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1
    assert r["session_start"] == t0
    assert r["session_end"] == t0 + timedelta(minutes=10)
    assert r["n_events"] == 2

    # batch oracle agrees on that closed session
    batch = sessionize_batch(
        spark.createDataFrame(rows, SCHEMA), ["user_id"], "ts",
        timedelta(minutes=30),
    ).collect()
    closed = [
        b for b in batch
        if b["user_id"] == 1 and b["session_id"] == 0
    ][0]
    assert (closed["session_start"], closed["session_end"], closed["n_events"]) == (
        r["session_start"], r["session_end"], r["n_events"]
    )
