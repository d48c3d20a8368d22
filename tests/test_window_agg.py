"""Windowed rollup operators: tumbling + rolling (trailing RANGE frame)."""

from datetime import datetime, timedelta

from pyspark.sql import Row
from pyspark.sql import types as T

from feast_spark.operators.window_agg import (
    rolling_window_agg,
    tumbling_window_agg,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def ts(s):
    return datetime.fromisoformat(s)


def test_tumbling_hourly_counts_and_emit_ts(spark):
    t0 = ts("2021-04-12 10:00:00")
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=t0 + timedelta(minutes=5), value=1.0),
            Row(user_id=1, ts=t0 + timedelta(minutes=55), value=3.0),
            Row(user_id=1, ts=t0 + timedelta(minutes=65), value=5.0),
            Row(user_id=2, ts=t0 + timedelta(minutes=10), value=7.0),
        ],
        SCHEMA,
    )
    out = tumbling_window_agg(
        df, ["user_id"], "ts", timedelta(hours=1),
        {"n": ("count", "value"), "s": ("sum", "value")},
    ).collect()
    rows = {(r["user_id"], r["window_start"]): r for r in out}
    assert len(rows) == 3
    r10 = rows[(1, t0)]
    assert (r10["n"], r10["s"]) == (2, 4.0)
    # emit ts = window END: observable only after the hour closes
    assert r10["event_ts"] == t0 + timedelta(hours=1)
    r11 = rows[(1, t0 + timedelta(hours=1))]
    assert (r11["n"], r11["s"]) == (1, 5.0)


def test_rolling_trailing_inclusive_bounds_and_ties(spark):
    t0 = ts("2021-04-12 10:00:00")
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=t0, value=1.0),
            # exactly at the lookback boundary from the last row -> included
            Row(user_id=1, ts=t0 + timedelta(days=1), value=2.0),
            # tie on ts: RANGE frame puts both in each other's window
            Row(user_id=1, ts=t0 + timedelta(days=1), value=4.0),
        ],
        SCHEMA,
    )
    out = rolling_window_agg(
        df, ["user_id"], "ts", timedelta(days=1), {"s": ("sum", "value")}
    ).collect()
    by_val = {r["value"]: r["s"] for r in out}
    assert by_val[1.0] == 1.0
    # both boundary row t0 (inclusive) and the tied row are in the frame
    assert by_val[2.0] == 7.0
    assert by_val[4.0] == 7.0
