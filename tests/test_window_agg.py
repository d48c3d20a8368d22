"""Windowed rollup operators: tumbling + rolling (trailing RANGE frame)."""

from datetime import datetime, timedelta

import pytest
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


def test_with_lag_features_vs_duckdb(spark, duck):
    from feast_spark.operators.window_agg import with_lag_features
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    out = with_lag_features(
        ev, ["user_id"], "ts", ["value"], lags=[1, 3],
        tiebreak_col="event_id",
    ).select("event_id", "value_lag1", "value_delta1", "value_lag3")
    got = {r["event_id"]: r for r in out.collect()}
    oracle = duck.execute(
        f"""
SELECT event_id,
       LAG(value, 1) OVER w AS l1,
       value - LAG(value, 1) OVER w AS d1,
       LAG(value, 3) OVER w AS l3
FROM '{SF_SMALL}/events.parquet'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
    ).fetchall()
    assert len(oracle) == len(got) > 0
    for eid, l1, d1, l3 in oracle:
        r = got[eid]
        for a, b in ((r["value_lag1"], l1), (r["value_delta1"], d1),
                     (r["value_lag3"], l3)):
            if b is None:
                assert a is None
            else:
                assert a == pytest.approx(b, rel=1e-12)


def test_with_lag_features_single_window_node(spark):
    """All lags/cols share ONE Window sort — no per-lag re-shuffle."""
    from feast_spark.operators.window_agg import with_lag_features
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    plan = (
        with_lag_features(ev, ["user_id"], "ts", ["value"], lags=[1, 2, 5])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Window") <= 2  # one Window op (+heading line slack)


def test_with_lag_features_validates(spark):
    from pyspark.sql import Row

    from feast_spark.operators.window_agg import with_lag_features

    df = spark.createDataFrame([Row(k=1, ts=1, v=1.0)])
    with pytest.raises(ValueError):
        with_lag_features(df, ["k"], "ts", ["v"], lags=[0])


def test_rolling_zscore_vs_duckdb(spark, duck):
    from feast_spark.operators.window_agg import with_rolling_zscore
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    out = {
        r["event_id"]: r["value_zscore"]
        for r in with_rolling_zscore(
            ev, ["user_id"], "ts", "value", timedelta(days=3)
        ).collect()
    }
    oracle = duck.execute(
        f"""
SELECT event_id,
       CASE WHEN count(value) OVER w >= 2
             AND stddev_samp(value) OVER w > 0
            THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
       END AS z
FROM '{SF_SMALL}/events.parquet'
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY epoch(CAST(ts AS TIMESTAMP))
  RANGE BETWEEN {3*86400} PRECEDING AND CURRENT ROW
)
"""
    ).fetchall()
    assert len(oracle) == len(out) > 0
    for eid, z in oracle:
        if z is None:
            assert out[eid] is None
        else:
            assert out[eid] == pytest.approx(z, rel=1e-9)


def test_rolling_zscore_subsecond_bounds(spark):
    """The zscore RANGE frame orders by ts cast to DOUBLE (fractional
    seconds) — a long cast truncates, letting events up to ~1s outside
    [ts - window, ts] into the frame."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from feast_spark.operators.window_agg import with_rolling_zscore

    # window = 10s; row at t=12.6 must EXCLUDE the row at t=2.1
    # (age 10.5s > 10), which a whole-second truncation (12 - 2 = 10)
    # would include.
    rows = [
        Row(k="a", ts=datetime(2024, 1, 1, 0, 0, 2, 100000), v=100.0),
        Row(k="a", ts=datetime(2024, 1, 1, 0, 0, 5, 0), v=1.0),
        Row(k="a", ts=datetime(2024, 1, 1, 0, 0, 6, 0), v=3.0),
        Row(k="a", ts=datetime(2024, 1, 1, 0, 0, 12, 600000), v=2.0),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["ts"]: r["v_zscore"]
        for r in with_rolling_zscore(
            df, ["k"], "ts", "v", timedelta(seconds=10)
        ).collect()
    }
    # frame for the last row = {1.0, 3.0, 2.0}: mean 2, std 1 -> z = 0
    assert out[datetime(2024, 1, 1, 0, 0, 12, 600000)] == pytest.approx(0.0)
