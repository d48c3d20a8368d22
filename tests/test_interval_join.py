"""interval_join: containment semantics, bound inclusivity, left join."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from feast_spark.operators.interval_join import interval_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            Row(k=1, ts=ts("2024-01-01 10:00:00"), v=1.0),  # == start of i1
            Row(k=1, ts=ts("2024-01-01 10:30:00"), v=2.0),  # inside i1
            Row(k=1, ts=ts("2024-01-01 11:00:00"), v=3.0),  # == end i1 / start i2
            Row(k=2, ts=ts("2024-01-01 10:30:00"), v=4.0),  # other key
            Row(k=3, ts=ts("2024-01-01 10:30:00"), v=5.0),  # no interval
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(k=1, iid="i1", s=ts("2024-01-01 10:00:00"), e=ts("2024-01-01 11:00:00")),
            Row(k=1, iid="i2", s=ts("2024-01-01 11:00:00"), e=ts("2024-01-01 12:00:00")),
            Row(k=2, iid="i3", s=ts("2024-01-01 10:00:00"), e=ts("2024-01-01 11:00:00")),
        ]
    )
    return points, intervals


def test_half_open_default(frames):
    points, intervals = frames
    got = sorted(
        (r.v, r.iid)
        for r in interval_join(points, intervals, ["k"], "ts", "s", "e").collect()
    )
    # boundary point 11:00 belongs to i2 only under [,)
    assert got == [(1.0, "i1"), (2.0, "i1"), (3.0, "i2"), (4.0, "i3")]


def test_closed_bounds_double_match(frames):
    points, intervals = frames
    got = sorted(
        (r.v, r.iid)
        for r in interval_join(
            points, intervals, ["k"], "ts", "s", "e", closed="[]"
        ).collect()
    )
    # 11:00 matches both i1 (end-inclusive) and i2 (start-inclusive)
    assert (3.0, "i1") in got and (3.0, "i2") in got


def test_left_join_keeps_unmatched_points(frames):
    points, intervals = frames
    out = interval_join(points, intervals, ["k"], "ts", "s", "e", how="left")
    rows = {r.v: r.iid for r in out.collect()}
    assert rows[5.0] is None
    assert out.count() == 5
    # the key column survives from the points side, non-null everywhere
    assert out.filter("k IS NULL").count() == 0


def test_bad_closed_rejected(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="closed"):
        interval_join(points, intervals, ["k"], "ts", "s", "e", closed="[[")
