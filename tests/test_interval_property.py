"""Randomized golden-model test for interval_join: every generated
dataset must agree with an independent O(n*m) containment oracle, for
each bound mode and join type (the as-of property-test pattern applied
to the interval operator)."""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import types as T

from feast_spark.operators.interval_join import interval_join

BASE = datetime(2024, 1, 1)

P_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("pid", T.LongType()),
    ]
)
I_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("s", T.TimestampType()),
        T.StructField("e", T.TimestampType()),
        T.StructField("iid", T.LongType()),
    ]
)


@st.composite
def dataset(draw):
    n_keys = draw(st.integers(1, 3))
    points = [
        (draw(st.integers(0, n_keys - 1)), draw(st.integers(0, 40)), pid)
        for pid in range(draw(st.integers(1, 15)))
    ]
    ivals = []
    for iid in range(draw(st.integers(0, 10))):
        s = draw(st.integers(0, 40))
        ln = draw(st.integers(0, 10))
        ivals.append((draw(st.integers(0, n_keys - 1)), s, s + ln, iid))
    return points, ivals


def oracle(points, ivals, closed):
    lo_ok = (lambda t, s: t >= s) if closed[0] == "[" else (lambda t, s: t > s)
    hi_ok = (lambda t, e: t <= e) if closed[1] == "]" else (lambda t, e: t < e)
    return sorted(
        (pid, iid)
        for pk, pt, pid in points
        for ik, s, e, iid in ivals
        if pk == ik and lo_ok(pt, s) and hi_ok(pt, e)
    )


@pytest.mark.parametrize("closed", ["[)", "[]", "()", "(]"])
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=dataset())
def test_interval_join_matches_bruteforce(spark, closed, data):
    points, ivals = data
    pdf = spark.createDataFrame(
        [Row(k=k, ts=BASE + timedelta(hours=h), pid=p) for k, h, p in points],
        P_SCHEMA,
    )
    idf = spark.createDataFrame(
        [
            Row(k=k, s=BASE + timedelta(hours=s), e=BASE + timedelta(hours=e), iid=i)
            for k, s, e, i in ivals
        ],
        I_SCHEMA,
    )
    out = interval_join(pdf, idf, ["k"], "ts", "s", "e", closed=closed)
    got = sorted((r.pid, r.iid) for r in out.collect())
    assert got == oracle(points, ivals, closed)
