"""Randomized golden-model test for the as-of join — the reference's
test pattern (tests/test_historical_retrieval.py: random data + an
independent O(n*m) oracle `find_asof_record`), driven by hypothesis.

Both physical strategies must agree with the oracle on every generated
dataset: ttl present/absent, created_ts present/absent, hits at the
exact ttl boundary, misses, and multiple keys.
"""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import types as T

from feast_spark.operators.asof_join import AsOfJoinSpec, as_of_join

BASE = datetime(2024, 1, 1)

FEAT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("created", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)
ENT_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("event_timestamp", T.TimestampType()),
    ]
)


@st.composite
def dataset(draw):
    n_keys = draw(st.integers(1, 3))
    ttl_hours = draw(st.sampled_from([None, 5, 24]))
    with_created = draw(st.booleans())
    feat_raw = draw(
        st.lists(
            st.tuples(
                st.integers(0, n_keys - 1),  # key
                st.integers(0, 60),          # event hour
                st.integers(0, 5),           # created hour
            ),
            min_size=0,
            max_size=30,
        )
    )
    # unique (k, ts, created) => the winner is fully determined
    # (beyond that the contract is ANY_VALUE, bigquery.py:650)
    feats = []
    seen = set()
    for i, (k, h, c) in enumerate(feat_raw):
        key = (k, h, c if with_created else 0)
        if key in seen:
            continue
        seen.add(key)
        feats.append(
            (
                k,
                BASE + timedelta(hours=h),
                BASE + timedelta(hours=c) if with_created else None,
                float(i),
            )
        )
    ents = [
        (rid, draw(st.integers(0, n_keys - 1)),
         BASE + timedelta(hours=draw(st.integers(0, 70))))
        for rid in range(draw(st.integers(1, 12)))
    ]
    return feats, ents, ttl_hours, with_created


def oracle(feats, ents, ttl_hours, with_created):
    """Independent O(n*m) reimplementation (find_asof_record,
    test_historical_retrieval.py:130-136)."""
    out = {}
    for rid, k, t in ents:
        lo = t - timedelta(hours=ttl_hours) if ttl_hours is not None else None
        best = None
        for fk, fts, fcr, fv in feats:
            if fk != k or fts > t or (lo is not None and fts < lo):
                continue
            cand = (fts, fcr or datetime.min, fv)
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        out[rid] = best[2] if best else None
    return out


@pytest.mark.parametrize(
    "strategy",
    ["union_window", "range_join", "sorted_merge", "sorted_merge_bucket"],
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=dataset())
def test_asof_matches_bruteforce_oracle(spark, strategy, data):
    feats, ents, ttl_hours, with_created = data
    fdf = spark.createDataFrame(
        [Row(k=k, ts=ts, created=cr, v=v) for k, ts, cr, v in feats],
        FEAT_SCHEMA,
    )
    edf = spark.createDataFrame(
        [Row(rid=r, k=k, event_timestamp=t) for r, k, t in ents], ENT_SCHEMA
    )
    if strategy == "sorted_merge_bucket":
        # bucket-granularity kernel: 2 buckets force several keys per
        # cogroup, exercising the multi-key composite merge
        from feast_spark.operators.skew import with_bucket_id

        fdf = with_bucket_id(fdf, ["k"], 2)
        edf = with_bucket_id(edf, ["k"], 2)
        strategy = "sorted_merge"
    out = as_of_join(
        edf,
        "event_timestamp",
        [
            AsOfJoinSpec(
                feature_df=fdf,
                join_keys=["k"],
                timestamp_col="ts",
                features=["v"],
                created_col="created" if with_created else None,
                ttl=timedelta(hours=ttl_hours) if ttl_hours else None,
            )
        ],
        strategy=strategy,
    )
    got = {r["rid"]: r["v"] for r in out.collect()}
    want = oracle(feats, ents, ttl_hours, with_created)
    assert got == want
