"""Golden-model tests for the point-in-time join (the pattern of the
reference's tests/test_historical_retrieval.py: run the engine, compare
to an independent oracle)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

from feast_spark.operators.asof_join import AsOfJoinSpec, as_of_join
from tests.conftest import SF_MED


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module", params=["union_window", "range_join", "sorted_merge"])
def strategy(request):
    return request.param


def _handwritten_frames(spark):
    entity = spark.createDataFrame(
        [
            Row(driver_id=1, event_timestamp=ts("2021-04-12 10:59:42")),
            Row(driver_id=2, event_timestamp=ts("2021-04-12 08:12:10")),
            Row(driver_id=3, event_timestamp=ts("2021-04-12 16:40:26")),
            Row(driver_id=4, event_timestamp=ts("2021-04-12 15:01:12")),
        ]
    )
    feats = spark.createDataFrame(
        [
            # driver 1: two rows before, winner = 10:00
            Row(driver_id=1, datetime=ts("2021-04-12 09:00:00"),
                created=ts("2021-04-12 09:00:00"), conv_rate=0.1),
            Row(driver_id=1, datetime=ts("2021-04-12 10:00:00"),
                created=ts("2021-04-12 10:00:00"), conv_rate=0.2),
            # driver 1: row after entity ts — must be ignored
            Row(driver_id=1, datetime=ts("2021-04-12 11:00:00"),
                created=ts("2021-04-12 11:00:00"), conv_rate=0.9),
            # driver 2: only row is outside 2h ttl
            Row(driver_id=2, datetime=ts("2021-04-12 05:00:00"),
                created=ts("2021-04-12 05:00:00"), conv_rate=0.3),
            # driver 3: duplicate (key, ts) with different created —
            # max created wins (A2)
            Row(driver_id=3, datetime=ts("2021-04-12 16:00:00"),
                created=ts("2021-04-12 16:00:00"), conv_rate=0.4),
            Row(driver_id=3, datetime=ts("2021-04-12 16:00:00"),
                created=ts("2021-04-12 17:00:00"), conv_rate=0.5),
            # driver 4: feature exactly at entity ts — inclusive bound
            Row(driver_id=4, datetime=ts("2021-04-12 15:01:12"),
                created=ts("2021-04-12 15:01:12"), conv_rate=0.6),
        ]
    )
    return entity, feats


def test_asof_semantics_handwritten(spark, strategy):
    entity, feats = _handwritten_frames(spark)
    out = as_of_join(
        entity,
        "event_timestamp",
        [
            AsOfJoinSpec(
                feature_df=feats,
                join_keys=["driver_id"],
                timestamp_col="datetime",
                features=["conv_rate"],
                created_col="created",
                ttl=timedelta(hours=2),
            )
        ],
        strategy=strategy,
    )
    got = {r["driver_id"]: r["conv_rate"] for r in out.collect()}
    assert got == {1: 0.2, 2: None, 3: 0.5, 4: 0.6}
    # entity ts column moved first (P5)
    assert out.columns[0] == "event_timestamp"
    assert out.count() == 4


def test_asof_no_ttl_unbounded(spark, strategy):
    entity, feats = _handwritten_frames(spark)
    out = as_of_join(
        entity,
        "event_timestamp",
        [
            AsOfJoinSpec(
                feature_df=feats,
                join_keys=["driver_id"],
                timestamp_col="datetime",
                features=["conv_rate"],
                created_col="created",
                ttl=None,
            )
        ],
        strategy=strategy,
    )
    got = {r["driver_id"]: r["conv_rate"] for r in out.collect()}
    # driver 2's 05:00 row now within (unbounded) range
    assert got == {1: 0.2, 2: 0.3, 3: 0.5, 4: 0.6}


def test_asof_prefix_and_null_feature_value(spark, strategy):
    # A NULL feature value in the winning row must be returned as NULL,
    # not replaced by an older non-null row (struct-carry semantics).
    entity = spark.createDataFrame(
        [Row(k=1, event_timestamp=ts("2021-01-01 12:00:00"))]
    )
    feats = spark.createDataFrame(
        [
            Row(k=1, etts=ts("2021-01-01 10:00:00"), v=1.0),
            Row(k=1, etts=ts("2021-01-01 11:00:00"), v=None),
        ]
    )
    out = as_of_join(
        entity,
        "event_timestamp",
        [
            AsOfJoinSpec(
                feature_df=feats,
                join_keys=["k"],
                timestamp_col="etts",
                features=["v"],
                prefix="view1",
            )
        ],
        strategy=strategy,
    )
    rows = out.collect()
    assert rows[0]["view1__v"] is None
    assert "view1__v" in out.columns


def test_asof_vs_duckdb_oracle(spark, duck, strategy):
    """Differential test on driver testdata at sf0.01: purchases as the
    entity frame, views as the feature frame."""
    from feast_spark.sources.testdata import load_table

    events = load_table(spark, SF_MED, "events")
    entity = events.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    feats = events.filter("event_type = 'view'").select(
        "user_id", "ts", "value"
    )
    out = as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=feats,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=2),
            )
        ],
        strategy=strategy,
    )
    got = {r["event_id"]: r["value"] for r in out.collect()}

    oracle = duck.execute(
        """
        WITH entity AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ), feat AS (
          SELECT user_id, ts, value FROM events WHERE event_type = 'view'
        ), ranked AS (
          SELECT e.event_id, f.value, f.ts AS fts,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY f.ts DESC) rn
          FROM entity e
          LEFT JOIN feat f
            ON e.user_id = f.user_id
           AND f.ts <= e.ts
           AND f.ts >= e.ts - INTERVAL 2 DAY
        )
        SELECT event_id, CASE WHEN fts IS NULL THEN NULL ELSE value END AS value
        FROM ranked WHERE rn = 1
        """
    ).fetchall()
    want = {eid: v for eid, v in oracle}
    assert got == want


def test_asof_null_entity_ts_yields_null_features(spark, strategy):
    """A NULL entity timestamp matches nothing (``ts <= NULL`` is never
    true in SQL); all strategies must agree.  Guards the numpy kernel,
    where NaT sorts as +inf in searchsorted (reference semantics:
    sdk/python/feast/pyspark/launchers — entity rows always carry a
    timestamp, so NULL must not silently grab the newest feature)."""
    entity = spark.createDataFrame(
        [
            Row(driver_id=1, event_timestamp=ts("2021-04-12 10:59:42")),
            Row(driver_id=1, event_timestamp=None),
        ],
        "driver_id int, event_timestamp timestamp",
    )
    feats = spark.createDataFrame(
        [
            Row(driver_id=1, datetime=ts("2021-04-12 09:00:00"),
                created=ts("2021-04-12 09:00:00"), conv_rate=0.1),
        ]
    )
    for ttl in (None, timedelta(hours=24)):
        out = as_of_join(
            entity,
            "event_timestamp",
            [
                AsOfJoinSpec(
                    feature_df=feats,
                    join_keys=["driver_id"],
                    timestamp_col="datetime",
                    features=["conv_rate"],
                    created_col="created",
                    ttl=ttl,
                )
            ],
            strategy=strategy,
        )
        got = {r["event_timestamp"]: r["conv_rate"] for r in out.collect()}
        assert got == {ts("2021-04-12 10:59:42"): 0.1, None: None}, (strategy, ttl)


def test_asof_null_created_ts_loses_ties(spark, strategy):
    """Among equal event_ts rows, a NULL created_ts loses to any real
    created value (union_window orders created ASC — Spark puts nulls
    first — and the last row wins); sorted_merge must match via
    na_position='first'."""
    entity = spark.createDataFrame(
        [Row(driver_id=1, event_timestamp=ts("2021-04-12 10:59:42"))]
    )
    feats = spark.createDataFrame(
        [
            Row(driver_id=1, datetime=ts("2021-04-12 09:00:00"),
                created=None, conv_rate=0.9),
            Row(driver_id=1, datetime=ts("2021-04-12 09:00:00"),
                created=ts("2021-04-12 09:00:00"), conv_rate=0.2),
        ],
        "driver_id int, datetime timestamp, created timestamp, conv_rate double",
    )
    out = as_of_join(
        entity,
        "event_timestamp",
        [
            AsOfJoinSpec(
                feature_df=feats,
                join_keys=["driver_id"],
                timestamp_col="datetime",
                features=["conv_rate"],
                created_col="created",
                ttl=None,
            )
        ],
        strategy=strategy,
    )
    assert [r["conv_rate"] for r in out.collect()] == [0.2]


def test_asof_bucket_granularity_matches_per_key(spark):
    """sorted_merge at BUCKET granularity (spec.bucket_col, several
    keys per cogroup) must reproduce the per-key result exactly —
    incl. ttl misses, created tie-breaks, inclusive bounds, and keys
    with no feature rows."""
    from feast_spark.operators.skew import with_bucket_id

    entity, feats = _handwritten_frames(spark)
    # driver 5 has no feature rows at all
    entity = entity.union(
        spark.createDataFrame(
            [Row(driver_id=5, event_timestamp=ts("2021-04-12 12:00:00"))]
        )
    )
    # 2 buckets force multiple drivers into one cogroup
    eb = with_bucket_id(entity, ["driver_id"], 2)
    fb = with_bucket_id(feats, ["driver_id"], 2)
    out = as_of_join(
        eb,
        "event_timestamp",
        [
            AsOfJoinSpec(
                feature_df=fb,
                join_keys=["driver_id"],
                timestamp_col="datetime",
                features=["conv_rate"],
                created_col="created",
                ttl=timedelta(hours=2),
            )
        ],
        strategy="sorted_merge",
    )
    assert "FlatMapCoGroupsInPandas" in out._jdf.queryExecution().executedPlan().toString()
    got = {r["driver_id"]: r["conv_rate"] for r in out.collect()}
    assert got == {1: 0.2, 2: None, 3: 0.5, 4: 0.6, 5: None}
    # bucket col is an entity column, so it is preserved in the output
    assert "__bucket" in out.columns


def test_asof_bucket_granularity_multi_rows_per_key(spark):
    """Bucketed kernel with several entity rows per key and interleaved
    timestamps — exercises the shared code+rank composite across key
    runs (no ttl, so every row with any prior feature matches)."""
    from feast_spark.operators.skew import with_bucket_id

    entity = spark.createDataFrame(
        [
            Row(k=i, event_timestamp=ts(f"2021-04-12 {h:02d}:30:00"))
            for i in range(7)
            for h in (8, 12, 16)
        ]
    )
    feats = spark.createDataFrame(
        [
            Row(k=i, datetime=ts(f"2021-04-12 {h:02d}:00:00"),
                v=float(i * 100 + h))
            for i in range(5)  # keys 5, 6 have no features
            for h in (9, 13)
        ]
    )
    eb = with_bucket_id(entity, ["k"], 2)
    fb = with_bucket_id(feats, ["k"], 2)
    spec = lambda f: [
        AsOfJoinSpec(
            feature_df=f, join_keys=["k"], timestamp_col="datetime",
            features=["v"],
        )
    ]
    got = as_of_join(eb, "event_timestamp", spec(fb), strategy="sorted_merge")
    want = as_of_join(
        entity, "event_timestamp", spec(feats), strategy="union_window"
    )
    gs = sorted(
        (r["k"], r["event_timestamp"], r["v"]) for r in got.collect()
    )
    ws = sorted(
        (r["k"], r["event_timestamp"], r["v"]) for r in want.collect()
    )
    assert gs == ws and len(gs) == 21


def test_auto_strategy_dispatch(spark, tmp_path):
    """strategy='auto' dispatch arms: bucket-merge for shared __bucket,
    broadcast range join under the size threshold, union_window when
    broadcasting is disabled — and the auto result matches explicit."""
    from feast_spark.operators.asof_join import choose_strategy
    from feast_spark.operators.skew import with_bucket_id

    entity, feats = _handwritten_frames(spark)
    mk = lambda f: AsOfJoinSpec(
        feature_df=f, join_keys=["driver_id"], timestamp_col="datetime",
        features=["conv_rate"], created_col="created",
        ttl=timedelta(hours=2),
    )

    # tiny parquet-backed feature frame (real size stats) -> range_join
    feats.write.parquet(str(tmp_path / "feats"))
    featp = spark.read.parquet(str(tmp_path / "feats"))
    assert choose_strategy(entity, mk(featp)) == "range_join"

    # a createDataFrame frame reports UNKNOWN stats (Long.MaxValue):
    # auto must not broadcast blind -> union_window
    assert choose_strategy(entity, mk(feats)) == "union_window"

    # broadcasting off -> union_window even for the small parquet frame
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert choose_strategy(entity, mk(featp)) == "union_window"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # shared bucket column -> sorted_merge (bucket granularity)
    eb = with_bucket_id(entity, ["driver_id"], 2)
    fb = with_bucket_id(feats, ["driver_id"], 2)
    assert choose_strategy(eb, mk(fb)) == "sorted_merge"

    # explicit bucket_col wins even without the __bucket convention
    spec = AsOfJoinSpec(
        feature_df=fb.withColumnRenamed("__bucket", "bkt"),
        join_keys=["driver_id"], timestamp_col="datetime",
        features=["conv_rate"], bucket_col="bkt",
    )
    assert choose_strategy(
        eb.withColumnRenamed("__bucket", "bkt"), spec
    ) == "sorted_merge"

    # end-to-end: auto == explicit union_window result
    out = as_of_join(entity, "event_timestamp", [mk(feats)], strategy="auto")
    want = as_of_join(
        entity, "event_timestamp", [mk(feats)], strategy="union_window"
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, want.collect())
    )
