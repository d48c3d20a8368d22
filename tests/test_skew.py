"""Skew utilities: salted join equivalence + bucketed co-located joins."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.skew import salted_join, write_bucketed


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def skewed(spark):
    # one hot key (0) with 2000 rows, 50 cold keys
    left = spark.createDataFrame(
        [Row(k=0, lv=i) for i in range(2000)]
        + [Row(k=i % 50 + 1, lv=i) for i in range(500)]
    )
    right = spark.createDataFrame([Row(k=i, rv=i * 10) for i in range(51)])
    return left, right


def test_salted_inner_matches_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, ["k"]).select("k", "lv", "rv")
    salted = salted_join(left, right, ["k"], salt_buckets=8).select(
        "k", "lv", "rv"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_left_keeps_unmatched(spark):
    left = spark.createDataFrame([Row(k=1, lv=1), Row(k=99, lv=2)])
    right = spark.createDataFrame([Row(k=1, rv=10)])
    out = salted_join(left, right, ["k"], salt_buckets=4, how="left").collect()
    by_k = {r["k"]: r["rv"] for r in out}
    assert by_k == {1: 10, 99: None}


def test_salted_join_salt_distributes_hot_key(spark, skewed):
    left, right = skewed
    lhs = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)),
    )
    n_salts = (
        lhs.filter("k = 0").select("__salt").distinct().count()
    )
    assert n_salts == 8, "hot key must spread across all salt buckets"


def test_salted_join_rejects_ambiguous_columns(spark):
    left = spark.createDataFrame([Row(k=1, v=1)])
    right = spark.createDataFrame([Row(k=1, v=2)])
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(left, right, ["k"])


def test_bucketed_join_no_exchange(spark, tmp_path):
    import uuid

    suffix = uuid.uuid4().hex[:8]
    big = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    other = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    ta, tb = f"bk_a_{suffix}", f"bk_b_{suffix}"
    write_bucketed(big, ta, ["k"], 8, sort_cols=["k"])
    write_bucketed(other, tb, ["k"], 8, sort_cols=["k"])
    try:
        joined = (
            spark.table(ta)
            .join(spark.table(tb).hint("merge"), "k")
            .select("k", "a", "b")
        )
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_bucketed_pit_retrieval_zero_exchange(spark, tmp_path):
    """The 100 TB retrieval shape: feature table AND entity table
    written bucketed on the join key -> get_historical_features
    (range_join strategy) runs with ZERO shuffle Exchange — the
    sort-merge join reads both bucketed scans co-located, and the
    dedup window's (keys, row_id) partitioning is satisfied by the
    join output's key partitioning.  Pay the shuffle once at
    materialization, never per training run.  Results must equal the
    default union_window strategy's."""
    import uuid
    from datetime import datetime, timedelta

    from feast_spark import (
        Entity, FeatureStore, FeatureView, RepoConfig, SparkSqlSource, ValueType,
    )

    suffix = uuid.uuid4().hex[:8]
    tf, te = f"bk_feat_{suffix}", f"bk_ent_{suffix}"
    base = datetime(2021, 6, 1, 12, 0, 0)
    feat = spark.range(0, 2000).select(
        (F.col("id") % 100).alias("driver_id"),
        F.timestamp_seconds(
            F.lit(int(base.timestamp())) - (F.col("id") * 60)
        ).alias("event_ts"),
        (F.col("id") * 0.5).alias("conv_rate"),
        F.timestamp_seconds(F.lit(int(base.timestamp()))).alias("created_ts"),
    )
    ent = spark.range(0, 500).select(
        (F.col("id") % 120).alias("driver_id"),  # some ids have no features
        F.timestamp_seconds(
            F.lit(int(base.timestamp())) - (F.col("id") % 7) * 3600
        ).alias("event_timestamp"),
    )
    write_bucketed(feat, tf, ["driver_id"], 8, sort_cols=["driver_id"])
    write_bucketed(ent, te, ["driver_id"], 8, sort_cols=["driver_id"])

    def mk_store(strategy):
        st = FeatureStore(
            spark,
            RepoConfig(
                project=f"bk_{strategy}",
                registry_path=str(tmp_path / f"reg_{strategy}.json"),
                online_store_path=str(tmp_path / f"online_{strategy}"),
                asof_strategy=strategy,
            ),
        )
        st.apply(
            [
                Entity(
                    name="driver", join_key="driver_id",
                    value_type=ValueType.INT64,
                ),
                FeatureView(
                    name="drv",
                    entities=["driver"],
                    ttl=timedelta(days=30),
                    batch_source=SparkSqlSource(
                        table=tf, event_timestamp_column="event_ts",
                        created_timestamp_column="created_ts",
                    ),
                ),
            ]
        )
        return st

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = mk_store("range_join").get_historical_features(
            spark.table(te), ["drv:conv_rate"]
        ).to_spark_df()
        plan = _executed_plan(out)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan

        # union_window over the same co-bucketed tables is ALSO
        # exchange-free: both union children report the bucketed
        # HashPartitioning(driver_id, 8) and the key window reuses it
        out_uw = mk_store("union_window").get_historical_features(
            spark.table(te), ["drv:conv_rate"]
        ).to_spark_df()
        assert "Exchange" not in _executed_plan(out_uw), _executed_plan(out_uw)

        got = {
            (r["driver_id"], r["event_timestamp"], r["conv_rate"])
            for r in out.collect()
        }
        want = {
            (r["driver_id"], r["event_timestamp"], r["conv_rate"])
            for r in out_uw.collect()
        }
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tf}")
        spark.sql(f"DROP TABLE IF EXISTS {te}")
