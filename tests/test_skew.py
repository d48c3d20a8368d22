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
