"""hash_split: deterministic, growth-stable dataset splitting."""

import pytest
from pyspark.sql import Row

from feast_spark.functions.split import hash_split


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([Row(id=i) for i in range(2000)])


def test_split_proportions_and_determinism(spark, docs):
    out = hash_split(docs, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count()
              .withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03
    # identical second run
    again = hash_split(docs, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_split_stable_under_growth(spark, docs):
    """Adding rows must not move any existing row's split."""
    small = docs.filter("id < 500")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    small_map = {r["id"]: r["split"] for r in hash_split(small, "id", w).collect()}
    full_map = {r["id"]: r["split"] for r in hash_split(docs, "id", w).collect()}
    assert all(full_map[i] == s for i, s in small_map.items())


def test_split_salt_changes_assignment(spark, docs):
    w = {"a": 0.5, "b": 0.5}
    s1 = {r["id"]: r["split"] for r in hash_split(docs, "id", w).collect()}
    s2 = {r["id"]: r["split"] for r in hash_split(docs, "id", w, salt="x").collect()}
    assert any(s1[i] != s2[i] for i in s1), "salt must reshuffle assignments"


def test_split_weight_validation(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "id", {"train": 0.5, "val": 0.1})


def test_sample_per_group_balanced_and_deterministic(spark):
    from pyspark.sql import Row

    from feast_spark.functions.split import sample_per_group

    rows = [
        Row(id=i, g="a" if i % 3 else "b") for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    out = sample_per_group(df, ["g"], "id", 10)
    counts = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert counts == {"a": 10, "b": 10}
    again = sample_per_group(df, ["g"], "id", 10)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # small groups are kept whole, not padded
    tiny = sample_per_group(df.filter("id < 4"), ["g"], "id", 10)
    assert tiny.count() == 4
