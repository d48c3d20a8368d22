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


def test_group_split_keeps_groups_whole_and_guards_leakage(spark):
    """Near-dup clusters split as units: labeling components and
    group-splitting on the label puts every member of a cluster in ONE
    split, where per-row hash_split demonstrably straddles."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from feast_spark.functions.split import group_split, hash_split
    from feast_spark.operators.components import connected_components

    # 300 docs in 100 three-member clusters (pair graph chains them)
    pairs = spark.createDataFrame(
        [Row(id_a=3 * g, id_b=3 * g + i) for g in range(100) for i in (1, 2)]
    )
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(300)])
    labels = connected_components(pairs)
    grouped = (
        docs.join(labels, docs.doc_id == labels.node, "left")
        .withColumn("grp", F.coalesce("component", "doc_id"))
        .select("doc_id", "grp")
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = group_split(grouped, "grp", w)
    splits_per_group: dict[int, set] = {}
    for r in out.collect():
        splits_per_group.setdefault(r["grp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in splits_per_group.values())
    # proportions hold over groups (within tolerance at n=100)
    by_split = out.select("grp", "split").distinct().groupBy("split").count()
    counts = {r["split"]: r["count"] for r in by_split.collect()}
    assert 60 <= counts.get("train", 0) <= 95
    # the contrast: per-row hash_split straddles at least one cluster
    naive = hash_split(grouped, "doc_id", w)
    naive_per_group: dict[int, set] = {}
    for r in naive.collect():
        naive_per_group.setdefault(r["grp"], set()).add(r["split"])
    assert any(len(s) > 1 for s in naive_per_group.values())


def test_time_series_splits_expanding_and_purged(spark):
    """Folds expand, train strictly precedes test, the purge gap
    holds, and fold membership matches a python recomputation of the
    same boundary arithmetic over the real events table."""
    from pyspark.sql import functions as F

    from feast_spark.functions.split import time_series_splits
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_MED

    events = load_table(spark, SF_MED, "events")
    folds = time_series_splits(events, "ts", n_folds=3, gap_seconds=3600)
    assert len(folds) == 3
    rng = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    lo, hi = rng["lo"].timestamp(), rng["hi"].timestamp()
    span = (hi - lo) / 4
    prev_train = 0
    total = events.filter(F.col("ts").isNotNull()).count()
    rows = [
        (r["ts"].timestamp(),)
        for r in events.select("ts").filter(F.col("ts").isNotNull()).collect()
    ]
    for i, (train, test) in enumerate(folds, start=1):
        b = lo + span * i
        nxt = lo + span * (i + 1) if i < 3 else hi + 1
        n_train, n_test = train.count(), test.count()
        # expanding: each fold trains on strictly more rows
        assert n_train > prev_train
        prev_train = n_train
        # python twin of the boundary arithmetic
        want_train = sum(1 for (t,) in rows if lo <= t < b)
        want_test = sum(1 for (t,) in rows if b + 3600 <= t < nxt)
        assert (n_train, n_test) == (want_train, want_test), i
        assert n_test > 0
        # leakage guard: max(train ts) + gap <= min(test ts)
        mt = train.agg(F.max("ts")).collect()[0][0].timestamp()
        mn = test.agg(F.min("ts")).collect()[0][0].timestamp()
        assert mt + 3600 <= mn + 1e-6
    # no gap, all folds: train+test unions cover <= total; final fold
    # test ends at the max row inclusively
    ng = time_series_splits(events, "ts", n_folds=2)
    last_train, last_test = ng[-1]
    assert last_train.count() + last_test.count() <= total
    assert (
        last_test.agg(F.max("ts")).collect()[0][0] == rng["hi"]
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_folds"):
        time_series_splits(events, "ts", 0)
    with _pytest.raises(ValueError, match="gap_seconds"):
        time_series_splits(events, "ts", 2, gap_seconds=-1)
    with _pytest.raises(ValueError, match="both start and end"):
        time_series_splits(events, "ts", 2, start=rng["lo"])


def test_time_series_splits_rejects_reversed_bounds(spark):
    """Explicit datetime bounds with start >= end raise instead of
    silently yielding empty/degenerate folds (mirrors resample)."""
    from datetime import datetime

    import pytest

    from feast_spark.functions.split import time_series_splits
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_MED

    events = load_table(spark, SF_MED, "events")
    with pytest.raises(ValueError, match="must be after"):
        time_series_splits(
            events,
            "ts",
            n_folds=2,
            start=datetime(2024, 1, 2),
            end=datetime(2024, 1, 1),
        )


def test_time_series_splits_mixed_bound_types_do_not_crash(spark):
    """date+datetime or naive+aware bound pairs are valid (Spark's
    timestamp cast orders them); the driver-side reversed-bounds guard
    must skip pairs Python cannot compare instead of raising
    TypeError."""
    from datetime import date, datetime, timezone

    from feast_spark.functions.split import time_series_splits
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_MED

    events = load_table(spark, SF_MED, "events")
    folds = time_series_splits(
        events, "ts", n_folds=2,
        start=date(2024, 1, 1), end=datetime(2024, 1, 20),
    )
    assert len(folds) == 2
    tr, te = folds[0]
    assert tr.count() > 0
    # naive + aware: also valid, also uncheckable driver-side
    folds = time_series_splits(
        events, "ts", n_folds=2,
        start=datetime(2024, 1, 1),
        end=datetime(2024, 1, 20, tzinfo=timezone.utc),
    )
    assert len(folds) == 2
