"""ML feature/eval primitives: DuckDB and numpy differentials."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.ml_features import (
    auc_score,
    leave_one_out_encode,
    quantile_bins,
)
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


def test_loo_encode_vs_duckdb(spark, duck):
    ev = load_table(spark, SF_SMALL, "events")
    out = {
        r["event_id"]: r["event_type_loo"]
        for r in leave_one_out_encode(
            ev, "event_type", "value"
        ).collect()
    }
    oracle = duck.execute(
        f"""
SELECT event_id,
       (sum(value) OVER (PARTITION BY event_type) - value)
       / (count(*) OVER (PARTITION BY event_type) - 1) AS loo
FROM '{SF_SMALL}/events.parquet'
"""
    ).fetchall()
    assert len(oracle) == len(out) > 0
    for eid, loo in oracle:
        assert out[eid] == pytest.approx(loo, rel=1e-9)


def test_loo_encode_leakage_and_smoothing(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, cat="a", y=1.0),
            Row(id=2, cat="a", y=0.0),
            Row(id=3, cat="a", y=1.0),
            Row(id=4, cat="b", y=1.0),  # singleton
        ]
    )
    out = {r["id"]: r["cat_loo"] for r in leave_one_out_encode(df, "cat", "y").collect()}
    # row 1's encoding excludes its own y: (0+1)/2
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(1.0)
    assert out[4] is None  # singleton, no smoothing
    sm = {
        r["id"]: r["cat_loo"]
        for r in leave_one_out_encode(df, "cat", "y", smoothing=2.0).collect()
    }
    prior = 0.75
    assert sm[4] == pytest.approx((0 - 1.0 + 2.0 * prior) / (1 - 1 + 2.0) + 0.5)
    # ^ (sum_b - y + s*prior)/(cnt-1+s) = (1 - 1 + 1.5)/2 = 0.75
    assert sm[4] == pytest.approx(prior)


def test_quantile_bins_equal_frequency(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = quantile_bins(ev, "value", 4)
    counts = {
        r["value_bin"]: r["n"]
        for r in out.groupBy("value_bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {0, 1, 2, 3}
    total = sum(counts.values())
    for b, n in counts.items():
        assert abs(n - total / 4) <= total * 0.02 + 2
    # approx mode: same bin count structure, boundaries near exact
    approx = quantile_bins(ev, "value", 4, exact=False)
    acounts = {
        r["value_bin"]: r["n"]
        for r in approx.groupBy("value_bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for b in counts:
        assert abs(acounts[b] - counts[b]) <= total * 0.05


def test_quantile_bins_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [Row(id=1, v=1.0), Row(id=2, v=None), Row(id=3, v=2.0), Row(id=4, v=3.0)]
    )
    out = {r["id"]: r["v_bin"] for r in quantile_bins(df, "v", 2).collect()}
    assert out[2] is None
    with pytest.raises(ValueError):
        quantile_bins(df, "v", 1)


def test_auc_vs_numpy(spark):
    """Exact AUC with heavy ties vs a numpy rank-sum reference."""
    import numpy as np

    rng = np.random.RandomState(7)
    y = (rng.rand(2000) < 0.3).astype(float)
    # discretized scores force tie blocks; correlate with labels
    s = np.round(rng.rand(2000) * 0.5 + y * rng.rand(2000) * 0.5, 2)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, s)], "y double, s double"
    )
    got = auc_score(df, "y", "s").collect()[0]

    # numpy reference: average ranks
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=float)
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # avg of ranks i+1..j
        i = j
    npos, nneg = y.sum(), (1 - y).sum()
    want = (ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert got["auc"] == pytest.approx(want, rel=1e-12)
    assert got["n_pos"] == int(npos) and got["n_neg"] == int(nneg)


def test_auc_edge_cases(spark):
    perfect = spark.createDataFrame(
        [(0.0, 0.1), (0.0, 0.2), (1.0, 0.8), (1.0, 0.9)], "y double, s double"
    )
    assert auc_score(perfect, "y", "s").collect()[0]["auc"] == pytest.approx(1.0)
    inverted = spark.createDataFrame(
        [(1.0, 0.1), (0.0, 0.9)], "y double, s double"
    )
    assert auc_score(inverted, "y", "s").collect()[0]["auc"] == pytest.approx(0.0)
    all_ties = spark.createDataFrame(
        [(1.0, 0.5), (0.0, 0.5)], "y double, s double"
    )
    assert auc_score(all_ties, "y", "s").collect()[0]["auc"] == pytest.approx(0.5)
    degenerate = spark.createDataFrame([(1.0, 0.5)], "y double, s double")
    assert auc_score(degenerate, "y", "s").collect()[0]["auc"] is None
    # boolean labels accepted
    b = spark.createDataFrame([(True, 0.9), (False, 0.1)], "y boolean, s double")
    assert auc_score(b, "y", "s").collect()[0]["auc"] == pytest.approx(1.0)


def test_winsorize_clamps_tails(spark, duck):
    ev = load_table(spark, SF_SMALL, "events")
    from feast_spark.operators.ml_features import winsorize

    out = winsorize(ev, "value", 0.05, 0.95)
    lo, hi = duck.execute(
        f"""
SELECT quantile_cont(value, 0.05), quantile_cont(value, 0.95)
FROM '{SF_SMALL}/events.parquet'
"""
    ).fetchall()[0]
    stats = out.agg(
        F.min("value_wins"), F.max("value_wins"),
        F.count(F.lit(1)),
    ).collect()[0]
    # clamped range equals the oracle percentiles (same interpolation)
    assert stats[0] == pytest.approx(lo, rel=1e-9)
    assert stats[1] == pytest.approx(hi, rel=1e-9)
    # interior values untouched
    interior = out.filter(
        (F.col("value") > lo) & (F.col("value") < hi)
        & (F.col("value") != F.col("value_wins"))
    ).count()
    assert interior == 0
    with pytest.raises(ValueError):
        winsorize(ev, "value", 0.9, 0.1)


def test_loo_encode_keeps_null_category_rows(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, cat="a", y=1.0),
            Row(id=2, cat="a", y=0.0),
            Row(id=3, cat=None, y=5.0),  # must SURVIVE with NULL encoding
        ]
    )
    out = {r["id"]: r for r in leave_one_out_encode(df, "cat", "y").collect()}
    assert set(out) == {1, 2, 3}
    assert out[3]["cat_loo"] is None


def test_percentile_ops_handle_exotic_column_names(spark):
    from feast_spark.operators.ml_features import winsorize

    df = spark.createDataFrame(
        [Row(**{"id": i}) for i in range(20)]
    ).withColumnRenamed("id", "my col.v")
    df = df.withColumn("my col.v", F.col("`my col.v`").cast("double"))
    out = quantile_bins(df, "my col.v", 4)
    assert out.filter(F.col("`my col.v_bin`").isNotNull()).count() == 20
    w = winsorize(df, "my col.v", 0.1, 0.9)
    assert w.count() == 20


def test_loo_encode_null_target_gets_category_mean(spark):
    """Unlabeled (NULL-target) rows have no own label to leave out:
    they receive the plain (smoothed) category mean over the labeled
    rows, not NULL — the inference-row path."""
    df = spark.createDataFrame(
        [
            Row(id=1, cat="a", y=1.0),
            Row(id=2, cat="a", y=0.0),
            Row(id=3, cat="a", y=None),  # inference row
            Row(id=4, cat="b", y=None),  # category with zero labels
        ]
    )
    out = {r["id"]: r["cat_loo"] for r in leave_one_out_encode(df, "cat", "y").collect()}
    assert out[3] == pytest.approx(0.5)  # mean of labeled a-rows
    assert out[4] is None  # nothing to encode with
    # smoothed: (sum + s*prior) / (cnt + s); prior = 0.5 over labeled rows
    sm = {
        r["id"]: r["cat_loo"]
        for r in leave_one_out_encode(df, "cat", "y", smoothing=2.0).collect()
    }
    assert sm[3] == pytest.approx((1.0 + 2.0 * 0.5) / (2 + 2.0))
    # labeled rows keep the leave-one-out form
    assert sm[1] == pytest.approx((0.0 + 2.0 * 0.5) / (1 + 2.0))
