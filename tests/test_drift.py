"""PSI drift monitor: zero on identical distributions, monotone in
shift magnitude, null-bucket sensitivity, multi-column one-pass."""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.profile import psi_drift


def _uniform(spark, n, shift=0.0, null_every=None):
    df = spark.range(0, n).select(
        ((F.col("id") % 1000) / 10.0 + shift).alias("x"),
        (F.col("id") % 5).cast("double").alias("y"),
    )
    if null_every:
        df = df.withColumn(
            "x", F.when(F.col("y") == 0, None).otherwise(F.col("x"))
        )
    return df


def test_identical_distributions_zero(spark):
    a = _uniform(spark, 8000)
    b = _uniform(spark, 3000)  # same distribution, different size
    got = {r["column"]: r for r in psi_drift(a, b, ["x", "y"]).collect()}
    assert got["x"]["psi"] == pytest.approx(0.0, abs=1e-3)
    assert got["y"]["psi"] == pytest.approx(0.0, abs=1e-3)
    assert got["x"]["n_ref"] == 8000 and got["x"]["n_cur"] == 3000


def test_psi_monotone_in_shift(spark):
    a = _uniform(spark, 8000)
    small = psi_drift(a, _uniform(spark, 4000, shift=5.0), ["x"]).collect()[0]["psi"]
    big = psi_drift(a, _uniform(spark, 4000, shift=50.0), ["x"]).collect()[0]["psi"]
    assert 0.0 < small < big
    assert big > 0.25  # a half-range shift is an action-level drift


def test_null_fraction_change_detected(spark):
    a = _uniform(spark, 5000)
    b = _uniform(spark, 5000, null_every=True)  # 20% of x nulled
    psi = psi_drift(a, b, ["x"]).collect()[0]["psi"]
    assert psi > 0.25  # nulls land in their own bucket


def test_shifted_column_isolated(spark):
    """Only the shifted column reports drift in a multi-column pass."""
    a = _uniform(spark, 6000)
    b = _uniform(spark, 6000, shift=30.0)
    got = {r["column"]: r["psi"] for r in psi_drift(a, b, ["x", "y"]).collect()}
    assert got["x"] > 0.25
    assert got["y"] == pytest.approx(0.0, abs=1e-3)


def test_empty_columns_rejected(spark):
    with pytest.raises(ValueError, match="columns"):
        psi_drift(_uniform(spark, 10), _uniform(spark, 10), [])
