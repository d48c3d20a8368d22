"""profile_table: one-pass per-column statistics."""

import pytest
from pyspark.sql import Row

from feast_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            Row(k=1, s="a", v=1.5),
            Row(k=1, s="b", v=None),
            Row(k=2, s=None, v=-3.0),
            Row(k=3, s="b", v=0.0),
        ]
    )


def test_profile_values(df):
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    k = rows["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (4, 0, 3)
    assert (k.min_num, k.max_num) == (1.0, 3.0)
    assert k.min_str is None and k.max_str is None
    s = rows["s"]
    assert (s.n_nulls, s.n_distinct) == (1, 2)
    assert (s.min_str, s.max_str) == ("a", "b")
    assert s.min_num is None
    v = rows["v"]
    assert (v.n_nulls, v.n_distinct) == (1, 3)
    assert (v.min_num, v.max_num) == (-3.0, 1.5)


def test_profile_subset_and_unknown(df):
    assert profile_table(df, ["k"]).count() == 1
    with pytest.raises(ValueError, match="nope"):
        profile_table(df, ["nope"])


def test_profile_approx_mode_schema_identical(df):
    exact = profile_table(df)
    approx = profile_table(df, approx=True)
    assert exact.schema == approx.schema
    # HLL on tiny cardinalities is exact
    a = {r["column"]: r.n_distinct for r in approx.collect()}
    assert a == {"k": 3, "s": 2, "v": 3}


def test_profile_single_scan(df):
    """All columns are profiled in ONE aggregate over ONE scan — the
    plan must contain a single scan of the input, not one per column."""
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") + plan.count("LocalTableScan") == 1, plan
