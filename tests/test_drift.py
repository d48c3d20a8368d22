"""Drift-detection tests: DuckDB width_bucket oracle for the numeric
path, pure-python recomputation for the categorical path, and the
degenerate/disjoint edge cases."""

import math

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.drift import (
    categorical_drift,
    feature_drift,
    histogram_drift,
)
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED

SPLIT = "2024-01-15 00:00:00"
EPS = 1e-6

# DuckDB has no width_bucket; replicate Spark's formula exactly:
# bucket = floor((v - lo) / ((hi - lo) / n)) + 1, clamped to 0 / n+1
_BUCKET = (
    "CASE WHEN value < 0.0 THEN 0 WHEN value >= 100.0 THEN 9 "
    "ELSE CAST(FLOOR((value - 0.0) / ((100.0 - 0.0) / 8)) AS INT) + 1 END"
)

_NUMERIC_ORACLE = f"""
WITH r AS (
  SELECT {_BUCKET} AS b FROM events
  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{SPLIT}' AND value IS NOT NULL
),
c AS (
  SELECT {_BUCKET} AS b FROM events
  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{SPLIT}' AND value IS NOT NULL
),
bins AS (SELECT CAST(range AS INT) AS b FROM range(0, 10)),
rc AS (SELECT b, COUNT(*) AS n FROM r GROUP BY b),
cc AS (SELECT b, COUNT(*) AS n FROM c GROUP BY b),
j AS (
  SELECT bins.b,
         COALESCE(rc.n, 0) AS rn,
         COALESCE(cc.n, 0) AS cn
  FROM bins LEFT JOIN rc ON bins.b = rc.b LEFT JOIN cc ON bins.b = cc.b
),
props AS (
  SELECT b,
         GREATEST(rn * 1.0 / (SELECT SUM(rn) FROM j), {EPS}) AS p,
         GREATEST(cn * 1.0 / (SELECT SUM(cn) FROM j), {EPS}) AS q
  FROM j
),
cdf AS (
  SELECT b, p, q, SUM(p - q) OVER (ORDER BY b) AS d FROM props
)
SELECT (SELECT SUM(rn) FROM j) AS ref_n,
       (SELECT SUM(cn) FROM j) AS cur_n,
       SUM((p - q) * ln(p / q)) AS psi,
       SUM(0.5 * p * ln(2 * p / (p + q)) + 0.5 * q * ln(2 * q / (p + q)))
         AS js_div,
       0.5 * SUM(ABS(p - q)) AS tvd,
       (SELECT MAX(ABS(d)) FROM cdf) AS ks
FROM props
"""


def _split(spark):
    ev = load_table(spark, SF_MED, "events")
    ref = ev.filter(F.col("ts") < SPLIT)
    cur = ev.filter(F.col("ts") >= SPLIT)
    return ref, cur


def test_feature_drift_matches_duckdb_oracle(spark, duck):
    ref, cur = _split(spark)
    got = feature_drift(
        ref, cur, "value", lo=0.0, hi=100.0, n_bins=8, round_digits=None
    ).collect()
    assert len(got) == 1
    g = got[0]
    o = duck.execute(_NUMERIC_ORACLE).fetchone()
    want = dict(zip([d[0] for d in duck.description], o))
    assert g["ref_n"] == want["ref_n"]
    assert g["cur_n"] == want["cur_n"]
    for k in ("psi", "js_div", "tvd", "ks"):
        assert g[k] == pytest.approx(want[k], abs=1e-9), k


def test_drift_identical_snapshots_is_zero(spark):
    ref, _ = _split(spark)
    g = feature_drift(
        ref, ref, "value", lo=0.0, hi=100.0, n_bins=8, round_digits=None
    ).first()
    for k in ("psi", "js_div", "tvd", "ks"):
        assert g[k] == pytest.approx(0.0, abs=1e-12), k


def test_drift_disjoint_supports_saturates(spark):
    """Fully moved mass: tvd -> 1, js -> ln 2, ks -> 1; psi large but
    FINITE (the eps floor is what keeps ln(p/q) defined)."""
    a = spark.createDataFrame([(float(v),) for v in (1, 2, 3)], "v DOUBLE")
    b = spark.createDataFrame([(float(v),) for v in (97, 98, 99)], "v DOUBLE")
    g = feature_drift(
        a, b, "v", lo=0.0, hi=100.0, n_bins=10, round_digits=None
    ).first()
    assert g["tvd"] == pytest.approx(1.0, abs=1e-4)
    assert g["js_div"] == pytest.approx(math.log(2), abs=1e-4)
    assert g["ks"] == pytest.approx(1.0, abs=1e-4)
    assert g["psi"] > 10 and math.isfinite(g["psi"])


def test_histogram_drift_per_grain_and_plan(spark):
    """Grained drift joins sketch tables (one row per grain) and the
    whole computation stays JVM-side: no Python eval in the plan."""
    ref, cur = _split(spark)
    g = feature_drift(
        ref,
        cur,
        "value",
        lo=0.0,
        hi=100.0,
        grain_cols=["event_type"],
        n_bins=8,
    )
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
    rows = g.collect()
    types = {r["event_type"] for r in rows}
    assert len(rows) == len(types) and len(rows) >= 3
    for r in rows:
        assert 0.0 <= r["tvd"] <= 1.0
        assert 0.0 <= r["ks"] <= 1.0


def test_histogram_drift_reuses_persisted_reference(spark):
    """The daily-check shape: a reference histogram built once equals
    calling feature_drift over the raw frames."""
    from feast_spark.operators.sketches import build_histogram_sketches

    ref, cur = _split(spark)
    rh = build_histogram_sketches(ref, "value", [], 0.0, 100.0, 8)
    ch = build_histogram_sketches(cur, "value", [], 0.0, 100.0, 8)
    a = histogram_drift(rh, ch).first()
    b = feature_drift(ref, cur, "value", lo=0.0, hi=100.0, n_bins=8).first()
    assert a == b


def test_categorical_drift_matches_python(spark):
    ref, cur = _split(spark)
    g = categorical_drift(ref, cur, "event_type", round_digits=None).first()

    rcounts = {
        r["event_type"]: r["n"]
        for r in ref.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    ccounts = {
        r["event_type"]: r["n"]
        for r in cur.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    cats = set(rcounts) | set(ccounts)
    rn = sum(rcounts.values())
    cn = sum(ccounts.values())
    psi = js = tvd = 0.0
    for cat in cats:
        p = max(rcounts.get(cat, 0) / rn, EPS)
        q = max(ccounts.get(cat, 0) / cn, EPS)
        psi += (p - q) * math.log(p / q)
        js += 0.5 * p * math.log(2 * p / (p + q)) + 0.5 * q * math.log(
            2 * q / (p + q)
        )
        tvd += 0.5 * abs(p - q)
    assert g["ref_n"] == rn and g["cur_n"] == cn
    assert g["n_categories"] == len(cats)
    assert g["psi"] == pytest.approx(psi, abs=1e-9)
    assert g["js_div"] == pytest.approx(js, abs=1e-9)
    assert g["tvd"] == pytest.approx(tvd, abs=1e-9)


def test_categorical_drift_counts_null_as_category(spark):
    a = spark.createDataFrame(
        [("x",), ("x",), (None,), (None,)], "c STRING"
    )
    b = spark.createDataFrame([("x",), ("x",), ("x",), (None,)], "c STRING")
    g = categorical_drift(a, b, "c", round_digits=None).first()
    # null rate moved 0.5 -> 0.25: tvd = 0.25
    assert g["n_categories"] == 2
    assert g["tvd"] == pytest.approx(0.25, abs=1e-9)


def test_drift_round_digits_zero_rounds(spark):
    """round_digits=0 means 'round to whole numbers', not 'no
    rounding' (regression: falsy-zero check)."""
    from feast_spark.operators.drift import categorical_drift, feature_drift

    ref = spark.range(0, 1000).selectExpr("CAST(id % 7 AS DOUBLE) AS v")
    cur = spark.range(0, 1000).selectExpr("CAST((id * 3) % 11 AS DOUBLE) AS v")
    row = feature_drift(ref, cur, "v", lo=0.0, hi=11.0, round_digits=0).collect()[0]
    for m in ("psi", "js_div", "tvd", "ks"):
        assert row[m] == float(int(row[m])), m

    crow = categorical_drift(
        ref.selectExpr("CAST(v AS STRING) AS v"),
        cur.selectExpr("CAST(v AS STRING) AS v"),
        "v",
        round_digits=0,
    ).collect()[0]
    for m in ("psi", "js_div", "tvd"):
        assert crow[m] == float(int(crow[m])), m
