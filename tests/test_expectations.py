"""Single-pass validation suite: per-expectation verdicts on the sf0.01
events table + synthetic edge cases, and the one-job guarantee."""

from datetime import datetime, timedelta

from pyspark.sql import Row

from feast_spark.operators.expectations import (
    freshness,
    matches_regex,
    not_null,
    row_count_between,
    unique,
    validate,
    values_between,
    values_in_set,
)
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED


def test_events_suite_passes(spark):
    ev = load_table(spark, SF_MED, "events")
    report = validate(
        ev,
        [
            row_count_between(1_000, None),
            not_null("user_id"),
            not_null("ts"),
            unique("event_id"),
            values_in_set(
                "event_type",
                ["signup", "purchase", "view", "click", "error"],
            ),
            values_between("value", 0.0, 1e9),
            freshness(
                "ts", timedelta(days=1), now=datetime(2024, 1, 31, 12)
            ),
        ],
    )
    assert report.passed, report.failures


def test_failures_reported_with_detail(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, v=0.5, kind="a", ts=datetime(2024, 1, 1)),
            Row(id=1, v=-3.0, kind="zz", ts=datetime(2024, 1, 2)),
            Row(id=2, v=None, kind="a", ts=None),
        ]
    )
    report = validate(
        df,
        [
            row_count_between(10, None),            # fail: 3 rows
            unique("id"),                           # fail: dup id 1
            values_between("v", 0.0, 1.0),          # fail: -3.0
            values_in_set("kind", ["a", "b"]),      # fail: zz
            not_null("v", max_null_frac=0.5),       # pass: 1/3 null
            freshness("ts", timedelta(days=1),
                      now=datetime(2024, 1, 2, 6)),  # pass
            matches_regex("kind", "^[a-b]+$"),       # fail: zz
        ],
    )
    assert not report.passed
    failed = {n for n, _ in report.failures}
    assert failed == {
        "row_count_between(10, None)",
        "unique(id)",
        "values_between(v, 0.0, 1.0)",
        "values_in_set(kind)",
        "matches_regex(kind)",
    }
    detail = dict(report.failures)
    assert "rows=3" in detail["row_count_between(10, None)"]


def test_empty_table_and_approx_unique(spark):
    df = spark.createDataFrame([], "id long, ts timestamp")
    report = validate(
        df,
        [
            not_null("id"),  # vacuous pass on empty
            freshness("ts", timedelta(hours=1),
                      now=datetime(2024, 1, 1)),  # fail: empty
        ],
    )
    assert dict((n, ok) for n, ok, _ in report.results) == {
        "not_null(id)": True,
        "freshness(ts)": False,
    }
    big = spark.range(10_000).withColumnRenamed("id", "k")
    assert validate(big, [unique("k", approx=True)]).passed


def test_job_count_independent_of_suite_size(spark):
    """However many expectations, validation is ONE aggregate over one
    scan (AQE materializes it as a constant couple of jobs — the count
    must NOT grow with the number of checks, the property that makes a
    50-check suite affordable at 100 TB)."""
    ev = load_table(spark, SF_MED, "events")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    small = [row_count_between(1, None), not_null("user_id")]
    big = small + [
        not_null("event_type"),
        values_between("value", 0.0, 1e12),
        values_in_set(
            "event_type",
            ["signup", "purchase", "view", "click", "error"],
        ),
        matches_regex("event_type", "^[a-z]+$"),
        freshness("ts", timedelta(days=365 * 10), now=datetime(2024, 6, 1)),
    ]

    def jobs_for(group, exps):
        sc.setJobGroup(group, group)
        validate(ev, exps)
        sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    n_small, n_big = jobs_for("val-small", small), jobs_for("val-big", big)
    assert n_big == n_small <= 2, (n_small, n_big)


def test_feature_store_validate_source(spark, tmp_path):
    from pyspark.sql import Row

    from feast_spark import (
        Entity, FeatureStore, FeatureView, FileSource, RepoConfig, ValueType,
    )

    src_path = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [Row(driver_id=1, v=0.5, ts=datetime(2024, 1, 1))]
    ).write.parquet(src_path)
    st = FeatureStore(
        spark,
        RepoConfig(
            project="valp",
            registry_path=str(tmp_path / "reg.json"),
            online_store_path=str(tmp_path / "online"),
        ),
    )
    st.apply(
        [
            Entity(name="driver", join_key="driver_id",
                   value_type=ValueType.INT64),
            FeatureView(
                name="drv", entities=["driver"],
                batch_source=FileSource(
                    path=src_path, event_timestamp_column="ts"
                ),
            ),
        ]
    )
    ok = st.validate_source("drv", [not_null("driver_id"), unique("driver_id")])
    assert ok.passed
    bad = st.validate_source("drv", [row_count_between(100, None)])
    assert not bad.passed and bad.failures[0][0] == "row_count_between(100, None)"


def test_quarantine_splits_rows_with_reasons(spark, duck):
    """Row-level quarantine: violation arrays match a DuckDB CASE
    twin over the events table; good+bad partitions the input; NULL
    rule results count as violations."""
    from pyspark.sql import functions as F

    from feast_spark.operators.expectations import (
        quarantine,
        row_between,
        row_in_set,
        row_not_null,
        with_violations,
    )
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_MED

    events = load_table(spark, SF_MED, "events")
    rules = {
        "value_range": row_between("value", 0.0, 50.0),
        "user_present": row_not_null("user_id"),
        "known_type": row_in_set(
            "event_type", ["view", "click", "purchase"]
        ),
    }
    good, bad = quarantine(events, rules)
    n_good, n_bad, n_all = good.count(), bad.count(), events.count()
    assert n_good + n_bad == n_all
    assert n_good > 0 and n_bad > 0  # both sides non-vacuous on testdata

    got = sorted(
        (r["event_id"], tuple(r["violations"]))
        for r in with_violations(events, rules).collect()
    )
    want = sorted(
        (eid, tuple(v))
        for eid, v in duck.execute("""
        SELECT event_id,
               list_filter([
                 CASE WHEN NOT COALESCE(value >= 0.0 AND value <= 50.0, FALSE)
                      THEN 'value_range' END,
                 CASE WHEN user_id IS NULL THEN 'user_present' END,
                 CASE WHEN NOT COALESCE(event_type IN ('view','click','purchase'), FALSE)
                      THEN 'known_type' END
               ], x -> x IS NOT NULL) AS violations
        FROM events
        """).fetchall()
    )
    assert got == want

    # null value -> range violation (NULL is not TRUE)
    one = spark.createDataFrame(
        [(1, None)], "id INT, value DOUBLE"
    )
    g, b = quarantine(one, {"rng": row_between("value", 0, 1)})
    assert g.count() == 0 and b.count() == 1
    assert b.collect()[0]["violations"] == ["rng"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        with_violations(events, {})
    with _pytest.raises(ValueError, match="already exists"):
        with_violations(
            with_violations(events, rules), rules
        )


def test_feature_store_quarantine_source(spark, tmp_path):
    from pyspark.sql import Row

    from feast_spark import (
        Entity, FeatureStore, FeatureView, FileSource, RepoConfig, ValueType,
    )
    from feast_spark.operators.expectations import row_between, row_not_null

    src_path = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [
            Row(driver_id=1, v=0.5, ts=datetime(2024, 1, 1)),
            Row(driver_id=2, v=9.0, ts=datetime(2024, 1, 1)),
            Row(driver_id=None, v=0.1, ts=datetime(2024, 1, 1)),
        ]
    ).write.parquet(src_path)
    st = FeatureStore(
        spark,
        RepoConfig(
            project="qrp",
            registry_path=str(tmp_path / "reg.json"),
            online_store_path=str(tmp_path / "online"),
        ),
    )
    st.apply(
        [
            Entity(name="driver", join_key="driver_id",
                   value_type=ValueType.INT64),
            FeatureView(
                name="drv", entities=["driver"],
                batch_source=FileSource(
                    path=src_path, event_timestamp_column="ts"
                ),
            ),
        ]
    )
    good, bad = st.quarantine_source(
        "drv",
        {"id": row_not_null("driver_id"), "v01": row_between("v", 0.0, 1.0)},
    )
    assert [r["driver_id"] for r in good.collect()] == [1]
    got = {tuple(r["violations"]) for r in bad.collect()}
    assert got == {("v01",), ("id",)}
