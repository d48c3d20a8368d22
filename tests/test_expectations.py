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
