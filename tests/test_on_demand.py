"""On-demand feature views: spark-native and pandas transforms, source
auto-fetch, prefixing, registry metadata round-trip."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark import (
    Entity,
    Feature,
    FeatureStore,
    FeatureView,
    FileSource,
    OnDemandFeatureView,
    RepoConfig,
    ValueType,
)
from feast_spark.registry import Registry


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def store(spark, tmp_path):
    now = ts("2021-06-01 12:00:00")
    rows = [
        Row(driver_id=1, value=0.1, ts=now - timedelta(hours=4)),
        Row(driver_id=2, value=0.5, ts=now - timedelta(hours=2)),
    ]
    src_path = str(tmp_path / "src.parquet")
    spark.createDataFrame(rows).write.parquet(src_path)
    st = FeatureStore(
        spark,
        RepoConfig(
            project="t",
            registry_path=str(tmp_path / "registry.json"),
            online_store_path=str(tmp_path / "online"),
        ),
    )
    st.apply(
        [
            Entity(name="driver", join_key="driver_id", value_type=ValueType.INT64),
            FeatureView(
                name="stats",
                entities=["driver"],
                ttl=timedelta(days=5),
                batch_source=FileSource(path=src_path, event_timestamp_column="ts"),
            ),
            OnDemandFeatureView(
                name="derived",
                sources=["stats:value"],
                features=[Feature("value_x10", ValueType.DOUBLE)],
                transform=lambda df: df.withColumn(
                    "value_x10", F.col("value") * 10.0
                ),
            ),
        ]
    )
    st._now = now
    return st


def _entity_df(spark, now):
    return spark.createDataFrame(
        [
            Row(driver_id=1, event_timestamp=now),
            Row(driver_id=2, event_timestamp=now),
            Row(driver_id=3, event_timestamp=now),
        ]
    )


def test_spark_transform_with_auto_fetched_source(store, spark):
    out = store.get_historical_features(
        _entity_df(spark, store._now), ["derived:value_x10"]
    ).to_spark_df()
    # auto-fetched source column is dropped from the output
    assert set(out.columns) == {"driver_id", "event_timestamp", "value_x10"}
    vals = {r["driver_id"]: r["value_x10"] for r in out.collect()}
    assert vals[1] == pytest.approx(1.0)
    assert vals[2] == pytest.approx(5.0)
    assert vals[3] is None


def test_source_kept_when_requested_and_prefixed(store, spark):
    out = store.get_historical_features(
        _entity_df(spark, store._now),
        ["stats:value", "derived:value_x10"],
        full_feature_names=True,
    ).to_spark_df()
    assert set(out.columns) == {
        "driver_id", "event_timestamp", "stats__value", "derived__value_x10",
    }
    row = {r["driver_id"]: r for r in out.collect()}
    assert row[1]["stats__value"] == pytest.approx(0.1)
    assert row[1]["derived__value_x10"] == pytest.approx(1.0)


def test_pandas_transform_mode(store, spark, tmp_path):
    def pandas_tf(pdf):
        out = pdf[["value"]].copy()
        out["value_sq"] = out["value"] * out["value"]
        return out

    store.apply(
        [
            OnDemandFeatureView(
                name="derived_pd",
                sources=["stats:value"],
                features=[Feature("value_sq", ValueType.DOUBLE)],
                transform=pandas_tf,
                mode="pandas",
            )
        ]
    )
    out = store.get_historical_features(
        _entity_df(spark, store._now), ["derived_pd:value_sq"]
    ).to_spark_df()
    vals = {r["driver_id"]: r["value_sq"] for r in out.collect()}
    assert vals[2] == pytest.approx(0.25)


def test_registry_roundtrip_metadata_only(store, tmp_path):
    reloaded = Registry(str(tmp_path / "registry.json"))
    ov = reloaded.get_on_demand_view("derived")
    assert ov.sources == ["stats:value"]
    assert ov.feature_names == ["value_x10"]
    assert ov.transform is None
    with pytest.raises(ValueError, match="no transform bound"):
        ov.apply_transform(None)


def test_on_demand_at_online_serving(store, spark):
    from datetime import timedelta

    now = store._now
    store.materialize(now - timedelta(days=1), now + timedelta(days=1))
    out = store.get_online_features(
        ["derived:value_x10"],
        [{"driver_id": 1}, {"driver_id": 2}, {"driver_id": 42}],
    )
    assert out["value_x10"][0] == pytest.approx(1.0)
    assert out["value_x10"][1] == pytest.approx(5.0)
    assert out["value_x10"][2] is None
    assert out["__statuses"]["value_x10"] == ["PRESENT", "PRESENT", "NOT_FOUND"]
