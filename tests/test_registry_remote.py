"""Remote-scheme registry + online store: the reference's GCS/S3
registry stores (registry.py:503-611) re-expressed as one Hadoop-FS
path, tested against file:// URIs (same code path as s3a://gs://hdfs://
— only the connector differs)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

from feast_spark import (
    Entity,
    FeatureStore,
    FeatureView,
    FileSource,
    RepoConfig,
    ValueType,
)
from feast_spark.io.fs import HadoopFS
from feast_spark.registry import Registry


def test_registry_roundtrip_over_hadoopfs(spark, tmp_path):
    uri = f"file://{tmp_path}/meta/registry.json"
    reg = Registry(uri, fs=HadoopFS(spark))
    reg.apply_entity(Entity(name="driver", join_key="driver_id",
                            value_type=ValueType.INT64))
    view = FeatureView(
        name="fv",
        entities=["driver"],
        ttl=timedelta(days=1),
        batch_source=FileSource(path="/tmp/x.parquet",
                                event_timestamp_column="ts"),
    )
    from feast_spark.feature import Feature

    view.features = [Feature(name="value", dtype=ValueType.DOUBLE)]
    reg.apply_feature_view(view)
    reg.commit()

    fresh = Registry(uri, fs=HadoopFS(spark))
    assert [e.name for e in fresh.list_entities()] == ["driver"]
    assert fresh.get_feature_view("fv").ttl == timedelta(days=1)


def test_refresh_sees_other_writer(spark, tmp_path):
    uri = f"file://{tmp_path}/registry.json"
    a = Registry(uri, fs=HadoopFS(spark))
    b = Registry(uri, fs=HadoopFS(spark))
    a.apply_entity(Entity(name="user", join_key="user_id",
                          value_type=ValueType.STRING))
    a.commit()
    assert b.entities == {}
    b.refresh()
    assert "user" in b.entities


def test_feature_store_e2e_over_file_scheme(spark, tmp_path):
    """Full materialize -> serve with registry AND online store rooted
    at URIs resolved through the Hadoop FileSystem API."""
    now = datetime.fromisoformat("2021-06-01T12:00:00")
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [Row(driver_id=1, value=0.5, ts=now - timedelta(hours=1))]
    ).write.parquet(src)
    st = FeatureStore(
        spark,
        RepoConfig(
            project="t",
            registry_path=f"file://{tmp_path}/meta/registry.json",
            online_store_path=f"file://{tmp_path}/online",
        ),
    )
    assert isinstance(st.registry.fs, HadoopFS)
    assert isinstance(st.online_store.fs, HadoopFS)
    st.apply(
        [
            Entity(name="driver", join_key="driver_id", value_type=ValueType.INT64),
            FeatureView(
                name="fv",
                entities=["driver"],
                ttl=timedelta(days=5),
                batch_source=FileSource(path=src, event_timestamp_column="ts"),
            ),
        ]
    )
    st.materialize(now - timedelta(days=1), now)
    resp = st.get_online_features(["fv:value"], [{"driver_id": 1}])
    assert resp["value"][0] == pytest.approx(0.5)
    # a second session over the same remote registry serves identically
    st2 = FeatureStore(
        spark,
        RepoConfig(
            project="t",
            registry_path=f"file://{tmp_path}/meta/registry.json",
            online_store_path=f"file://{tmp_path}/online",
        ),
    )
    resp2 = st2.get_online_features(["fv:value"], [{"driver_id": 1}])
    assert resp2["value"][0] == pytest.approx(0.5)
