"""export_online_wire: materialization window in the reference's wire
online-store shape (Value protos + binary entity keys), decoded back and
checked against the typed latest-per-key pull."""

from datetime import datetime, timedelta

from pyspark.sql import Row

from feast_spark import (
    Entity,
    FeatureStore,
    FeatureView,
    FileSource,
    RepoConfig,
    ValueType,
)
from feast_spark.functions.value_proto import (
    decode_value,
    serialize_entity_key,
)


def ts(s):
    return datetime.fromisoformat(s)


def test_export_online_wire_roundtrip(spark, tmp_path):
    now = ts("2021-06-01 12:00:00")
    rows = [
        Row(driver_id=1, value=0.1, ts=now - timedelta(hours=4)),
        Row(driver_id=1, value=0.3, ts=now - timedelta(hours=3)),
        Row(driver_id=2, value=None, ts=now - timedelta(hours=4)),
        Row(driver_id=3, value=5.0, ts=now - timedelta(hours=1)),
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
                name="fv",
                entities=["driver"],
                ttl=timedelta(days=5),
                batch_source=FileSource(
                    path=src_path, event_timestamp_column="ts"
                ),
            ),
        ]
    )

    out_path = str(tmp_path / "wire")
    wire = st.export_online_wire(
        "fv", now - timedelta(days=1), now, path=out_path
    )
    rows_out = wire.collect()
    # latest-per-key: 3 entities x 1 feature
    assert len(rows_out) == 3
    by_key = {bytes(r["entity_key"]): r for r in rows_out}
    ek = lambda i: serialize_entity_key(["driver_id"], [(i, "INT64")])  # noqa: E731
    assert set(by_key) == {ek(1), ek(2), ek(3)}
    assert decode_value(bytes(by_key[ek(1)]["value"])) == ("double_val", 0.3)
    assert decode_value(bytes(by_key[ek(3)]["value"])) == ("double_val", 5.0)
    # null feature -> empty Value message
    assert bytes(by_key[ek(2)]["value"]) == b""
    assert all(r["feature_name"] == "value" for r in rows_out)
    # event_ts survives for ttl checks on the serving side
    assert by_key[ek(1)]["ts"] == now - timedelta(hours=3)

    # the parquet copy is the same frame
    persisted = spark.read.parquet(out_path)
    assert persisted.count() == 3
    assert set(persisted.columns) == {
        "entity_key",
        "feature_name",
        "value",
        "ts",
    }


def test_export_online_wire_v1_key_compat(spark, tmp_path):
    """key_version=1 reproduces the reference's exact byte layout."""
    import struct

    now = ts("2021-06-01 12:00:00")
    src_path = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [Row(driver_id=7, value=1.5, ts=now)]
    ).write.parquet(src_path)
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
                name="fv",
                entities=["driver"],
                batch_source=FileSource(
                    path=src_path, event_timestamp_column="ts"
                ),
            ),
        ]
    )
    wire = st.export_online_wire(
        "fv", now - timedelta(days=1), now + timedelta(hours=1), key_version=1
    )
    (row,) = wire.collect()
    expected = (
        struct.pack("<I", 2)  # STRING name tag
        + b"driver_id"
        + struct.pack("<I", 4)  # INT64 value tag
        + struct.pack("<I", 4)  # v1 packs int64 in 4 bytes (<l)
        + struct.pack("<l", 7)
    )
    assert bytes(row["entity_key"]) == expected
