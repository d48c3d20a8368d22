"""Registry proto export: golden wire bytes (hand-assembled from the
reference's field numbers), structural roundtrip through the
compiled-descriptor decoder, and the FeatureStore facade path."""

from datetime import timedelta

import pytest

from feast_spark import (
    Entity,
    Feature,
    FeatureStore,
    FeatureView,
    FileSource,
    KafkaSource,
    RepoConfig,
    ValueType,
)
from feast_spark.functions.registry_proto import (
    parse_registry_proto,
    registry_to_proto_bytes,
)


@pytest.fixture()
def store(spark, tmp_path):
    from datetime import datetime

    from pyspark.sql import Row

    src = str(tmp_path / "stats.parquet")
    spark.createDataFrame(
        [Row(id=1, rate=1.0, tag="x", ts=datetime(2021, 6, 1, 10),
             created=datetime(2021, 6, 1, 10))]
    ).write.parquet(src)
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
            Entity(name="driver", join_key="driver_id",
                   value_type=ValueType.INT64, description="a driver"),
            FeatureView(
                name="stats",
                entities=["driver"],
                features=[Feature("rate", ValueType.DOUBLE),
                          Feature("tag", ValueType.STRING)],
                ttl=timedelta(hours=2),
                tags={"team": "core"},
                batch_source=FileSource(
                    path=src,
                    event_timestamp_column="ts",
                    created_timestamp_column="created",
                    field_mapping={"id": "driver_id"},
                ),
                stream_source=KafkaSource(
                    bootstrap_servers="k:9092",
                    topic="stats",
                    message_format="avro",
                    event_timestamp_column="ts",
                ),
            ),
        ]
    )
    return st


def test_golden_bytes_minimal_entity():
    """Hand-assembled wire bytes for a one-entity registry: every tag
    byte comes straight from the reference's field numbers — pins the
    encoder against Registry.proto/Entity.proto, not against itself."""

    class _Reg:
        def list_entities(self):
            return [Entity(name="driver", join_key="driver_id",
                           value_type=ValueType.INT64)]

        def list_feature_views(self):
            return []

    got = registry_to_proto_bytes(_Reg(), project="p")
    spec = (
        b"\x0a\x06driver"        # EntitySpecV2.name = 1 (LEN)
        b"\x10\x04"               # .value_type = 2 (varint, INT64=4)
        b"\x22\x09driver_id"      # .join_key = 4 (LEN)
        b"\x4a\x01p"              # .project = 9 (LEN)
    )
    entity = b"\x0a" + bytes([len(spec)]) + spec   # Entity.spec = 1
    want = (
        b"\x0a" + bytes([len(entity)]) + entity    # Registry.entities = 1
        + b"\x1a\x011"                             # .registry_schema_version = 3
    )
    assert got == want


def test_roundtrip_full_store(store):
    payload = store.export_registry_proto()
    reg = parse_registry_proto(payload)
    assert reg["registry_schema_version"] == "1"
    (ent,) = reg["entities"]
    assert ent["spec"]["name"] == "driver"
    assert ent["spec"]["value_type"] == ValueType.INT64.value
    assert ent["spec"]["join_key"] == "driver_id"
    assert ent["spec"]["description"] == "a driver"
    assert ent["spec"]["project"] == "t"

    (view,) = reg["feature_views"]
    spec = view["spec"]
    assert spec["name"] == "stats"
    assert spec["project"] == "t"
    assert spec["entities"] == ["driver"]
    assert [f["name"] for f in spec["features"]] == ["rate", "tag"]
    assert [f["value_type"] for f in spec["features"]] == [
        ValueType.DOUBLE.value, ValueType.STRING.value,
    ]
    assert spec["tags"] == [{"key": "team", "value": "core"}]
    assert spec["ttl"]["seconds"] == 7200
    assert spec["online"] is True

    batch = spec["batch_source"]
    assert batch["type"] == 1  # BATCH_FILE
    assert batch["event_timestamp_column"] == "ts"
    assert batch["created_timestamp_column"] == "created"
    assert batch["field_mapping"] == [{"key": "id", "value": "driver_id"}]
    assert batch["file_options"]["file_url"].endswith("stats.parquet")
    assert batch["file_options"]["file_format"]["parquet_format"] is not None

    stream = spec["stream_source"]
    assert stream["type"] == 3  # STREAM_KAFKA
    assert stream["kafka_options"]["bootstrap_servers"] == "k:9092"
    assert stream["kafka_options"]["topic"] == "stats"
    assert stream["kafka_options"]["message_format"]["avro_format"] is not None


def test_materialization_intervals_exported(store):
    from datetime import datetime

    store.materialize(datetime(2021, 6, 1), datetime(2021, 6, 2), ["stats"])
    reg = parse_registry_proto(store.export_registry_proto())
    intervals = reg["feature_views"][0]["meta"]["materialization_intervals"]
    assert len(intervals) == 1
    assert intervals[0]["start_time"]["seconds"] is not None
    assert intervals[0]["end_time"]["seconds"] > intervals[0]["start_time"]["seconds"]


def test_export_writes_file(store, tmp_path):
    path = str(tmp_path / "registry.pb")
    payload = store.export_registry_proto(path)
    with open(path, "rb") as f:
        assert f.read() == payload


def test_import_roundtrip_reapply(store, spark, tmp_path):
    """Export -> import -> apply into a FRESH store reproduces the
    same registry (the reference-user switch-over path)."""
    from feast_spark.functions.registry_proto import registry_from_proto_bytes

    payload = store.export_registry_proto()
    objs = registry_from_proto_bytes(payload)
    assert [type(o).__name__ for o in objs] == ["Entity", "FeatureView"]

    st2 = FeatureStore(
        spark,
        RepoConfig(
            project="t",  # same project: re-export must be byte-identical
            registry_path=str(tmp_path / "registry2.json"),
            online_store_path=str(tmp_path / "online2"),
        ),
    )
    st2.apply(objs)
    e = st2.registry.get_entity("driver")
    assert (e.join_key, e.value_type) == ("driver_id", ValueType.INT64)
    v = st2.registry.get_feature_view("stats")
    assert v.feature_names == ["rate", "tag"]
    assert v.ttl == timedelta(hours=2)
    assert v.tags == {"team": "core"}
    assert v.batch_source.path.endswith("stats.parquet")
    assert v.batch_source.field_mapping == {"id": "driver_id"}
    assert v.stream_source.topic == "stats"
    assert v.stream_source.message_format == "avro"
    # and the re-exported bytes match the original export exactly
    assert st2.export_registry_proto() == store.export_registry_proto()


# ---------------------------------------------------------------------------
# Cross-check descriptor field numbers against the reference .proto sources.
# Guards against silent renumbering: an exported registry must decode with
# the reference's own compiled protos.

_REF_PROTOS = "/root/reference/protos/feast/core"


def _proto_field_numbers(path, message):
    """Parse `field_name -> number` for one message from a .proto file.

    Minimal parser: finds the `message <name> {` block (tracking brace
    depth) and regexes `<type> <name> = <number>;` lines, including
    oneof members.
    """
    import os
    import re

    with open(path) as f:
        text = f.read()
    m = re.search(r"\bmessage\s+%s\s*\{" % re.escape(message), text)
    assert m, f"{message} not found in {path}"
    depth, i = 1, m.end()
    start = m.end()
    while depth and i < len(text):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    body = text[start:i - 1]
    out = {}
    for fm in re.finditer(r"^\s*(?:repeated\s+)?[\w.<>, ]+\s+(\w+)\s*=\s*(\d+)\s*;",
                          body, re.M):
        out[fm.group(1)] = int(fm.group(2))
    return out


needs_reference = pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_PROTOS),
    reason="reference protos not available")


@needs_reference
def test_stream_format_numbers_match_reference():
    from feast_spark.functions.registry_proto import _STREAM_FORMAT

    ref = _proto_field_numbers(f"{_REF_PROTOS}/DataFormat.proto", "StreamFormat")
    ours = {f["name"]: f["number"] for f in _STREAM_FORMAT["fields"]}
    assert ours == {k: ref[k] for k in ours}, (ours, ref)
    assert ours["avro_format"] == 1 and ours["proto_format"] == 2


@needs_reference
def test_kinesis_options_numbers_match_reference():
    from feast_spark.functions.registry_proto import _DATA_SOURCE

    kin = next(f for f in _DATA_SOURCE["fields"]
               if f["name"] == "kinesis_options")["message"]
    ref = _proto_field_numbers(f"{_REF_PROTOS}/DataSource.proto", "KinesisOptions")
    ours = {f["name"]: f["number"] for f in kin["fields"]}
    assert ours == {k: ref[k] for k in ours}, (ours, ref)
    assert ours == {"region": 1, "stream_name": 2, "record_format": 3}


@needs_reference
def test_data_source_and_kafka_numbers_match_reference():
    from feast_spark.functions.registry_proto import _DATA_SOURCE

    ref = _proto_field_numbers(f"{_REF_PROTOS}/DataSource.proto", "DataSource")
    ours = {f["name"]: f["number"] for f in _DATA_SOURCE["fields"]}
    assert ours == {k: ref[k] for k in ours}, (ours, ref)
    kafka = next(f for f in _DATA_SOURCE["fields"]
                 if f["name"] == "kafka_options")["message"]
    refk = _proto_field_numbers(f"{_REF_PROTOS}/DataSource.proto", "KafkaOptions")
    oursk = {f["name"]: f["number"] for f in kafka["fields"]}
    assert oursk == {k: refk[k] for k in oursk}, (oursk, refk)
