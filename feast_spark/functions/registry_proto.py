"""Reference-compatible ``feast.core.Registry`` protobuf export.

The reference persists its registry as a serialized ``Registry`` proto
(protos/feast/core/Registry.proto; registry.py reads/writes it via
generated classes).  This repo's registry is self-describing JSON —
friendlier for a Spark-native control plane — but interop matters: a
user pointing the reference's tooling (``feast registry-dump``, the Go
SDK, CI inspectors) at an exported file should see a valid Registry
message.  This module emits those bytes with the same pure-Python
wire codec used for Value/stream payloads (``functions/proto_codec``),
with every field number taken from the reference .proto files:

- Registry: entities=1, feature_tables=2, schema_version=3,
  version_id=4, last_updated=5, feature_views=6 (Registry.proto:29-37)
- Entity/EntitySpecV2/EntityMeta (Entity.proto:27-57)
- FeatureView/FeatureViewSpec(name=1, project=2, entities=3,
  features=4, tags=5, ttl=6, batch_source=7, online=8,
  stream_source=9)/FeatureViewMeta/MaterializationInterval
  (FeatureView.proto:30-84)
- FeatureSpecV2 (Feature.proto:27-35)
- DataSource (type=1, field_mapping=2, event_timestamp_column=3,
  date_partition_column=4, created_timestamp_column=5,
  file_options=11, kafka_options=13, kinesis_options=14;
  DataSource.proto:43-135) with FileFormat/StreamFormat oneofs
  (DataFormat.proto:26-60)

ValueType numbering matches Value.proto:26-44 exactly (our enum uses
the same numbers), so ``value_type`` fields are wire-identical.

Compatibility note: builds of this repo before 2026-08 (round 6)
wrote StreamFormat.proto_format under field 1 and KinesisOptions with
record_format=2/region=1/stream_name=3 — numbers that do NOT match
the reference protos (DataFormat.proto:53-54, DataSource.proto:101-111).
A registry exported by such a build decodes silently wrong under the
corrected schema (old proto_format bytes parse as
avro_format.schema_json; old record_format bytes parse as
stream_name).  Those pre-fix exports are INVALID — re-export from the
live JSON registry (the source of truth; the proto file is a derived
artifact, so no data migration is needed).  ``import_registry``
cannot distinguish them mechanically: the wire bytes are
self-consistent either way, which is why this is a documented
invalidation rather than a version gate — Registry.schema_version
stays at the reference's value so reference tooling accepts our
exports.
"""

from __future__ import annotations

from datetime import datetime, timezone

from feast_spark.functions.proto_codec import compile_decoder, encode_message

# google.protobuf well-knowns (public field numbers)
_TIMESTAMP = {
    "name": "Timestamp",
    "fields": [
        {"name": "seconds", "number": 1, "type": "int64"},
        {"name": "nanos", "number": 2, "type": "int32"},
    ],
}
_DURATION = {
    "name": "Duration",
    "fields": [
        {"name": "seconds", "number": 1, "type": "int64"},
        {"name": "nanos", "number": 2, "type": "int32"},
    ],
}
_STR_MAP_ENTRY = {
    "name": "MapEntry",
    "fields": [
        {"name": "key", "number": 1, "type": "string"},
        {"name": "value", "number": 2, "type": "string"},
    ],
}

_FILE_FORMAT = {
    "name": "FileFormat",
    "fields": [
        {"name": "parquet_format", "number": 1, "type": "message",
         "message": {"name": "ParquetFormat", "fields": []}},
    ],
}
_STREAM_FORMAT = {
    "name": "StreamFormat",
    "fields": [
        # Field numbers match reference protos/feast/core/DataFormat.proto:53-54
        # (avro_format = 1, proto_format = 2).
        {"name": "avro_format", "number": 1, "type": "message",
         "message": {"name": "AvroFormat", "fields": [
             {"name": "schema_json", "number": 1, "type": "string"}]}},
        {"name": "proto_format", "number": 2, "type": "message",
         "message": {"name": "ProtoFormat", "fields": [
             {"name": "class_path", "number": 1, "type": "string"}]}},
    ],
}
_DATA_SOURCE = {
    "name": "DataSource",
    "fields": [
        {"name": "type", "number": 1, "type": "enum"},
        {"name": "field_mapping", "number": 2, "type": "message",
         "repeated": True, "message": _STR_MAP_ENTRY},
        {"name": "event_timestamp_column", "number": 3, "type": "string"},
        {"name": "date_partition_column", "number": 4, "type": "string"},
        {"name": "created_timestamp_column", "number": 5, "type": "string"},
        {"name": "file_options", "number": 11, "type": "message",
         "message": {"name": "FileOptions", "fields": [
             {"name": "file_format", "number": 1, "type": "message",
              "message": _FILE_FORMAT},
             {"name": "file_url", "number": 2, "type": "string"}]}},
        {"name": "kafka_options", "number": 13, "type": "message",
         "message": {"name": "KafkaOptions", "fields": [
             {"name": "bootstrap_servers", "number": 1, "type": "string"},
             {"name": "topic", "number": 2, "type": "string"},
             {"name": "message_format", "number": 3, "type": "message",
              "message": _STREAM_FORMAT}]}},
        {"name": "kinesis_options", "number": 14, "type": "message",
         "message": {"name": "KinesisOptions", "fields": [
             # reference protos/feast/core/DataSource.proto:101-111:
             # region = 1, stream_name = 2, record_format = 3.
             {"name": "region", "number": 1, "type": "string"},
             {"name": "stream_name", "number": 2, "type": "string"},
             {"name": "record_format", "number": 3, "type": "message",
              "message": _STREAM_FORMAT}]}},
        {"name": "data_source_class_type", "number": 17, "type": "string"},
    ],
}

_FEATURE_SPEC_V2 = {
    "name": "FeatureSpecV2",
    "fields": [
        {"name": "name", "number": 1, "type": "string"},
        {"name": "value_type", "number": 2, "type": "enum"},
        {"name": "labels", "number": 3, "type": "message",
         "repeated": True, "message": _STR_MAP_ENTRY},
    ],
}

_ENTITY = {
    "name": "Entity",
    "fields": [
        {"name": "spec", "number": 1, "type": "message", "message": {
            "name": "EntitySpecV2",
            "fields": [
                {"name": "name", "number": 1, "type": "string"},
                {"name": "value_type", "number": 2, "type": "enum"},
                {"name": "description", "number": 3, "type": "string"},
                {"name": "join_key", "number": 4, "type": "string"},
                {"name": "labels", "number": 8, "type": "message",
                 "repeated": True, "message": _STR_MAP_ENTRY},
                {"name": "project", "number": 9, "type": "string"},
            ],
        }},
        {"name": "meta", "number": 2, "type": "message", "message": {
            "name": "EntityMeta",
            "fields": [
                {"name": "created_timestamp", "number": 1,
                 "type": "message", "message": _TIMESTAMP},
                {"name": "last_updated_timestamp", "number": 2,
                 "type": "message", "message": _TIMESTAMP},
            ],
        }},
    ],
}

_MATERIALIZATION_INTERVAL = {
    "name": "MaterializationInterval",
    "fields": [
        {"name": "start_time", "number": 1, "type": "message",
         "message": _TIMESTAMP},
        {"name": "end_time", "number": 2, "type": "message",
         "message": _TIMESTAMP},
    ],
}

_FEATURE_VIEW = {
    "name": "FeatureView",
    "fields": [
        {"name": "spec", "number": 1, "type": "message", "message": {
            "name": "FeatureViewSpec",
            "fields": [
                {"name": "name", "number": 1, "type": "string"},
                {"name": "project", "number": 2, "type": "string"},
                {"name": "entities", "number": 3, "type": "string",
                 "repeated": True},
                {"name": "features", "number": 4, "type": "message",
                 "repeated": True, "message": _FEATURE_SPEC_V2},
                {"name": "tags", "number": 5, "type": "message",
                 "repeated": True, "message": _STR_MAP_ENTRY},
                {"name": "ttl", "number": 6, "type": "message",
                 "message": _DURATION},
                {"name": "batch_source", "number": 7, "type": "message",
                 "message": _DATA_SOURCE},
                {"name": "online", "number": 8, "type": "bool"},
                {"name": "stream_source", "number": 9, "type": "message",
                 "message": _DATA_SOURCE},
            ],
        }},
        {"name": "meta", "number": 2, "type": "message", "message": {
            "name": "FeatureViewMeta",
            "fields": [
                {"name": "created_timestamp", "number": 1,
                 "type": "message", "message": _TIMESTAMP},
                {"name": "last_updated_timestamp", "number": 2,
                 "type": "message", "message": _TIMESTAMP},
                {"name": "materialization_intervals", "number": 3,
                 "type": "message", "repeated": True,
                 "message": _MATERIALIZATION_INTERVAL},
            ],
        }},
    ],
}

REGISTRY_DESCRIPTOR = {
    "name": "Registry",
    "fields": [
        {"name": "entities", "number": 1, "type": "message",
         "repeated": True, "message": _ENTITY},
        {"name": "registry_schema_version", "number": 3, "type": "string"},
        {"name": "version_id", "number": 4, "type": "string"},
        {"name": "last_updated", "number": 5, "type": "message",
         "message": _TIMESTAMP},
        {"name": "feature_views", "number": 6, "type": "message",
         "repeated": True, "message": _FEATURE_VIEW},
    ],
}


def _ts(dt: datetime | None) -> dict | None:
    if dt is None:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    epoch = dt.timestamp()
    seconds = int(epoch)
    return {"seconds": seconds, "nanos": int(round((epoch - seconds) * 1e9))}


def _str_map(d: dict | None) -> list[dict]:
    # proto3 map fields serialize as repeated MapEntry in key order
    return [{"key": k, "value": v} for k, v in sorted((d or {}).items())]


def _source_dict(src) -> dict | None:
    if src is None:
        return None
    kind = type(src).__name__
    out = {
        "field_mapping": _str_map(getattr(src, "field_mapping", None)),
        "event_timestamp_column": getattr(src, "event_timestamp_column", "") or None,
        "date_partition_column": getattr(src, "date_partition_column", "") or None,
        "created_timestamp_column": getattr(src, "created_timestamp_column", "") or None,
    }
    if kind == "FileSource":
        out["type"] = 1  # BATCH_FILE
        out["file_options"] = {
            "file_format": {"parquet_format": {}},
            "file_url": src.path,
        }
        out["data_source_class_type"] = "feast.data_source.FileSource"
    elif kind == "KafkaSource":
        out["type"] = 3  # STREAM_KAFKA
        fmt = (
            {"avro_format": {"schema_json": src.schema_json or ""}}
            if src.message_format == "avro"
            else {"proto_format": {"class_path": ""}}
        )
        out["kafka_options"] = {
            "bootstrap_servers": src.bootstrap_servers,
            "topic": src.topic,
            "message_format": fmt,
        }
        out["data_source_class_type"] = "feast.data_source.KafkaSource"
    elif kind == "KinesisSource":
        out["type"] = 4  # STREAM_KINESIS
        out["kinesis_options"] = {
            "region": getattr(src, "region", ""),
            "stream_name": getattr(src, "stream_name", ""),
            "record_format": {"proto_format": {"class_path": ""}},
        }
        out["data_source_class_type"] = "feast.data_source.KinesisSource"
    else:  # SparkSqlSource and custom sources: CUSTOM_SOURCE
        out["type"] = 6
        out["data_source_class_type"] = f"feast_spark.data_source.{kind}"
    return out


def registry_to_proto_bytes(
    registry,
    project: str = "default",
    version_id: str = "",
    last_updated: datetime | None = None,
) -> bytes:
    """Serialize a ``feast_spark.Registry`` as ``feast.core.Registry``
    bytes the reference tooling can parse."""
    entities = []
    for e in registry.list_entities():
        entities.append(
            {
                "spec": {
                    "name": e.name,
                    "value_type": e.value_type.value,
                    "description": e.description or None,
                    "join_key": e.join_key,
                    "labels": _str_map(e.labels),
                    "project": project,
                }
            }
        )
    views = []
    for v in registry.list_feature_views():
        ttl = None
        if v.ttl is not None:
            total = v.ttl.total_seconds()
            ttl = {"seconds": int(total),
                   "nanos": int(round((total - int(total)) * 1e9))}
        views.append(
            {
                "spec": {
                    "name": v.name,
                    "project": project,
                    "entities": list(v.entities),
                    "features": [
                        {"name": f.name, "value_type": f.dtype.value}
                        for f in v.features
                    ],
                    "tags": _str_map(v.tags),
                    "ttl": ttl,
                    "batch_source": _source_dict(v.batch_source),
                    "online": v.online or None,  # proto3: false is absent
                    "stream_source": _source_dict(v.stream_source),
                },
                "meta": {
                    "materialization_intervals": [
                        {"start_time": _ts(s), "end_time": _ts(e)}
                        for s, e in v.materialization_intervals
                    ],
                },
            }
        )
    msg = {
        "entities": entities,
        "feature_views": views,
        "registry_schema_version": "1",
        "version_id": version_id or None,
        "last_updated": _ts(last_updated),
    }
    return encode_message(REGISTRY_DESCRIPTOR, msg)


def parse_registry_proto(payload: bytes) -> dict:
    """Decode Registry bytes back to a plain dict (tests + debugging;
    the same compiled-descriptor decoder as the stream payload path)."""
    return compile_decoder(REGISTRY_DESCRIPTOR)(bytes(payload))


def registry_from_proto_bytes(payload: bytes):
    """Decode ``feast.core.Registry`` bytes (e.g. a reference
    ``registry.db`` file) into this repo's Entity/FeatureView objects,
    ready for ``FeatureStore.apply`` — the switch-over path for a
    reference user: point this at their registry file and apply.

    BigQuery/Redshift batch sources have no Spark-native equivalent
    table reference here and import as ``SparkSqlSource`` with the
    table/query string; unknown source types raise."""
    from datetime import timedelta

    from feast_spark.data_source import (
        FileSource,
        KafkaSource,
        KinesisSource,
        SparkSqlSource,
    )
    from feast_spark.entity import Entity
    from feast_spark.feature import Feature
    from feast_spark.feature_view import FeatureView
    from feast_spark.types import ValueType

    reg = parse_registry_proto(payload)

    def _map(entries) -> dict:
        return {e["key"]: e["value"] for e in (entries or [])}

    def _source(d):
        if d is None:
            return None
        common = {
            "event_timestamp_column": d.get("event_timestamp_column") or "",
            "created_timestamp_column": d.get("created_timestamp_column") or "",
            "date_partition_column": d.get("date_partition_column") or "",
            "field_mapping": _map(d.get("field_mapping")),
        }
        t = d.get("type") or 0
        if t == 1 and d.get("file_options"):
            return FileSource(path=d["file_options"].get("file_url") or "",
                              **common)
        if t == 3 and d.get("kafka_options"):
            ko = d["kafka_options"]
            fmt = ko.get("message_format") or {}
            return KafkaSource(
                bootstrap_servers=ko.get("bootstrap_servers") or "",
                topic=ko.get("topic") or "",
                message_format="avro" if fmt.get("avro_format") else "proto",
                **common,
            )
        if t == 4 and d.get("kinesis_options"):
            kio = d["kinesis_options"]
            return KinesisSource(
                region=kio.get("region") or "",
                stream_name=kio.get("stream_name") or "",
                **common,
            )
        if t in (2, 5):  # BATCH_BIGQUERY / BATCH_REDSHIFT
            return SparkSqlSource(query="", **common)
        raise ValueError(f"unsupported DataSource type {t} in registry proto")

    objs = []
    for e in reg["entities"] or []:
        spec = e["spec"]
        objs.append(
            Entity(
                name=spec["name"],
                value_type=ValueType(spec.get("value_type") or 0),
                join_key=spec.get("join_key") or spec["name"],
                description=spec.get("description") or "",
                labels=_map(spec.get("labels")),
            )
        )
    for v in reg["feature_views"] or []:
        spec = v["spec"]
        ttl = None
        if spec.get("ttl") is not None:
            ttl = timedelta(
                seconds=(spec["ttl"].get("seconds") or 0),
                microseconds=(spec["ttl"].get("nanos") or 0) / 1000,
            )
        objs.append(
            FeatureView(
                name=spec["name"],
                entities=list(spec.get("entities") or []),
                features=[
                    Feature(f["name"], ValueType(f.get("value_type") or 0))
                    for f in (spec.get("features") or [])
                ],
                ttl=ttl,
                online=bool(spec.get("online")),
                tags=_map(spec.get("tags")),
                batch_source=_source(spec.get("batch_source")),
                stream_source=_source(spec.get("stream_source")),
            )
        )
    return objs
