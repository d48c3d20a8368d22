"""Protobuf wire-format codec: roundtrip over every supported scalar,
packed/unpacked repeated, nested messages, unknown-field skipping, and
the Kafka parse path (ProtoFormat, reference data_format.py:116-133)."""

import json

import pytest
from pyspark.sql import Row

from feast_spark.data_source import KafkaSource
from feast_spark.functions.proto_codec import (
    compile_decoder,
    decode_proto,
    encode_message,
    proto_to_spark_type,
)
from feast_spark.streaming.ingest import parse_kafka_stream

DESC = {
    "name": "DriverUpdate",
    "fields": [
        {"number": 1, "name": "driver_id", "type": "int64"},
        {"number": 2, "name": "value", "type": "double"},
        {"number": 3, "name": "label", "type": "string"},
        {"number": 4, "name": "active", "type": "bool"},
        {"number": 5, "name": "tags", "type": "string", "repeated": True},
        {"number": 6, "name": "scores", "type": "float", "repeated": True},
        {"number": 7, "name": "counts", "type": "sint32", "repeated": True},
        {
            "number": 8,
            "name": "meta",
            "type": "message",
            "message": {
                "fields": [
                    {"number": 1, "name": "source", "type": "string"},
                    {"number": 2, "name": "version", "type": "int32"},
                ]
            },
        },
        {"number": 9, "name": "raw", "type": "bytes"},
    ],
}


def test_roundtrip_full_message():
    msg = {
        "driver_id": 42,
        "value": 0.75,
        "label": "héllo",
        "active": True,
        "tags": ["a", "b"],
        "scores": [1.5, -2.5],
        "counts": [0, -1, 63, -64],
        "meta": {"source": "s3", "version": 3},
        "raw": b"\x00\xff",
    }
    out = compile_decoder(DESC)(encode_message(DESC, msg))
    assert out == msg


@pytest.mark.parametrize(
    "ftype,values",
    [
        ("int32", [0, 1, -1, 2**31 - 1, -(2**31)]),
        ("int64", [0, -1, 2**62, -(2**62)]),
        ("uint32", [0, 2**32 - 1]),
        ("uint64", [0, 2**63 - 1]),
        ("sint32", [0, -1, 1, 2**31 - 1, -(2**31)]),
        ("sint64", [0, -(2**62), 2**62]),
        ("fixed32", [0, 2**32 - 1]),
        ("fixed64", [0, 2**63 - 1]),
        ("sfixed32", [-(2**31), 2**31 - 1]),
        ("sfixed64", [-(2**63), 2**63 - 1]),
        ("double", [0.0, -1.25, 1e300]),
        ("bool", [True, False]),
        ("enum", [0, 7]),
    ],
)
def test_scalar_widths(ftype, values):
    d = {"fields": [{"number": 1, "name": "v", "type": ftype}]}
    for v in values:
        got = compile_decoder(d)(encode_message(d, {"v": v}))["v"]
        assert got == v, (ftype, v)


def test_unpacked_repeated_scalars_accepted():
    """Conformant decoders accept repeated scalars in both encodings;
    proto2 writers emit them unpacked."""
    d = {"fields": [{"number": 1, "name": "xs", "type": "int64",
                     "repeated": True}]}
    # hand-build unpacked: (key=1<<3|0, varint) three times
    buf = b"\x08\x05\x08\x07\x08\x09"
    assert compile_decoder(d)(buf) == {"xs": [5, 7, 9]}
    # packed encoding of the same values
    assert compile_decoder(d)(encode_message(d, {"xs": [5, 7, 9]})) == {
        "xs": [5, 7, 9]
    }


def test_unknown_fields_skipped_and_missing_null():
    wide = {
        "fields": DESC["fields"],
    }
    narrow = {
        "fields": [
            {"number": 1, "name": "driver_id", "type": "int64"},
            {"number": 8, "name": "meta", "type": "message",
             "message": DESC["fields"][7]["message"]},
        ]
    }
    blob = encode_message(
        wide,
        {"driver_id": 7, "value": 1.0, "label": "x", "active": False,
         "tags": ["t"], "scores": [0.5], "counts": [1],
         "meta": {"source": "k", "version": 1}, "raw": b"z"},
    )
    out = compile_decoder(narrow)(blob)
    assert out == {"driver_id": 7, "meta": {"source": "k", "version": 1}}
    # absent fields -> None
    out2 = compile_decoder(narrow)(encode_message(narrow, {"driver_id": 1}))
    assert out2 == {"driver_id": 1, "meta": None}


def test_last_one_wins_for_duplicates():
    d = {"fields": [{"number": 1, "name": "v", "type": "int64"}]}
    buf = b"\x08\x01\x08\x02"  # v=1 then v=2
    assert compile_decoder(d)(buf) == {"v": 2}


def test_decode_proto_dataframe(spark):
    blobs = [
        encode_message(DESC, {"driver_id": 1, "value": 0.5, "tags": ["a"]}),
        encode_message(DESC, {"driver_id": 2, "scores": [1.0, 2.0]}),
        None,
    ]
    df = spark.createDataFrame([Row(value=b) for b in blobs])
    out = decode_proto(df, "value", json.dumps(DESC))
    assert [f.name for f in out.schema.fields] == [
        "driver_id", "value", "label", "active", "tags", "scores",
        "counts", "meta", "raw",
    ]
    rows = {r["driver_id"]: r for r in out.collect()}
    assert rows[1]["value"] == 0.5 and rows[1]["tags"] == ["a"]
    assert rows[2]["scores"] == [1.0, 2.0] and rows[2]["label"] is None
    assert None in rows  # null payload -> all-null row


def test_parse_kafka_proto_payload(spark):
    """Proto-encoded kafka values decode through mapInPandas and honor
    the field-mapping contract, matching the json/avro paths."""
    source = KafkaSource(
        topic="x",
        message_format="proto",
        schema_json=json.dumps(DESC),
        field_mapping={"value": "rate"},
    )
    raw = spark.createDataFrame(
        [
            Row(value=encode_message(DESC, {"driver_id": 1, "value": 0.9})),
            Row(value=encode_message(DESC, {"driver_id": 2})),
        ]
    )
    out = parse_kafka_stream(raw, source)
    got = {r["driver_id"]: r for r in out.collect()}
    assert got[1]["rate"] == pytest.approx(0.9)
    assert got[2]["rate"] is None
    assert "value" not in out.columns


def test_spark_type_mapping():
    st = proto_to_spark_type(DESC)
    assert st["driver_id"].dataType.simpleString() == "bigint"
    assert st["scores"].dataType.simpleString() == "array<float>"
    assert st["meta"].dataType.simpleString() == "struct<source:string,version:int>"
    assert st["raw"].dataType.simpleString() == "binary"


# ---------------------------------------------------------------------------
# property-based roundtrip (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:
    _PROP_DESC = {
        "fields": [
            {"number": 1, "name": "a", "type": "int64"},
            {"number": 2, "name": "b", "type": "sint64"},
            {"number": 3, "name": "c", "type": "double"},
            {"number": 4, "name": "d", "type": "string"},
            {"number": 5, "name": "e", "type": "bool"},
            {"number": 6, "name": "f", "type": "int64", "repeated": True},
            {"number": 7, "name": "g", "type": "bytes"},
        ]
    }
    _i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

    @settings(max_examples=200, deadline=None)
    @given(
        st.fixed_dictionaries(
            {
                "a": st.none() | _i64,
                "b": st.none() | _i64,
                "c": st.none()
                | st.floats(allow_nan=False, allow_infinity=True),
                "d": st.none() | st.text(max_size=80),
                "e": st.none() | st.booleans(),
                "f": st.none() | st.lists(_i64, max_size=20),
                "g": st.none() | st.binary(max_size=80),
            }
        )
    )
    def test_proto_roundtrip_property(msg):
        """decode(encode(m)) == m for arbitrary field values, with
        None/[] collapsing to absent-on-the-wire (both decode to the
        null/empty-start state)."""
        out = compile_decoder(_PROP_DESC)(encode_message(_PROP_DESC, msg))
        for k, v in msg.items():
            if v is None or v == []:
                assert out[k] is None
            else:
                assert out[k] == v, k
