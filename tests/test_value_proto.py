"""Value-proto wire codec + entity-key encoding (F5).

Golden byte strings are hand-derived from the public protobuf wire
spec and the field numbers in protos/feast/types/Value.proto, so a
pass here means any stock protobuf runtime parses our bytes (and we
parse theirs).  Entity-key goldens replay the exact struct layout of
sdk/python/feast/infra/key_encoding_utils.py:22-48.
"""

import struct

import pytest

from feast_spark.functions.value_proto import (
    VALUE_TYPES,
    decode_value,
    deserialize_entity_key,
    encode_value,
    from_online_format,
    serialize_entity_key,
    to_online_format,
    value_type_of,
)


# ---------------------------------------------------------------------------
# golden wire bytes (spec-derived, runtime-independent)
# ---------------------------------------------------------------------------


def test_scalar_golden_bytes():
    # string_val ("ab"): field 2, LEN -> tag 0x12, len 2
    assert encode_value("ab", "STRING") == b"\x12\x02ab"
    # int64_val (42): field 4, VARINT -> tag 0x20
    assert encode_value(42, "INT64") == b"\x20\x2a"
    # int32_val (1): field 3, VARINT -> tag 0x18
    assert encode_value(1, "INT32") == b"\x18\x01"
    # double_val (1.5): field 5, FIX64 -> tag 0x29
    assert encode_value(1.5, "DOUBLE") == b"\x29" + struct.pack("<d", 1.5)
    # float_val (0.5): field 6, FIX32 -> tag 0x35
    assert encode_value(0.5, "FLOAT") == b"\x35" + struct.pack("<f", 0.5)
    # bool_val (True): field 7, VARINT -> tag 0x38
    assert encode_value(True, "BOOL") == b"\x38\x01"
    # bytes_val: field 1, LEN -> tag 0x0a
    assert encode_value(b"\x00\xff", "BYTES") == b"\x0a\x02\x00\xff"
    # unix_timestamp_val (100): field 8, VARINT -> tag 0x40
    assert encode_value(100, "UNIX_TIMESTAMP") == b"\x40\x64"


def test_negative_int_is_ten_byte_varint():
    # protobuf encodes negative int32/int64 as 64-bit two's-complement
    # varints (always 10 bytes) — required for runtime interop
    buf = encode_value(-1, "INT64")
    assert buf == b"\x20" + b"\xff" * 9 + b"\x01"
    assert decode_value(buf) == ("int64_val", -1)
    buf32 = encode_value(-7, "INT32")
    assert len(buf32) == 11  # tag + 10-byte varint
    assert decode_value(buf32) == ("int32_val", -7)


def test_list_golden_bytes():
    # int64_list_val [1,2,3]: field 14 LEN (tag 0x72), nested Int64List
    # with packed repeated field 1 (tag 0x0a, len 3, varints 1 2 3)
    assert encode_value([1, 2, 3], "INT64_LIST") == b"\x72\x05\x0a\x03\x01\x02\x03"
    # float_list_val [1.0]: field 16 -> tag (16<<3)|2 = 0x82 0x01
    inner = b"\x0a\x04" + struct.pack("<f", 1.0)
    assert encode_value([1.0], "FLOAT_LIST") == b"\x82\x01" + bytes([len(inner)]) + inner
    # string_list_val ["a","bc"]: field 12 LEN (tag 0x62); strings are
    # unpacked repeated LEN fields inside the wrapper
    assert (
        encode_value(["a", "bc"], "STRING_LIST")
        == b"\x62\x07\x0a\x01a\x0a\x02bc"
    )


def test_null_and_empty_list():
    assert encode_value(None, "STRING") == b""
    assert decode_value(b"") == (None, None)
    # empty list: present wrapper, zero-length payload — distinct from null
    buf = encode_value([], "INT64_LIST")
    assert buf == b"\x72\x00"
    assert decode_value(buf) == ("int64_list_val", [])


@pytest.mark.parametrize(
    "vt,val",
    [
        ("BYTES", b"\x01\x02"),
        ("STRING", "héllo"),
        ("INT32", -(2**31)),
        ("INT64", 2**62),
        ("DOUBLE", -2.5e300),
        ("BOOL", False),
        ("UNIX_TIMESTAMP", 1700000000),
        ("BYTES_LIST", [b"a", b""]),
        ("STRING_LIST", []),
        ("INT32_LIST", [0, -1, 2**31 - 1]),
        ("INT64_LIST", [-(2**62), 0]),
        ("DOUBLE_LIST", [0.0, -1.25]),
        ("BOOL_LIST", [True, False, True]),
        ("UNIX_TIMESTAMP_LIST", [1, 2]),
    ],
)
def test_roundtrip(vt, val):
    name, out = decode_value(encode_value(val, vt))
    from feast_spark.functions.value_proto import _FIELD_OF_TYPE

    assert name == _FIELD_OF_TYPE[vt]
    assert out == val


def test_float_roundtrip_f32_precision():
    name, out = decode_value(encode_value(1.1, "FLOAT"))
    assert name == "float_val"
    assert abs(out - 1.1) < 1e-6  # stored as f32
    name, out = decode_value(encode_value([1.1], "FLOAT_LIST"))
    assert abs(out[0] - 1.1) < 1e-6


# ---------------------------------------------------------------------------
# entity-key encoding
# ---------------------------------------------------------------------------


def test_entity_key_golden_v1_matches_reference_layout():
    # reference layout: sorted keys, <I STRING tag + raw name per key,
    # then <I type tag + <I length + packed value per value
    # (key_encoding_utils.py:33-48); INT64 packs with "<l" (4 bytes)
    got = serialize_entity_key(
        ["driver_id"], [(5, "INT64")], version=1
    )
    expected = (
        struct.pack("<I", VALUE_TYPES["STRING"]) + b"driver_id"
        + struct.pack("<I", VALUE_TYPES["INT64"])
        + struct.pack("<I", 4)
        + struct.pack("<l", 5)
    )
    assert got == expected


def test_entity_key_sorts_join_keys():
    a = serialize_entity_key(
        ["b_key", "a_key"], [("x", "STRING"), ("y", "STRING")]
    )
    b = serialize_entity_key(
        ["a_key", "b_key"], [("y", "STRING"), ("x", "STRING")]
    )
    assert a == b  # order-insensitive, the reference's sort guarantee


def test_entity_key_v2_widens_int64():
    buf = serialize_entity_key(["k"], [(2**40, "INT64")], version=2)
    assert struct.pack("<q", 2**40) in buf
    # v1 overflows beyond int32 range exactly like the reference
    with pytest.raises(struct.error):
        serialize_entity_key(["k"], [(2**40, "INT64")], version=1)


def test_entity_key_roundtrip_composite():
    keys = ["cust", "region"]
    vals = [(123456789012, "INT64"), ("emea", "STRING")]
    buf = serialize_entity_key(keys, vals, version=2)
    assert deserialize_entity_key(buf, keys, ["INT64", "STRING"], 2) == [
        123456789012,
        "emea",
    ]


# ---------------------------------------------------------------------------
# Spark integration (Arrow-batched)
# ---------------------------------------------------------------------------


def test_value_type_of_mapping(spark):
    from pyspark.sql import types as T

    assert value_type_of(T.LongType()) == "INT64"
    assert value_type_of(T.ArrayType(T.DoubleType())) == "DOUBLE_LIST"
    assert value_type_of(T.TimestampType()) == "UNIX_TIMESTAMP"
    with pytest.raises(ValueError):
        value_type_of(T.MapType(T.StringType(), T.LongType()))


def test_to_online_format_roundtrip(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [
            (1, "a", 2.5, [1.0, 2.0], dt.datetime(2024, 1, 1)),
            (2, None, None, None, dt.datetime(2024, 1, 2)),
        ],
        "driver_id long, name string, score double, emb array<double>, event_ts timestamp",
    )
    long_df = to_online_format(
        df, ["driver_id"], ["name", "score", "emb"], ts_col="event_ts"
    )
    rows = long_df.collect()
    assert len(rows) == 6  # 2 entities x 3 features
    by_key = {}
    for r in rows:
        by_key[(bytes(r["entity_key"]), r["feature_name"])] = bytes(r["value"])
    ek1 = serialize_entity_key(["driver_id"], [(1, "INT64")])
    ek2 = serialize_entity_key(["driver_id"], [(2, "INT64")])
    assert decode_value(by_key[(ek1, "name")]) == ("string_val", "a")
    assert decode_value(by_key[(ek1, "score")]) == ("double_val", 2.5)
    assert decode_value(by_key[(ek1, "emb")]) == ("double_list_val", [1.0, 2.0])
    # nulls encode as empty Value — present row, empty bytes
    assert by_key[(ek2, "name")] == b""
    assert by_key[(ek2, "score")] == b""

    decoded = from_online_format(
        long_df,
        ["driver_id"],
        ["INT64"],
        {"name": "STRING", "score": "DOUBLE", "emb": "DOUBLE_LIST"},
    )
    got = {
        (r["driver_id"], r["feature_name"]): r for r in decoded.collect()
    }
    assert got[(1, "name")]["value_2"] == "a"  # string family column
    assert got[(1, "score")]["value_1"] == 2.5
    assert got[(1, "emb")]["value_0"] == [1.0, 2.0]
    assert got[(2, "name")]["value_2"] is None
