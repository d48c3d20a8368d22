"""Feast ``Value`` proto wire codec + binary entity-key encoding (F5).

The reference serves online features over gRPC as ``feast.types.Value``
proto messages (protos/feast/types/Value.proto) and keys its online
stores by a hand-rolled *stable* binary encoding of the entity key
(sdk/python/feast/infra/key_encoding_utils.py:22-48 — protobuf
serialization itself is not canonical, so the reference packs the
sorted key/value pairs with ``struct``).  Python-side conversion between
native values and ``Value`` protos lives in
sdk/python/feast/type_map.py:163-297.

This module reproduces both wire formats without the protobuf runtime
(absent in this environment) by driving the descriptor-based codec in
:mod:`feast_spark.functions.proto_codec` with the public ``Value.proto``
field layout.  Bytes produced here are parseable by any stock protobuf
runtime and vice versa — the oneof field numbers, varint/fixed
encodings, and packed-repeated list encodings follow the public
protobuf wire spec, and the golden-byte tests in
``tests/test_value_proto.py`` pin exact octets.

Spark integration is Arrow-batched (``mapInPandas``) — no row-at-a-time
Python UDFs:

- :func:`to_online_format` explodes a wide feature frame into the
  reference's online-store row shape
  ``(entity_key: binary, feature_name: string, value: binary,
  event_ts, created_ts)`` (docs/specs/online_store_format.md).
- :func:`from_online_format` decodes it back to typed columns.

At 100 TB these run embarrassingly parallel: both are per-row maps with
no shuffle; the heavy lifting (grouping, dedup) happens before/after in
native Spark operators.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F, types as T

from feast_spark.functions.proto_codec import (
    _read_varint,
    compile_decoder,
    encode_message,
)

# ValueType enum — protos/feast/types/Value.proto:26-45 (public spec)
VALUE_TYPES = {
    "INVALID": 0,
    "BYTES": 1,
    "STRING": 2,
    "INT32": 3,
    "INT64": 4,
    "DOUBLE": 5,
    "FLOAT": 6,
    "BOOL": 7,
    "UNIX_TIMESTAMP": 8,
    "BYTES_LIST": 11,
    "STRING_LIST": 12,
    "INT32_LIST": 13,
    "INT64_LIST": 14,
    "DOUBLE_LIST": 15,
    "FLOAT_LIST": 16,
    "BOOL_LIST": 17,
    "UNIX_TIMESTAMP_LIST": 18,
}

# oneof val — protos/feast/types/Value.proto:48-68.  Field numbers are
# load-bearing (wire compat); list fields wrap a nested message whose
# repeated field 1 carries the payload (packed for numerics, per the
# protobuf spec's proto3 default — what the reference's runtime emits).
_SCALAR_FIELDS = [
    (1, "bytes_val", "bytes"),
    (2, "string_val", "string"),
    (3, "int32_val", "int32"),
    (4, "int64_val", "int64"),
    (5, "double_val", "double"),
    (6, "float_val", "float"),
    (7, "bool_val", "bool"),
    (8, "unix_timestamp_val", "int64"),
]
_LIST_FIELDS = [
    (11, "bytes_list_val", "bytes"),
    (12, "string_list_val", "string"),
    (13, "int32_list_val", "int32"),
    (14, "int64_list_val", "int64"),
    (15, "double_list_val", "double"),
    (16, "float_list_val", "float"),
    (17, "bool_list_val", "bool"),
    (18, "unix_timestamp_list_val", "int64"),
]

VALUE_DESCRIPTOR = {
    "name": "Value",
    "fields": [
        *(
            {"number": n, "name": name, "type": t}
            for n, name, t in _SCALAR_FIELDS
        ),
        *(
            {
                "number": n,
                "name": name,
                "type": "message",
                "message": {
                    "name": name,
                    "fields": [
                        {"number": 1, "name": "val", "type": t, "repeated": True}
                    ],
                },
            }
            for n, name, t in _LIST_FIELDS
        ),
    ],
}

_decode_value_msg = compile_decoder(VALUE_DESCRIPTOR)

# ValueType enum name -> oneof field name (type_map.py:271-297 mapping,
# incl. UNIX_TIMESTAMP sharing int64 storage)
_FIELD_OF_TYPE = {
    "BYTES": "bytes_val",
    "STRING": "string_val",
    "INT32": "int32_val",
    "INT64": "int64_val",
    "DOUBLE": "double_val",
    "FLOAT": "float_val",
    "BOOL": "bool_val",
    "UNIX_TIMESTAMP": "unix_timestamp_val",
    "BYTES_LIST": "bytes_list_val",
    "STRING_LIST": "string_list_val",
    "INT32_LIST": "int32_list_val",
    "INT64_LIST": "int64_list_val",
    "DOUBLE_LIST": "double_list_val",
    "FLOAT_LIST": "float_list_val",
    "BOOL_LIST": "bool_list_val",
    "UNIX_TIMESTAMP_LIST": "unix_timestamp_list_val",
}


def encode_value(value: Any, value_type: str) -> bytes:
    """Python value -> ``Value`` proto wire bytes.

    ``None`` encodes as the empty message (``b""``) — the reference's
    null convention (type_map.py:276-277: ``pd.isnull(value) ->
    ProtoValue()``).  List types encode their wrapper message; an empty
    list is a *present* wrapper with no elements, which on the wire is a
    zero-length LEN field (distinct from null).
    """
    if value is None:
        return b""
    field = _FIELD_OF_TYPE[value_type]
    if value_type.endswith("_LIST"):
        return encode_message(
            VALUE_DESCRIPTOR, {field: {"val": list(value)}}
        )
    return encode_message(VALUE_DESCRIPTOR, {field: value})


def decode_value(buf: bytes) -> tuple[str | None, Any]:
    """``Value`` wire bytes -> ``(oneof field name, python value)``.

    Empty bytes (null feature) -> ``(None, None)``.  List wrappers
    unwrap to plain Python lists; a present-but-empty wrapper yields
    ``[]``.
    """
    if not buf:
        return None, None
    msg = _decode_value_msg(bytes(buf))
    for _, name, _t in _SCALAR_FIELDS:
        if msg[name] is not None:
            return name, msg[name]
    for _, name, _t in _LIST_FIELDS:
        if msg[name] is not None:
            return name, msg[name]["val"] or []
    return None, None


# ---------------------------------------------------------------------------
# entity-key binary encoding
# ---------------------------------------------------------------------------

# struct formats per version.  v1 is bytes-for-byte the reference
# (key_encoding_utils.py:11-19): note ``<l`` / ``<i`` are BOTH 4-byte —
# an INT64 entity key above 2^31-1 cannot serialize in v1 (the
# reference raises struct.error the same way).  v2 widens INT64 to 8
# bytes (the fix later Feast versions shipped as
# entity_key_serialization_version=2) and is the default here: at
# 100 TB, >2^31 entity ids are the norm, not the edge.
_INT_FMT = {1: {"INT32": "<i", "INT64": "<l"}, 2: {"INT32": "<i", "INT64": "<q"}}


def _serialize_key_val(value: Any, value_type: str, version: int) -> tuple[bytes, int]:
    if value_type == "STRING":
        return str(value).encode("utf8"), VALUE_TYPES["STRING"]
    if value_type == "BYTES":
        return bytes(value), VALUE_TYPES["BYTES"]
    if value_type in ("INT32", "INT64"):
        return (
            struct.pack(_INT_FMT[version][value_type], int(value)),
            VALUE_TYPES[value_type],
        )
    raise ValueError(
        f"entity key value type {value_type} not supported "
        "(reference supports STRING/BYTES/INT32/INT64, "
        "key_encoding_utils.py:10-19)"
    )


def serialize_entity_key(
    join_keys: list[str],
    values: list[tuple[Any, str]],
    version: int = 2,
) -> bytes:
    """Stable binary entity key: reference key_encoding_utils.py:22-48.

    Layout (little-endian): for each join key sorted by name, a
    ``<I`` STRING type tag followed by the raw utf-8 key name (no
    length prefix — the reference's exact layout); then for each value
    in the same sorted order, a ``<I`` type tag, ``<I`` byte length,
    and the packed value.  ``version=1`` is bit-compatible with the
    reference (INT64 packs to 4 bytes and overflows beyond int32
    range); ``version=2`` packs INT64 as 8 bytes.
    """
    if len(join_keys) != len(values):
        raise ValueError("join_keys and values must align")
    pairs = sorted(zip(join_keys, values), key=lambda kv: kv[0])
    out: list[bytes] = []
    for k, _ in pairs:
        out.append(struct.pack("<I", VALUE_TYPES["STRING"]))
        out.append(k.encode("utf8"))
    for _, (v, vt) in pairs:
        val_bytes, tag = _serialize_key_val(v, vt, version)
        out.append(struct.pack("<I", tag))
        out.append(struct.pack("<I", len(val_bytes)))
        out.append(val_bytes)
    return b"".join(out)


def deserialize_entity_key(
    buf: bytes, join_keys: list[str], value_types: list[str], version: int = 2
) -> list[Any]:
    """Inverse of :func:`serialize_entity_key` given the key schema.

    The v1/v2 layout is not self-describing for key-name boundaries
    (names carry no length prefix), so the caller supplies the schema —
    the same contract the reference's stores rely on (they only ever
    compare keys for equality and never parse them back).
    """
    pairs = sorted(zip(join_keys, value_types), key=lambda kv: kv[0])
    i = 0
    for k, _ in pairs:
        tag = struct.unpack_from("<I", buf, i)[0]
        if tag != VALUE_TYPES["STRING"]:
            raise ValueError("malformed entity key: expected STRING name tag")
        i += 4 + len(k.encode("utf8"))
    decoded: dict[str, Any] = {}
    for k, vt in pairs:
        tag, n = struct.unpack_from("<II", buf, i)
        i += 8
        raw = buf[i : i + n]
        i += n
        if vt == "STRING":
            decoded[k] = raw.decode("utf8")
        elif vt == "BYTES":
            decoded[k] = bytes(raw)
        else:
            decoded[k] = struct.unpack(_INT_FMT[version][vt], raw)[0]
    return [decoded[k] for k in join_keys]


# ---------------------------------------------------------------------------
# Spark type mapping
# ---------------------------------------------------------------------------

_SPARK_TO_VALUE_TYPE: list[tuple[type, str]] = [
    (T.BinaryType, "BYTES"),
    (T.StringType, "STRING"),
    (T.IntegerType, "INT32"),
    (T.ShortType, "INT32"),
    (T.ByteType, "INT32"),
    (T.LongType, "INT64"),
    (T.DoubleType, "DOUBLE"),
    (T.FloatType, "FLOAT"),
    (T.BooleanType, "BOOL"),
    (T.TimestampType, "UNIX_TIMESTAMP"),
]


def value_type_of(dt: T.DataType) -> str:
    """Spark DataType -> ValueType enum name (inference.py:12-119 analog)."""
    if isinstance(dt, T.ArrayType):
        return value_type_of(dt.elementType) + "_LIST"
    for cls, name in _SPARK_TO_VALUE_TYPE:
        if isinstance(dt, cls):
            return name
    raise ValueError(f"no ValueType mapping for Spark type {dt.simpleString()}")


_ONLINE_SCHEMA = T.StructType(
    [
        T.StructField("entity_key", T.BinaryType()),
        T.StructField("feature_name", T.StringType()),
        T.StructField("value", T.BinaryType()),
    ]
)


def to_online_format(
    df: DataFrame,
    join_keys: list[str],
    feature_cols: list[str],
    ts_col: str = "event_ts",
    created_col: str | None = None,
    key_version: int = 2,
) -> DataFrame:
    """Wide feature rows -> reference online-store row shape.

    Output: ``(entity_key binary, feature_name string, value binary,
    event_ts[, created_ts])`` — one row per (entity, feature), the
    layout of docs/specs/online_store_format.md and the conversion the
    reference does in provider.py:263-312 before ``online_write_batch``.

    Arrow-batched ``mapInPandas``; per-row map, no shuffle.  Timestamp
    features encode as epoch seconds (UNIX_TIMESTAMP semantics,
    type_map.py:282-283).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    key_types = [value_type_of(fields[k]) for k in join_keys]
    feat_types = {c: value_type_of(fields[c]) for c in feature_cols}

    ts_fields = [T.StructField(ts_col, T.TimestampType())]
    if created_col:
        ts_fields.append(T.StructField(created_col, T.TimestampType()))
    out_schema = T.StructType(list(_ONLINE_SCHEMA.fields) + ts_fields)

    ts_cols = [ts_col] + ([created_col] if created_col else [])
    cols = join_keys + feature_cols + ts_cols

    def _explode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in out_schema.fieldNames()}
            for row in pdf.itertuples(index=False):
                r = dict(zip(pdf.columns, row))
                ek = serialize_entity_key(
                    join_keys,
                    [(r[k], kt) for k, kt in zip(join_keys, key_types)],
                    version=key_version,
                )
                for c in feature_cols:
                    v = r[c]
                    vt = feat_types[c]
                    if vt.endswith("_LIST"):
                        # Arrow yields list values as numpy arrays; null
                        # lists arrive as None or float NaN
                        if v is None or (
                            not hasattr(v, "__len__") and pd.isnull(v)
                        ):
                            v = None
                        else:
                            v = list(v)
                    elif v is None or (
                        not isinstance(v, bytes) and pd.isnull(v)
                    ):
                        v = None
                    elif vt == "UNIX_TIMESTAMP":
                        v = int(pd.Timestamp(v).value // 1_000_000_000)
                    out["entity_key"].append(ek)
                    out["feature_name"].append(c)
                    out["value"].append(encode_value(v, vt))
                    for tc in ts_cols:
                        out[tc].append(r[tc])
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(_explode, schema=out_schema)


def from_online_format(
    df: DataFrame,
    join_keys: list[str],
    key_types: list[str],
    feature_types: dict[str, str],
    key_version: int = 2,
) -> DataFrame:
    """Online-store rows back to typed wide columns (one row per
    (entity, feature) in, same out but with decoded ``value`` columns
    pivoted wide by the caller if desired).

    Returns ``join_keys... , feature_name, value_decoded`` where
    ``value_decoded`` is a string rendering plus typed columns per
    feature would require a pivot; this decoder keeps the long shape
    and materializes the native value into a column of the feature's
    declared type family per row group.  For serving, the point reads
    go through feast_spark.online.store; this function exists for
    audit/backfill jobs that need to read a reference-written store.
    """
    spark_t = {
        "BYTES": T.BinaryType(), "STRING": T.StringType(),
        "INT32": T.IntegerType(), "INT64": T.LongType(),
        "DOUBLE": T.DoubleType(), "FLOAT": T.FloatType(),
        "BOOL": T.BooleanType(), "UNIX_TIMESTAMP": T.LongType(),
    }

    def _typed(vt: str) -> T.DataType:
        if vt.endswith("_LIST"):
            return T.ArrayType(spark_t[vt[: -len("_LIST")]])
        return spark_t[vt]

    # one typed output column per distinct feature type family keeps the
    # schema closed; rows carry NULL in the columns of other families
    out_fields = [
        T.StructField(k, _typed(kt)) for k, kt in zip(join_keys, key_types)
    ]
    out_fields.append(T.StructField("feature_name", T.StringType()))
    families = sorted({_typed(vt).simpleString() for vt in feature_types.values()})
    fam_col = {fam: f"value_{i}" for i, fam in enumerate(families)}
    for fam in families:
        out_fields.append(T.StructField(fam_col[fam], _parse_type(fam)))
    out_schema = T.StructType(out_fields)

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for row in pdf.itertuples(index=False):
                r = dict(zip(pdf.columns, row))
                keys = deserialize_entity_key(
                    bytes(r["entity_key"]), join_keys, key_types, key_version
                )
                fname = r["feature_name"]
                vt = feature_types.get(fname)
                rec = dict(zip(join_keys, keys))
                rec["feature_name"] = fname
                # pre-fill every family column: pandas would otherwise
                # surface missing cells as NaN, which Arrow rejects for
                # array-typed columns
                for col in fam_col.values():
                    rec[col] = None
                if vt is not None:
                    _, v = decode_value(bytes(r["value"] or b""))
                    rec[fam_col[_typed(vt).simpleString()]] = v
                rows.append(rec)
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    return df.mapInPandas(_decode, schema=out_schema)


def _parse_type(simple: str) -> T.DataType:
    return T._parse_datatype_string(simple)
