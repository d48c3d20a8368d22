"""Pure-Python Protobuf wire-format codec for Kafka payloads.

The reference's ProtoFormat (sdk/python/feast/data_format.py:116-133)
carries only a ``class_path`` to a compiled Java class and delegates
decoding to an external Spark job.  This environment has neither
protoc output nor the protobuf runtime, so the codec speaks the wire
format directly (varint / zigzag / fixed / length-delimited — the
encoding is fully specified and stable), driven by a JSON field
descriptor instead of generated classes:

    {"name": "DriverUpdate", "fields": [
        {"number": 1, "name": "driver_id", "type": "int64"},
        {"number": 2, "name": "value",     "type": "double"},
        {"number": 3, "name": "tags",      "type": "string", "repeated": true},
        {"number": 4, "name": "meta",      "type": "message",
         "message": {"fields": [...]}}]}

Decode runs as ``mapInPandas`` (Arrow batches, descriptor compiled once
per worker) — the same batch-and-streaming-capable contract as
``avro_codec.decode_avro``.  Spec conformance notes: unknown fields are
skipped by wire type; duplicate occurrences of a non-repeated field
keep the last value; repeated scalars decode from both packed and
unpacked encodings; absent fields surface as NULL (feature semantics —
proto3 zero-defaults are indistinguishable from absent on the wire for
scalars, and NULL is the honest answer for a feature store).

``encode_message`` exists for tests and stream simulation; production
producers write with their own protobuf toolchain — the bytes are
identical.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable

from pyspark.sql import types as T

# wire types
_VARINT, _FIX64, _LEN, _FIX32 = 0, 1, 2, 5

_WIRE_OF = {
    "int32": _VARINT, "int64": _VARINT, "uint32": _VARINT, "uint64": _VARINT,
    "sint32": _VARINT, "sint64": _VARINT, "bool": _VARINT, "enum": _VARINT,
    "fixed64": _FIX64, "sfixed64": _FIX64, "double": _FIX64,
    "fixed32": _FIX32, "sfixed32": _FIX32, "float": _FIX32,
    "string": _LEN, "bytes": _LEN, "message": _LEN,
}

_SPARK_OF = {
    "int32": T.IntegerType(), "sint32": T.IntegerType(),
    "sfixed32": T.IntegerType(), "enum": T.IntegerType(),
    "int64": T.LongType(), "sint64": T.LongType(), "sfixed64": T.LongType(),
    # unsigned 64-bit values above 2^63-1 would overflow LongType; the
    # wire value is preserved mod 2^64 the way the Java runtime does
    "uint32": T.LongType(), "uint64": T.LongType(), "fixed32": T.LongType(),
    "fixed64": T.LongType(),
    "bool": T.BooleanType(), "float": T.FloatType(), "double": T.DoubleType(),
    "string": T.StringType(), "bytes": T.BinaryType(),
}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # negative int32/int64 encode as 10-byte varint
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _to_signed(v: int, bits: int) -> int:
    if v >= 1 << (bits - 1):
        v -= 1 << bits
    return v


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _scalar_decoder(ftype: str) -> Callable[[int], Any]:
    """varint payload -> python value"""
    if ftype in ("int32", "enum", "int64"):
        # negative int32 values encode as 10-byte (64-bit) varints, so
        # sign-extension at 64 bits recovers both widths
        return lambda v: _to_signed(v, 64)
    if ftype in ("uint32", "uint64"):
        return lambda v: v
    if ftype == "sint32" or ftype == "sint64":
        return _zigzag_dec
    if ftype == "bool":
        return lambda v: bool(v)
    raise ValueError(ftype)


def compile_decoder(descriptor: dict) -> Callable[[bytes], dict]:
    """descriptor -> function(bytes) -> {name: value}; nested messages
    compile recursively, the avro_codec.compile_decoder pattern."""
    by_number: dict[int, dict] = {}
    for f in descriptor["fields"]:
        spec = dict(f)
        if spec["type"] == "message":
            spec["_sub"] = compile_decoder(spec["message"])
        elif _WIRE_OF[spec["type"]] == _VARINT:
            spec["_dec"] = _scalar_decoder(spec["type"])
        by_number[spec["number"]] = spec
    names = [f["name"] for f in descriptor["fields"]]

    def _decode_one(spec: dict, wire: int, buf: bytes, i: int) -> tuple[Any, int]:
        ftype = spec["type"]
        if wire == _VARINT:
            raw, i = _read_varint(buf, i)
            return spec["_dec"](raw), i
        if wire == _FIX64:
            chunk = buf[i : i + 8]
            i += 8
            if ftype == "double":
                return struct.unpack("<d", chunk)[0], i
            v = struct.unpack("<Q", chunk)[0]
            return (_to_signed(v, 64) if ftype == "sfixed64" else v), i
        if wire == _FIX32:
            chunk = buf[i : i + 4]
            i += 4
            if ftype == "float":
                return struct.unpack("<f", chunk)[0], i
            v = struct.unpack("<I", chunk)[0]
            return (_to_signed(v, 32) if ftype == "sfixed32" else v), i
        if wire == _LEN:
            n, i = _read_varint(buf, i)
            chunk = buf[i : i + n]
            i += n
            if ftype == "string":
                return chunk.decode("utf-8"), i
            if ftype == "bytes":
                return bytes(chunk), i
            if ftype == "message":
                return spec["_sub"](bytes(chunk)), i
            # packed repeated scalars: parse the chunk as a sequence
            vals = []
            j = 0
            expected = _WIRE_OF[ftype]
            while j < n:
                v, j = _decode_one(spec, expected, chunk, j)
                vals.append(v)
            return vals, i
        raise ValueError(f"wire type {wire}")

    def decode(buf: bytes) -> dict:
        out: dict[str, Any] = dict.fromkeys(names)
        i = 0
        while i < len(buf):
            key, i = _read_varint(buf, i)
            number, wire = key >> 3, key & 7
            spec = by_number.get(number)
            if spec is None:  # unknown field: skip per wire type
                if wire == _VARINT:
                    _, i = _read_varint(buf, i)
                elif wire == _FIX64:
                    i += 8
                elif wire == _FIX32:
                    i += 4
                elif wire == _LEN:
                    n, i = _read_varint(buf, i)
                    i += n
                else:
                    raise ValueError(f"wire type {wire}")
                continue
            v, i = _decode_one(spec, wire, buf, i)
            is_list = isinstance(v, list) and spec["type"] not in (
                "message",
                "bytes",
            )
            if spec.get("repeated"):
                prev = out[spec["name"]]
                out[spec["name"]] = (prev or []) + (v if is_list else [v])
            else:
                # last one wins per spec; a stray packed chunk keeps its
                # final element
                out[spec["name"]] = v[-1] if is_list else v
        return out

    return decode


# ---------------------------------------------------------------------------
# encode (tests / stream simulation)
# ---------------------------------------------------------------------------


def _encode_scalar(out: bytearray, ftype: str, v: Any) -> None:
    if ftype in ("int32", "int64", "uint32", "uint64", "enum"):
        _write_varint(out, int(v))
    elif ftype in ("sint32", "sint64"):
        _write_varint(out, _zigzag_enc(int(v)))
    elif ftype == "bool":
        _write_varint(out, 1 if v else 0)
    elif ftype == "double":
        out.extend(struct.pack("<d", float(v)))
    elif ftype in ("fixed64", "sfixed64"):
        out.extend(struct.pack("<Q", int(v) & (1 << 64) - 1))
    elif ftype == "float":
        out.extend(struct.pack("<f", float(v)))
    elif ftype in ("fixed32", "sfixed32"):
        out.extend(struct.pack("<I", int(v) & (1 << 32) - 1))
    else:
        raise ValueError(ftype)


def encode_message(descriptor: dict | str, value: dict) -> bytes:
    if isinstance(descriptor, str):
        descriptor = json.loads(descriptor)
    out = bytearray()
    for f in descriptor["fields"]:
        v = value.get(f["name"])
        if v is None or (f.get("repeated") and len(v) == 0):
            # absent and empty-repeated both produce no wire entry
            continue
        ftype = f["type"]
        wire = _WIRE_OF[ftype]
        key = (f["number"] << 3) | wire
        if f.get("repeated"):
            if wire in (_VARINT, _FIX64, _FIX32):  # packed
                payload = bytearray()
                for item in v:
                    _encode_scalar(payload, ftype, item)
                _write_varint(out, (f["number"] << 3) | _LEN)
                _write_varint(out, len(payload))
                out.extend(payload)
            else:
                for item in v:
                    _write_varint(out, key)
                    _emit_len(out, ftype, f, item)
        elif wire == _LEN:
            _write_varint(out, key)
            _emit_len(out, ftype, f, v)
        else:
            _write_varint(out, key)
            _encode_scalar(out, ftype, v)
    return bytes(out)


def _emit_len(out: bytearray, ftype: str, f: dict, v: Any) -> None:
    if ftype == "string":
        b = v.encode("utf-8")
    elif ftype == "bytes":
        b = bytes(v)
    elif ftype == "message":
        b = encode_message(f["message"], v)
    else:
        raise ValueError(ftype)
    _write_varint(out, len(b))
    out.extend(b)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def proto_to_spark_type(descriptor: dict) -> T.StructType:
    fields = []
    for f in descriptor["fields"]:
        if f["type"] == "message":
            dt: T.DataType = proto_to_spark_type(f["message"])
        else:
            dt = _SPARK_OF[f["type"]]
        if f.get("repeated"):
            dt = T.ArrayType(dt, True)
        fields.append(T.StructField(f["name"], dt, True))
    return T.StructType(fields)


def decode_proto(df, value_col: str, descriptor_json: str):
    """Decode a protobuf-binary column into the message's fields — the
    ProtoFormat twin of ``avro_codec.decode_avro``: ``mapInPandas``
    with the descriptor compiled once per worker, works on batch and
    streaming DataFrames, drops non-payload columns (the Kafka parse
    contract)."""
    import pandas as pd

    descriptor = json.loads(descriptor_json)
    spark_type = proto_to_spark_type(descriptor)
    names = [f["name"] for f in descriptor["fields"]]
    dec = compile_decoder(descriptor)

    def _decode(batches):
        for pdf in batches:
            rows = [
                dec(bytes(v)) if v is not None else dict.fromkeys(names)
                for v in pdf[value_col]
            ]
            yield pd.DataFrame(rows, columns=names, dtype=object)

    return df.mapInPandas(_decode, schema=spark_type)
