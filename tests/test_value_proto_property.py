"""Property-based roundtrips for the Value wire codec and entity-key
encoding (pure Python — no Spark session needed)."""

import math

from hypothesis import given, settings, strategies as st

from feast_spark.functions.value_proto import (
    _FIELD_OF_TYPE,
    decode_value,
    deserialize_entity_key,
    encode_value,
    serialize_entity_key,
)

_i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
_i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_f64 = st.floats(allow_nan=False, allow_infinity=True, width=64)
_txt = st.text(max_size=60)
_bin = st.binary(max_size=60)

_CASES = {
    "BYTES": _bin,
    "STRING": _txt,
    "INT32": _i32,
    "INT64": _i64,
    "DOUBLE": _f64,
    "BOOL": st.booleans(),
    "UNIX_TIMESTAMP": _i64,
    "BYTES_LIST": st.lists(_bin, max_size=8),
    "STRING_LIST": st.lists(_txt, max_size=8),
    "INT32_LIST": st.lists(_i32, max_size=8),
    "INT64_LIST": st.lists(_i64, max_size=8),
    "DOUBLE_LIST": st.lists(_f64, max_size=8),
    "BOOL_LIST": st.lists(st.booleans(), max_size=8),
    "UNIX_TIMESTAMP_LIST": st.lists(_i64, max_size=8),
}


@given(
    data=st.data(),
    vt=st.sampled_from(sorted(_CASES)),
)
@settings(max_examples=300, deadline=None)
def test_value_roundtrip_property(data, vt):
    val = data.draw(_CASES[vt])
    name, out = decode_value(encode_value(val, vt))
    assert name == _FIELD_OF_TYPE[vt]
    assert out == val


@given(val=st.floats(allow_nan=True, allow_infinity=True, width=32))
@settings(max_examples=100, deadline=None)
def test_float32_roundtrip_property(val):
    name, out = decode_value(encode_value(float(val), "FLOAT"))
    assert name == "float_val"
    if math.isnan(val):
        assert math.isnan(out)
    else:
        assert out == float(val)


_key_name = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=1,
    max_size=12,
)


@given(
    keys=st.lists(_key_name, min_size=1, max_size=4, unique=True),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_entity_key_roundtrip_property(keys, data):
    type_of = {
        "STRING": _txt,
        "BYTES": _bin,
        "INT32": _i32,
        "INT64": _i64,
    }
    vts = [data.draw(st.sampled_from(sorted(type_of))) for _ in keys]
    vals = [data.draw(type_of[vt]) for vt in vts]
    buf = serialize_entity_key(keys, list(zip(vals, vts)), version=2)
    assert deserialize_entity_key(buf, keys, vts, version=2) == vals
    # stability: permuting the key order yields identical bytes
    perm = sorted(range(len(keys)), key=lambda i: keys[i], reverse=True)
    buf2 = serialize_entity_key(
        [keys[i] for i in perm],
        [(vals[i], vts[i]) for i in perm],
        version=2,
    )
    assert buf == buf2
