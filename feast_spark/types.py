"""Value type system: 8 scalars + 8 homogeneous lists, mapped to Spark types.

Mirrors the reference's ValueType enum (sdk/python/feast/value_type.py:19-40)
and its conversion tables (sdk/python/feast/type_map.py:73-156,341-361).
No map/struct/decimal/date/interval types; nested lists are rejected
("Array types can only be one level deep", type_map.py:149-154).
"""

from __future__ import annotations

import enum

from pyspark.sql import types as T


class ValueType(enum.Enum):
    UNKNOWN = 0
    BYTES = 1
    STRING = 2
    INT32 = 3
    INT64 = 4
    DOUBLE = 5
    FLOAT = 6
    BOOL = 7
    UNIX_TIMESTAMP = 8
    BYTES_LIST = 11
    STRING_LIST = 12
    INT32_LIST = 13
    INT64_LIST = 14
    DOUBLE_LIST = 15
    FLOAT_LIST = 16
    BOOL_LIST = 17
    UNIX_TIMESTAMP_LIST = 18

    @property
    def is_list(self) -> bool:
        return self.value >= 11

    @property
    def element_type(self) -> "ValueType":
        if not self.is_list:
            return self
        return ValueType(self.value - 10)


_SCALAR_TO_SPARK: dict[ValueType, T.DataType] = {
    ValueType.BYTES: T.BinaryType(),
    ValueType.STRING: T.StringType(),
    ValueType.INT32: T.IntegerType(),
    ValueType.INT64: T.LongType(),
    ValueType.DOUBLE: T.DoubleType(),
    ValueType.FLOAT: T.FloatType(),
    ValueType.BOOL: T.BooleanType(),
    # Timestamp *feature values* are int64 epoch seconds (type_map.py:341-343);
    # event/created timestamp *columns* are TimestampType at the column level.
    ValueType.UNIX_TIMESTAMP: T.LongType(),
}

# Inverse mapping for inference from a Spark schema
# (reference: inference.py:12-59 infers entity value types from source columns).
_SPARK_TO_SCALAR: dict[str, ValueType] = {
    "binary": ValueType.BYTES,
    "string": ValueType.STRING,
    "byte": ValueType.INT32,
    "short": ValueType.INT32,
    "integer": ValueType.INT32,
    "long": ValueType.INT64,
    "double": ValueType.DOUBLE,
    "float": ValueType.FLOAT,
    "boolean": ValueType.BOOL,
    "timestamp": ValueType.UNIX_TIMESTAMP,
    "timestamp_ntz": ValueType.UNIX_TIMESTAMP,
    "date": ValueType.UNIX_TIMESTAMP,
}


def value_type_to_spark(vt: ValueType) -> T.DataType:
    """ValueType -> Spark DataType (SURVEY §1.2 mapping table)."""
    if vt is ValueType.UNKNOWN:
        raise ValueError("cannot map ValueType.UNKNOWN to a Spark type")
    if vt.is_list:
        return T.ArrayType(_SCALAR_TO_SPARK[vt.element_type])
    return _SCALAR_TO_SPARK[vt]


def spark_type_to_value_type(dt: T.DataType) -> ValueType:
    """Spark DataType -> ValueType, rejecting nested arrays like the
    reference (type_map.py:149-154)."""
    if isinstance(dt, T.ArrayType):
        if isinstance(dt.elementType, (T.ArrayType, T.MapType, T.StructType)):
            raise ValueError("Array types can only be one level deep")
        elem = spark_type_to_value_type(dt.elementType)
        return ValueType(elem.value + 10)
    if isinstance(dt, (T.MapType, T.StructType)):
        raise ValueError(f"unsupported Spark type for feature values: {dt}")
    name = dt.typeName()
    if name not in _SPARK_TO_SCALAR:
        raise ValueError(f"unsupported Spark type for feature values: {dt}")
    return _SPARK_TO_SCALAR[name]


#: Entity-key columns may only be these types (key_encoding_utils.py:9-19).
ENTITY_KEY_TYPES = (
    ValueType.STRING,
    ValueType.BYTES,
    ValueType.INT32,
    ValueType.INT64,
)
