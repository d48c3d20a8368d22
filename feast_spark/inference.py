"""M3 — schema/type inference against Spark schemas.

Mirrors the reference's inference pass (sdk/python/feast/inference.py:12-119
and feature_view.py:268-300): entity value types, event-timestamp columns,
and feature lists are inferred from the physical source schema when not
declared.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from feast_spark.entity import Entity
from feast_spark.errors import TimestampColumnInferenceError
from feast_spark.feature import Feature
from feast_spark.feature_view import FeatureView
from feast_spark.types import spark_type_to_value_type

#: columns named __x or x__ are internal and never become features
#: (feature_view.py:294: ^__|__$)
_INTERNAL_RE = re.compile(r"^__|__$")

_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def infer_event_timestamp_column(df: DataFrame, declared: str = "") -> str:
    """One timestamp column => pick it; several => error (inference.py:62-119).
    Also applied to the entity_df at query time (file.py:68-80)."""
    if declared:
        return declared
    candidates = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _TS_TYPES)
    ]
    # Prefer the conventional name if present (provider.py:21)
    if "event_timestamp" in candidates:
        return "event_timestamp"
    if len(candidates) != 1:
        raise TimestampColumnInferenceError(candidates)
    return candidates[0]


def update_entities_with_inferred_types(
    entities: list[Entity], source_df: DataFrame
) -> None:
    """Fill in UNKNOWN entity value types from the source schema
    (inference.py:12-59)."""
    from feast_spark.types import ValueType

    for entity in entities:
        if entity.value_type is not ValueType.UNKNOWN:
            continue
        for f in source_df.schema.fields:
            if f.name == entity.join_key:
                entity.value_type = spark_type_to_value_type(f.dataType)
                break


def update_view_with_inferred_features(
    view: FeatureView, source_df: DataFrame, join_keys: list[str]
) -> None:
    """Everything except keys / ts cols / internal columns becomes a
    feature (feature_view.py:268-300)."""
    if view.features:
        return
    src = view.batch_source
    exclude = set(join_keys)
    if src is not None:
        exclude |= {src.event_timestamp_column, src.created_timestamp_column}
    feats = []
    for f in source_df.schema.fields:
        if f.name in exclude or _INTERNAL_RE.search(f.name):
            continue
        feats.append(Feature(name=f.name, dtype=spark_type_to_value_type(f.dataType)))
    if not feats:
        raise ValueError(f"could not infer any features for view {view.name!r}")
    view.features = feats
