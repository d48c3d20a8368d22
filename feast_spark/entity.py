"""Entity: a named join key with a declared value type.

Mirrors sdk/python/feast/entity.py:30-59 in the reference. Metadata-only;
at execution time an entity is just a key column in a DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from feast_spark.types import ENTITY_KEY_TYPES, ValueType


@dataclass
class Entity:
    name: str
    value_type: ValueType = ValueType.UNKNOWN
    join_key: str = ""
    description: str = ""
    labels: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.join_key:
            self.join_key = self.name
        if (
            self.value_type is not ValueType.UNKNOWN
            and self.value_type not in ENTITY_KEY_TYPES
        ):
            raise ValueError(
                f"entity {self.name!r}: value_type {self.value_type} not allowed "
                f"for entity keys (allowed: {[t.name for t in ENTITY_KEY_TYPES]})"
            )

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "value_type": self.value_type.name,
            "join_key": self.join_key,
            "description": self.description,
            "labels": self.labels,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Entity":
        return cls(
            name=d["name"],
            value_type=ValueType[d.get("value_type", "UNKNOWN")],
            join_key=d.get("join_key", ""),
            description=d.get("description", ""),
            labels=d.get("labels", {}),
        )
