"""Feature: a named, typed column (reference: sdk/python/feast/feature.py:25-42)."""

from __future__ import annotations

from dataclasses import dataclass, field

from feast_spark.types import ValueType


@dataclass
class Feature:
    name: str
    dtype: ValueType = ValueType.UNKNOWN
    labels: dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {"name": self.name, "dtype": self.dtype.name, "labels": self.labels}

    @classmethod
    def from_dict(cls, d: dict) -> "Feature":
        return cls(
            name=d["name"],
            dtype=ValueType[d.get("dtype", "UNKNOWN")],
            labels=d.get("labels", {}),
        )
