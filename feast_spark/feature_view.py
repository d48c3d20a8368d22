"""FeatureView / FeatureService — the central "table" abstractions.

Mirrors sdk/python/feast/feature_view.py:42-102 and
feature_service.py:16-35 / feature_view_projection.py in the reference.
A FeatureView binds (source, entity join keys, feature columns, ttl);
FeatureService is a saved list of (view, columns) selections.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

from feast_spark.data_source import DataSource, KafkaSource
from feast_spark.feature import Feature


@dataclass
class FeatureView:
    name: str
    entities: list[str]
    features: list[Feature] = field(default_factory=list)
    ttl: timedelta | None = None
    online: bool = True
    batch_source: DataSource | None = None
    stream_source: KafkaSource | None = None
    tags: dict[str, str] = field(default_factory=dict)
    # M2 — materialization-interval bookkeeping (feature_view.py:262-266)
    materialization_intervals: list[tuple[datetime, datetime]] = field(
        default_factory=list
    )

    @property
    def feature_names(self) -> list[str]:
        return [f.name for f in self.features]

    @property
    def most_recent_end_time(self) -> datetime | None:
        """Resume point for materialize_incremental (feature_view.py:262-266)."""
        if not self.materialization_intervals:
            return None
        return max(end for _, end in self.materialization_intervals)

    def with_projection(self, features: list[str]) -> "FeatureViewProjection":
        missing = set(features) - set(self.feature_names)
        if missing:
            raise ValueError(f"view {self.name!r} has no features {sorted(missing)}")
        return FeatureViewProjection(view=self, feature_names=list(features))

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "entities": self.entities,
            "features": [f.to_dict() for f in self.features],
            "ttl_seconds": self.ttl.total_seconds() if self.ttl else None,
            "online": self.online,
            "batch_source": self.batch_source.to_dict() if self.batch_source else None,
            "stream_source": self.stream_source.to_dict() if self.stream_source else None,
            "tags": self.tags,
            "materialization_intervals": [
                [s.isoformat(), e.isoformat()]
                for s, e in self.materialization_intervals
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "FeatureView":
        ttl_s = d.get("ttl_seconds")
        stream = d.get("stream_source")
        return cls(
            name=d["name"],
            entities=list(d["entities"]),
            features=[Feature.from_dict(f) for f in d.get("features", [])],
            ttl=timedelta(seconds=ttl_s) if ttl_s else None,
            online=d.get("online", True),
            batch_source=(
                DataSource.from_dict(d["batch_source"]) if d.get("batch_source") else None
            ),
            stream_source=(
                DataSource.from_dict(stream) if stream else None  # type: ignore[arg-type]
            ),
            tags=d.get("tags", {}),
            materialization_intervals=[
                (datetime.fromisoformat(s), datetime.fromisoformat(e))
                for s, e in d.get("materialization_intervals", [])
            ],
        )


def FeatureTable(
    name: str,
    entities: list[str],
    features: list[Feature] | None = None,
    max_age: timedelta | None = None,
    batch_source: DataSource | None = None,
    stream_source: KafkaSource | None = None,
    labels: dict[str, str] | None = None,
) -> FeatureView:
    """Legacy v0.9 alias (reference feature_table.py:36-65): identical to
    FeatureView with ``max_age`` instead of ``ttl`` — SURVEY §1.1 folds
    the two into one class."""
    return FeatureView(
        name=name,
        entities=entities,
        features=features or [],
        ttl=max_age,
        batch_source=batch_source,
        stream_source=stream_source,
        tags=labels or {},
    )


@dataclass
class FeatureViewProjection:
    """Subset of a view's features (feature_view_projection.py)."""

    view: FeatureView
    feature_names: list[str]


@dataclass
class FeatureService:
    """Named grouping of projections for retrieval (feature_service.py:16-35)."""

    name: str
    features: list[FeatureViewProjection] = field(default_factory=list)
    tags: dict[str, str] = field(default_factory=dict)

    @property
    def feature_refs(self) -> list[str]:
        return [
            f"{p.view.name}:{fname}" for p in self.features for fname in p.feature_names
        ]

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "projections": [
                {"view": p.view.name, "features": p.feature_names}
                for p in self.features
            ],
            "tags": self.tags,
        }
