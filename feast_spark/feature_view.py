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


@dataclass
class OnDemandFeatureView:
    """Derived features computed at retrieval time from already-joined
    feature values — the capability later Feast versions call an
    on-demand feature view (absent at the surveyed v0.11; the v0.11
    extensibility story stops at custom providers, SURVEY §2 "UDF —
    not present").

    ``sources``: 'view:feature' refs the transform reads; they are
    fetched (PIT-joined) automatically and dropped from the output
    unless also requested explicitly.

    ``transform`` modes:
      * ``spark``  — fn(DataFrame) -> DataFrame appending output
        columns with built-in column expressions (whole-stage codegen;
        the fast path).
      * ``pandas`` — fn(pandas.DataFrame) -> pandas.DataFrame of ONLY
        the new output columns; applied via Arrow-batched mapInPandas
        (vectorized, no per-row Python).  Declared output dtypes are
        the contract (ValueType -> Spark type).

    Transforms are code, so—like the reference's repo.py objects—they
    live in the repo file and are re-bound at parse/apply time; the
    JSON registry persists metadata only.
    """

    name: str
    sources: list[str]
    features: list[Feature]
    transform: object = None  # Callable; None when loaded metadata-only
    mode: str = "spark"

    @property
    def feature_names(self) -> list[str]:
        return [f.name for f in self.features]

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "sources": list(self.sources),
            "features": [f.to_dict() for f in self.features],
            "mode": self.mode,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "OnDemandFeatureView":
        return cls(
            name=d["name"],
            sources=list(d.get("sources", [])),
            features=[Feature.from_dict(f) for f in d.get("features", [])],
            transform=None,
            mode=d.get("mode", "spark"),
        )

    def apply_transform(self, df):
        from pyspark.sql import functions as F  # noqa: F401
        from feast_spark.types import value_type_to_spark

        if self.transform is None:
            raise ValueError(
                f"on-demand view {self.name!r} has no transform bound "
                "(metadata-only registry load; re-apply from the repo file)"
            )
        if self.mode == "spark":
            return self.transform(df)
        if self.mode != "pandas":
            raise ValueError(f"unknown on-demand mode {self.mode!r}")

        import pandas as pd  # noqa: F401
        from pyspark.sql.types import StructType

        # copy the field list — StructType.add mutates it in place, and
        # df.schema.fields is the live cached schema of the input frame
        out_schema = StructType(list(df.schema.fields))
        for f in self.features:
            out_schema = out_schema.add(f.name, value_type_to_spark(f.dtype))
        fn = self.transform
        out_names = self.feature_names

        def mapper(batches):
            for pdf in batches:
                new = fn(pdf)
                missing = [c for c in out_names if c not in new.columns]
                if missing:
                    raise ValueError(
                        f"pandas transform must return columns {out_names}, "
                        f"missing {missing}"
                    )
                yield pd.concat(
                    [pdf.reset_index(drop=True),
                     new[out_names].reset_index(drop=True)],
                    axis=1,
                )

        return df.mapInPandas(mapper, out_schema)
