"""File-backed registry of declared objects.

The reference persists a protobuf registry file on local/GCS/S3 with a
cache TTL (sdk/python/feast/registry.py:39-77,444-611: one
RegistryStore subclass per SDK — Local/GCS/S3).  Here: one JSON file,
atomic replace on commit, entities + feature views + services +
materialization intervals (M1/M2).  Remote storage goes through ONE
implementation — ``StoreFS``/``HadoopFS`` over the cluster's Hadoop
connectors — so ``s3a://``, ``gs://``, ``hdfs://``, ``abfss://`` all
work with zero extra Python SDKs (the scheme dispatch lives in
``FeatureStore``).  ``refresh()`` re-reads the backing object so
long-lived sessions see other writers' commits, the reference's
cache-TTL refresh path (registry.py:110-126).
"""

from __future__ import annotations

import json
from datetime import datetime

from feast_spark.entity import Entity
from feast_spark.errors import EntityNotFoundError, FeatureViewNotFoundError
from feast_spark.feature_view import (
    FeatureService,
    FeatureView,
    OnDemandFeatureView,
)
from feast_spark.io.fs import LocalFS, StoreFS


class Registry:
    def __init__(self, path: str, fs: StoreFS | None = None):
        self.path = path
        self.fs = fs or LocalFS()
        self.entities: dict[str, Entity] = {}
        self.feature_views: dict[str, FeatureView] = {}
        self.feature_services: dict[str, FeatureService] = {}
        self.on_demand_views: dict[str, OnDemandFeatureView] = {}
        if self.fs.exists(path):
            self._load()

    # -- apply / reconcile (M1, repo_operations.py:114-240) ------------
    def apply_entity(self, entity: Entity) -> None:
        self.entities[entity.name] = entity

    def apply_feature_view(self, view: FeatureView) -> None:
        existing = self.feature_views.get(view.name)
        if existing is not None and not view.materialization_intervals:
            # keep bookkeeping across re-applies
            view.materialization_intervals = existing.materialization_intervals
        self.feature_views[view.name] = view

    def apply_feature_service(self, service: FeatureService) -> None:
        self.feature_services[service.name] = service

    def apply_on_demand_view(self, view: OnDemandFeatureView) -> None:
        self.on_demand_views[view.name] = view

    def get_on_demand_view(self, name: str) -> OnDemandFeatureView:
        if name not in self.on_demand_views:
            raise FeatureViewNotFoundError(name)
        return self.on_demand_views[name]

    def delete_entity(self, name: str) -> None:
        if name not in self.entities:
            raise EntityNotFoundError(name)
        del self.entities[name]

    def delete_feature_view(self, name: str) -> None:
        if name not in self.feature_views:
            raise FeatureViewNotFoundError(name)
        del self.feature_views[name]

    # -- getters -------------------------------------------------------
    def get_entity(self, name: str) -> Entity:
        if name not in self.entities:
            raise EntityNotFoundError(name)
        return self.entities[name]

    def get_feature_view(self, name: str) -> FeatureView:
        if name not in self.feature_views:
            raise FeatureViewNotFoundError(name)
        return self.feature_views[name]

    def get_feature_service(self, name: str) -> FeatureService:
        return self.feature_services[name]

    def list_entities(self) -> list[Entity]:
        return list(self.entities.values())

    def list_feature_views(self) -> list[FeatureView]:
        return list(self.feature_views.values())

    # -- materialization intervals (M2, registry.py:215-258) -----------
    def apply_materialization(
        self, view_name: str, start: datetime, end: datetime
    ) -> None:
        view = self.get_feature_view(view_name)
        view.materialization_intervals.append((start, end))

    # -- persistence ---------------------------------------------------
    def commit(self) -> None:
        """Single atomic write (registry.py:390-393,473-501): temp +
        rename locally/HDFS, single-object PUT on object stores."""
        payload = {
            "entities": [e.to_dict() for e in self.entities.values()],
            "feature_views": [v.to_dict() for v in self.feature_views.values()],
            "feature_services": [s.to_dict() for s in self.feature_services.values()],
            "on_demand_views": [v.to_dict() for v in self.on_demand_views.values()],
        }
        self.fs.write_bytes_atomic(
            self.path, json.dumps(payload, indent=1).encode()
        )

    def refresh(self) -> None:
        """Re-read the backing object (reference registry.py:110-126):
        long-lived sessions pick up commits from other writers."""
        if self.fs.exists(self.path):
            self._load()

    def _load(self) -> None:
        payload = json.loads(self.fs.read_bytes(self.path))
        self.entities = {
            e["name"]: Entity.from_dict(e) for e in payload.get("entities", [])
        }
        self.feature_views = {
            v["name"]: FeatureView.from_dict(v)
            for v in payload.get("feature_views", [])
        }
        # services need views resolved
        self.feature_services = {}
        for s in payload.get("feature_services", []):
            projections = [
                self.feature_views[p["view"]].with_projection(p["features"])
                for p in s.get("projections", [])
            ]
            self.feature_services[s["name"]] = FeatureService(
                name=s["name"], features=projections, tags=s.get("tags", {})
            )
        # transforms are code: loaded entries are metadata-only until
        # re-applied from the repo file (OnDemandFeatureView docstring)
        self.on_demand_views = {
            v["name"]: OnDemandFeatureView.from_dict(v)
            for v in payload.get("on_demand_views", [])
        }
