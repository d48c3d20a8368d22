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
import posixpath
import time
from datetime import datetime, timezone

from feast_spark.entity import Entity
from feast_spark.errors import EntityNotFoundError, FeatureViewNotFoundError
from feast_spark.feature_view import (
    FeatureService,
    FeatureView,
    OnDemandFeatureView,
)
from feast_spark.io.fs import LocalFS, StoreFS


class Registry:
    def __init__(
        self,
        path: str,
        fs: StoreFS | None = None,
        keep_history: int | None = None,
    ):
        """``keep_history=None`` (default) defers to the archive window
        the registry was last COMMITTED with — each commit persists its
        effective window in the registry head, so a commit from a
        differently-configured process honors the original committer's
        retention instead of silently pruning archived seqs that
        ``load_as_of(seq)`` callers depend on (the ``io/manifest.py``
        ``keep_versions`` discipline, one layer up).  An explicit int
        overrides."""
        self.path = path
        self.fs = fs or LocalFS()
        self._keep_arg = None if keep_history is None else max(1, keep_history)
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

    #: archive window when neither the caller nor the registry file
    #: names one (definitions are small JSON; the window exists so a
    #: runaway apply loop cannot grow the sidecar unboundedly).  This
    #: was the class-wide default before the window was persisted, so
    #: legacy registry files with no stored window fall back to it —
    #: upgrading cannot shrink their retention.
    DEFAULT_KEEP_HISTORY = 50

    @property
    def keep_history(self) -> int:
        """The effective archive window: the explicit constructor arg
        (or assignment), else the window persisted in the registry
        head, else :attr:`DEFAULT_KEEP_HISTORY`."""
        return self._effective_keep(self.stored_keep_history())

    @keep_history.setter
    def keep_history(self, value: int | None) -> None:
        self._keep_arg = None if value is None else max(1, value)

    def stored_keep_history(self) -> int | None:
        """The window persisted by the last commit, or None for a
        registry file predating window persistence."""
        if self.fs.exists(self.path):
            return json.loads(self.fs.read_bytes(self.path)).get(
                "keep_history"
            )
        return None

    def _effective_keep(self, stored: int | None) -> int:
        if self._keep_arg is not None:
            return self._keep_arg
        return max(1, stored) if stored else self.DEFAULT_KEEP_HISTORY

    def _history_dir(self) -> str:
        return f"{self.path}.history"

    def commit(self) -> None:
        """Single atomic write (registry.py:390-393,473-501): temp +
        rename locally/HDFS, single-object PUT on object stores.

        Every commit also archives the full payload under
        ``<path>.history/seq=N.json`` (written BEFORE the head flip,
        the ``io/epochs.py`` ordering — a crash orphan is overwritten
        by the next commit), stamped with a monotonically increasing
        ``seq`` and ``committed_at`` — so :meth:`load_as_of` answers
        "which feature definitions were live when model X trained"
        (the reference keeps no registry history; this is the index /
        online-store time-travel discipline applied to the control
        plane).  The newest :attr:`keep_history` versions are kept;
        the effective window is persisted in the head payload so later
        commits from differently-configured processes honor it (an
        explicit constructor arg overrides; legacy heads fall back to
        :attr:`DEFAULT_KEEP_HISTORY`).
        The seq derivation + archive + head flip run under the
        registry lock: head was last-writer-wins before (reference
        semantics), but two concurrent appliers minting the SAME seq
        would silently cross-clobber the archive — corrupting exactly
        the provenance record the history exists for."""
        with self.fs.lock(self.path):
            prev_seq = 0
            stored_keep = None
            if self.fs.exists(self.path):
                head = json.loads(self.fs.read_bytes(self.path))
                prev_seq = head.get("seq", 0)
                stored_keep = head.get("keep_history")
            keep = self._effective_keep(stored_keep)
            payload = {
                "seq": prev_seq + 1,
                "committed_at": time.time(),
                "keep_history": keep,
                "entities": [e.to_dict() for e in self.entities.values()],
                "feature_views": [
                    v.to_dict() for v in self.feature_views.values()
                ],
                "feature_services": [
                    s.to_dict() for s in self.feature_services.values()
                ],
                "on_demand_views": [
                    v.to_dict() for v in self.on_demand_views.values()
                ],
            }
            data = json.dumps(payload, indent=1).encode()
            self.fs.write_bytes_atomic(
                posixpath.join(
                    self._history_dir(), f"seq={prev_seq + 1}.json"
                ),
                data,
            )
            self.fs.write_bytes_atomic(self.path, data)
            for s in self.history_seqs()[:-keep]:
                self.fs.delete(
                    posixpath.join(self._history_dir(), f"seq={s}.json")
                )

    def history_seqs(self) -> list[int]:
        """Sorted archived registry versions (the load_as_of targets)."""
        base = self._history_dir()
        out = []
        for name in self.fs.list_files(base) if self.fs.exists(base) else []:
            if name.startswith("seq=") and name.endswith(".json"):
                body = name[4:-5]
                if body.isdigit():
                    out.append(int(body))
        return sorted(out)

    @classmethod
    def load_as_of(
        cls,
        path: str,
        as_of: int | datetime,
        fs: StoreFS | None = None,
    ) -> "Registry":
        """A read-only snapshot of the registry as committed at seq
        ``as_of`` (int) or at wall-clock instant ``as_of`` (datetime,
        naive = UTC — the latest commit at-or-before it).  Calling
        :meth:`commit` on the snapshot is refused: republishing an old
        version as head must be an explicit apply, not an accident."""
        fs = fs or LocalFS()
        reg = cls.__new__(cls)
        reg.path = path
        reg.fs = fs
        seqs = reg.history_seqs()
        if not seqs:
            raise ValueError(
                f"no registry history at {path} — the registry predates "
                "version archiving (its next apply starts the log)"
            )
        if isinstance(as_of, datetime):
            ts = as_of
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            epoch = ts.timestamp()
            live = []
            for s in seqs:
                p = posixpath.join(f"{path}.history", f"seq={s}.json")
                if json.loads(fs.read_bytes(p)).get(
                    "committed_at", float("inf")
                ) <= epoch:
                    live.append(s)
            if not live:
                raise ValueError(
                    f"no registry version at {path} as of {as_of}: "
                    f"oldest archived seq is {seqs[0]} (versions past "
                    "keep_history are pruned)"
                )
            seq = live[-1]
        else:
            if as_of not in seqs:
                raise ValueError(
                    f"no registry version seq={as_of} at {path}: "
                    f"archived seqs {seqs[0]}..{seqs[-1]} (versions "
                    "past keep_history are pruned)"
                )
            seq = as_of
        hp = posixpath.join(f"{path}.history", f"seq={seq}.json")
        return cls.from_payload(
            json.loads(fs.read_bytes(hp)), path=path, fs=fs, seq=seq
        )

    @classmethod
    def from_payload(
        cls,
        payload: dict,
        path: str = "<embedded>",
        fs: StoreFS | None = None,
        seq: int | None = None,
    ) -> "Registry":
        """A read-only Registry built from an archived payload dict —
        the deserialization half of :meth:`load_as_of`, also used to
        resurrect the registry EMBEDDED in a provenance record
        (provenance.py) after ``keep_history`` pruned the archive.
        Commit is refused: republishing an old version as head must be
        an explicit apply, not an accident."""
        reg = cls.__new__(cls)
        reg.path = path
        reg.fs = fs or LocalFS()
        reg._keep_arg = None
        reg.entities = {}
        reg.feature_views = {}
        reg.feature_services = {}
        reg.on_demand_views = {}
        reg._load_payload(payload)
        reg._frozen_seq = seq if seq is not None else payload.get("seq")

        def _refuse_commit() -> None:
            raise RuntimeError(
                f"this Registry is a read-only as_of={reg._frozen_seq} "
                "snapshot; load the live registry to apply changes"
            )

        reg.commit = _refuse_commit  # type: ignore[method-assign]
        return reg

    def refresh(self) -> None:
        """Re-read the backing object (reference registry.py:110-126):
        long-lived sessions pick up commits from other writers."""
        if self.fs.exists(self.path):
            self._load()

    def _load(self) -> None:
        self._load_payload(json.loads(self.fs.read_bytes(self.path)))

    def _load_payload(self, payload: dict) -> None:
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
