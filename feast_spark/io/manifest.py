"""Manifest-flip parquet table: the object-store-safe commit protocol
shared by the online store and every incrementally-maintained rollup
table (sketches, decayed feature state).

Protocol (no directory renames anywhere, so it holds on S3/GCS/ABFS
semantics exactly like ``online/store.py``): a writer (1) writes the
new snapshot into a fresh ``v_<n>`` directory numbered past every
existing one — committed or orphaned, so a crashed writer's leftovers
are never overwritten — then (2) atomically replaces
``_MANIFEST.json`` to point at it.  Readers resolve the manifest
first; they either see the old complete snapshot or the new complete
snapshot, never a partial write.  GC keeps the last ``keep_versions``
snapshots (concurrent readers of the previous version stay valid) and
is best-effort — a failed delete is retried by the next commit.
"""

from __future__ import annotations

import json
import posixpath
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from feast_spark.io.fs import LocalFS, StoreFS

MANIFEST = "_MANIFEST.json"

#: GC window when neither the caller nor the manifest names one
DEFAULT_KEEP_VERSIONS = 2


def _to_epoch_s(dt: datetime) -> float:
    """Naive datetimes are UTC (the store's timestamp convention)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


class ManifestedParquetTable:
    """A versioned parquet directory with atomic manifest-flip commits."""

    def __init__(
        self,
        root: str,
        fs: StoreFS | None = None,
        keep_versions: int | None = None,
    ):
        """``keep_versions=None`` (default) defers to the window the
        table was COMMITTED with — each commit persists its effective
        ``keep_versions`` in the manifest, so a later ``vacuum()`` (or
        a commit from a differently-configured process) honors the
        committer's retention instead of silently shrinking it to a
        caller-side default and deleting snapshots the original
        retention meant to keep.  An explicit int overrides."""
        self.root = root
        self.fs = fs or LocalFS()
        self._keep_arg = None if keep_versions is None else max(1, keep_versions)

    @property
    def keep_versions(self) -> int:
        """The effective GC window: the explicit constructor arg, else
        the manifest's stored window, else the default."""
        return self._effective_keep(self._read_manifest())

    def stored_keep_versions(self) -> int | None:
        """The window persisted by the last commit, or None for a
        manifest predating window persistence (callers with a
        layer-specific historical default use this to avoid silently
        shrinking such a table's retention to the global default)."""
        return self._read_manifest().get("keep_versions")

    def _effective_keep(self, manifest: dict) -> int:
        if self._keep_arg is not None:
            return self._keep_arg
        stored = manifest.get("keep_versions")
        return max(1, stored) if stored else DEFAULT_KEEP_VERSIONS

    def _manifest_path(self) -> str:
        return posixpath.join(self.root, MANIFEST)

    def current_path(self) -> str | None:
        mp = self._manifest_path()
        if not self.fs.exists(mp):
            return None
        version = json.loads(self.fs.read_bytes(mp))["current"]
        return posixpath.join(self.root, version)

    def _next_version(self) -> str:
        versions = [
            int(d[2:])
            for d in self.fs.list_subdirs(self.root)
            if d.startswith("v_") and d[2:].isdigit()
        ]
        return f"v_{(max(versions) + 1 if versions else 1):08d}"

    def read(
        self, spark: SparkSession, as_of: int | str | datetime | None = None
    ) -> DataFrame | None:
        if as_of is not None:
            return spark.read.parquet(self.path_as_of(as_of))
        current = self.current_path()
        if current is None:
            return None
        return spark.read.parquet(current)

    def current_meta(self) -> dict:
        """Caller-supplied metadata recorded with the last commit (e.g.
        the streaming epoch watermark); empty before the first commit."""
        mp = self._manifest_path()
        if not self.fs.exists(mp):
            return {}
        return json.loads(self.fs.read_bytes(mp)).get("meta", {})

    def read_table(self, spark: SparkSession, name: str) -> DataFrame | None:
        """Read one named sub-table of a :meth:`commit_tables` snapshot."""
        current = self.current_path()
        if current is None:
            return None
        return spark.read.parquet(posixpath.join(current, name))

    def commit_tables(
        self,
        tables: dict[str, DataFrame],
        partition_by: dict[str, list[str]] | None = None,
        meta: dict | None = None,
    ) -> int:
        """Atomically commit SEVERAL named tables as ONE snapshot (one
        manifest flip): each DataFrame lands under
        ``{root}/v_<n>/<name>``, optionally ``partitionBy`` its listed
        columns, and readers resolving the manifest always see a
        CONSISTENT set (e.g. a postings table and the corpus stats it
        was computed with — two separate manifests could flip between a
        reader's two resolves).  Meta merges like :meth:`commit`.
        Returns the commit seq."""
        version = self._next_version()
        for name, tdf in tables.items():
            w = tdf.write.mode("errorifexists")
            cols = (partition_by or {}).get(name)
            if cols:
                w = w.partitionBy(*cols)
            w.parquet(posixpath.join(self.root, version, name))
        return self._flip(version, meta, tables=sorted(tables))

    def commit(self, df: DataFrame, meta: dict | None = None) -> int:
        """Write a new snapshot and flip the manifest to it; returns
        the commit seq (minted UNDER the manifest lock — re-reading
        ``history()[-1]`` after the fact could return a concurrent
        committer's seq, a wrong provenance coordinate).

        ``meta`` MERGES over the previous commit's meta (it does not
        replace it): a manual ``update()`` between streaming
        micro-batches — backfill, a late slice — must not wipe the
        streaming epoch watermark, or an at-least-once replay of an
        already-applied epoch after a restart would be re-folded
        (double-counting).  Pass an explicit ``{"key": None}`` to
        delete a meta key."""
        version = self._next_version()
        df.write.mode("errorifexists").parquet(
            posixpath.join(self.root, version)
        )
        return self._flip(version, meta)

    def _read_manifest(self) -> dict:
        mp = self._manifest_path()
        if not self.fs.exists(mp):
            return {}
        return json.loads(self.fs.read_bytes(mp))

    def history(self) -> list[dict]:
        """The retained commit log, oldest first: one
        ``{"seq", "version", "committed_at"}`` entry per commit whose
        snapshot directory GC still keeps (the ``keep_versions``
        window, plus every tagged commit) — the resolvable time-travel
        targets."""
        return list(self._read_manifest().get("history", []))

    def tags(self) -> dict[str, int]:
        """Named commit pins ``{name: seq}``.  A tagged snapshot is
        exempt from ``keep_versions`` GC until its tag is deleted — the
        io/epochs.py tag discipline applied to the snapshot store, so a
        provenance-pinned online state ("the snapshots the June model
        served from") survives daily materializations."""
        return dict(self._read_manifest().get("tags", {}))

    def tag(self, name: str, seq: int | None = None) -> int:
        """Pin commit ``seq`` (default: head) under ``name``; returns
        the pinned seq.  Names must be non-numeric so they can never
        shadow a literal seq in :meth:`path_as_of`.  Runs under the
        manifest lock — a tag committed while a concurrent commit's GC
        computes its keep set cannot end up pinned to a snapshot that
        GC then deletes (the epochs.py tag-vs-vacuum discipline)."""
        if not name or name.isdigit() or "=" in name or "," in name:
            # the same rule io/epochs.py enforces: numeric names would
            # shadow literal seqs in as_of resolution; '='/',' break
            # the doctor --history tags=a,b rendering contract
            raise ValueError(
                f"tag name {name!r} must be non-empty, non-numeric and "
                "free of '='/','"
            )
        with self.fs.lock(self._manifest_path()):
            manifest = self._read_manifest()
            hist = manifest.get("history", [])
            if not hist:
                raise ValueError(
                    f"no commit history at {self.root} — commit once to "
                    "start the log, then tag"
                )
            if seq is None:
                seq = hist[-1]["seq"]
            if seq not in {e["seq"] for e in hist}:
                retained = ", ".join(str(e["seq"]) for e in hist)
                raise ValueError(
                    f"no retained snapshot for commit seq={seq} at "
                    f"{self.root}: retained seqs {retained} (GC'd "
                    "snapshots cannot be pinned after the fact)"
                )
            tags = dict(manifest.get("tags", {}))
            tags[name] = int(seq)
            manifest["tags"] = tags
            self.fs.write_bytes_atomic(
                self._manifest_path(), json.dumps(manifest).encode()
            )
        return int(seq)

    def vacuum(self) -> list[str]:
        """Re-run GC against the CURRENT manifest without committing a
        new snapshot: reclaim versions a deleted tag left behind (GC
        otherwise only runs inside a commit, so an unpinned snapshot on
        a cold table would linger until someone writes).  Same keep
        rules as the commit path — last ``keep_versions``, the current
        version, every tagged version — with the history log truncated
        to survivors BEFORE the deletes (readers resolve the manifest
        first, so a concurrent as_of read never holds a path the
        manifest still lists).  Returns the deleted version dirs."""
        with self.fs.lock(self._manifest_path()):
            manifest = self._read_manifest()
            if not manifest:
                return []
            versions = sorted(
                d
                for d in self.fs.list_subdirs(self.root)
                if d.startswith("v_") and d[2:].isdigit()
            )
            tags = manifest.get("tags", {})
            pinned_seqs = set(tags.values())
            pinned = {
                e["version"]
                for e in manifest.get("history", [])
                if e["seq"] in pinned_seqs
            }
            keep = (
                set(versions[-self._effective_keep(manifest):])
                | {manifest["current"]}
                | pinned
            )
            manifest["history"] = [
                e
                for e in manifest.get("history", [])
                if e["version"] in keep
            ]
            self.fs.write_bytes_atomic(
                self._manifest_path(), json.dumps(manifest).encode()
            )
            deleted = []
            for v in versions:
                if v not in keep:
                    try:
                        self.fs.delete(posixpath.join(self.root, v))
                        deleted.append(v)
                    except Exception:
                        pass  # best-effort, like commit-path GC
            return deleted

    def delete_tag(self, name: str) -> None:
        """Unpin ``name``; its snapshot rejoins the normal GC window at
        the next commit (or an explicit :meth:`vacuum`)."""
        with self.fs.lock(self._manifest_path()):
            manifest = self._read_manifest()
            tags = dict(manifest.get("tags", {}))
            if name not in tags:
                raise ValueError(
                    f"no tag {name!r} at {self.root}; committed tags: "
                    f"{sorted(tags)}"
                )
            del tags[name]
            if tags:
                manifest["tags"] = tags
            else:
                manifest.pop("tags", None)
            self.fs.write_bytes_atomic(
                self._manifest_path(), json.dumps(manifest).encode()
            )

    def path_as_of(self, as_of: int | str | datetime) -> str:
        """The snapshot directory serving reads resolved at commit seq
        ``as_of`` (int), tag name ``as_of`` (str — a :meth:`tag` pin),
        or at wall-clock instant ``as_of`` (datetime, naive = UTC): the
        latest commit at-or-before that instant — Delta's ``TIMESTAMP
        AS OF``, possible because snapshots are immutable and GC keeps
        ``keep_versions`` of them (plus every tagged commit).  Raises
        with the surviving window when the target is older than
        retention (GC'd snapshots are gone; the error is honest).  An
        instant at or past the last commit resolves to HEAD — head is
        what serving returned at every instant since that commit
        (pinned by tests; int seqs, by contrast, raise when unknown)."""
        if isinstance(as_of, str):
            tags = self.tags()
            if as_of not in tags:
                raise ValueError(
                    f"no tag {as_of!r} at {self.root}; committed tags: "
                    f"{sorted(tags)}"
                )
            as_of = tags[as_of]
        hist = self.history()
        if not hist:
            raise ValueError(
                f"no commit history at {self.root} — the table predates "
                "commit logging (its next commit starts the log) or was "
                "never committed"
            )
        retained = ", ".join(str(e["seq"]) for e in hist)
        if isinstance(as_of, datetime):
            ts = _to_epoch_s(as_of)
            live = [e for e in hist if e["committed_at"] <= ts]
            if not live:
                oldest = datetime.fromtimestamp(
                    hist[0]["committed_at"], tz=timezone.utc
                )
                raise ValueError(
                    f"no snapshot at {self.root} as of {as_of}: the "
                    f"oldest retained commit is seq={hist[0]['seq']} at "
                    f"{oldest:%Y-%m-%d %H:%M:%S}Z — older snapshots were "
                    "reclaimed by keep_versions GC (raise keep_versions "
                    "to widen the window)"
                )
            entry = live[-1]
            # tag pins make the retained log GAPPED: if the commit
            # AFTER the resolved one was GC'd, the snapshot actually
            # serving at the requested instant may be among the
            # expired seqs (their committed_at fell somewhere in the
            # gap) — silently returning the pinned-but-stale snapshot
            # would be exactly the wrong-answer time travel promises
            # never to give.  Raise honestly; seq/tag targets stay
            # exact.
            idx = hist.index(entry)
            if (
                idx + 1 < len(hist)
                and hist[idx + 1]["seq"] > entry["seq"] + 1
            ):
                raise ValueError(
                    f"ambiguous instant at {self.root}: commits "
                    f"{entry['seq'] + 1}..{hist[idx + 1]['seq'] - 1} "
                    "were reclaimed by keep_versions GC, and the "
                    f"snapshot serving at {as_of} may be among them "
                    f"(retained seqs: {retained}) — resolve by commit "
                    "seq or tag name instead"
                )
        else:
            by_seq = {e["seq"]: e for e in hist}
            if as_of not in by_seq:
                raise ValueError(
                    f"no snapshot at {self.root} for commit seq={as_of}: "
                    f"retained seqs {retained} "
                    "(keep_versions GC reclaims untagged snapshots)"
                )
            entry = by_seq[as_of]
        return posixpath.join(self.root, entry["version"])

    def _flip(
        self,
        version: str,
        meta: dict | None,
        tables: list[str] | None = None,
    ) -> int:
        # read-modify-write of seq/meta/history under the manifest
        # lock: the documented manual-commit-beside-streaming flow
        # means two writers CAN interleave, and an unlocked seq
        # derivation would mint duplicate seqs and a commit log that
        # path_as_of silently mis-resolves (same hazard io/epochs.py
        # commit_manifest locks against)
        with self.fs.lock(self._manifest_path()):
            return self._flip_locked(version, meta, tables)

    def _flip_locked(
        self,
        version: str,
        meta: dict | None,
        tables: list[str] | None = None,
    ) -> int:
        prev = self._read_manifest()
        keep_n = self._effective_keep(prev)
        manifest = {"current": version, "format": "parquet"}
        if tables:
            manifest["tables"] = tables
        merged = dict(prev.get("meta", {}))
        merged.update(meta or {})
        merged = {k: v for k, v in merged.items() if v is not None}
        if merged:
            manifest["meta"] = merged
        versions = sorted(
            d
            for d in self.fs.list_subdirs(self.root)
            if d.startswith("v_") and d[2:].isdigit()
        )
        # tagged snapshots are GC-exempt: their versions join the keep
        # set (and therefore stay in the history log, so path_as_of can
        # still resolve them) until the tag is deleted
        tags = dict(prev.get("tags", {}))
        pinned_seqs = set(tags.values())
        pinned_versions = {
            e["version"]
            for e in prev.get("history", [])
            if e["seq"] in pinned_seqs
        }
        keep = (
            set(versions[-keep_n:])
            | {version}
            | pinned_versions
        )
        # commit log: seq + wall-clock per commit, truncated to the
        # kept snapshot dirs so every listed entry is resolvable
        # (path_as_of / time travel); recorded in the SAME atomic
        # manifest write that publishes the snapshot
        seq = prev.get("seq", 0) + 1
        history = [
            e for e in prev.get("history", []) if e["version"] in keep
        ]
        history.append(
            {"seq": seq, "version": version, "committed_at": time.time()}
        )
        manifest["seq"] = seq
        manifest["history"] = history
        # the committer's retention is part of the table's contract:
        # persisted so vacuum() and other processes honor it by default
        manifest["keep_versions"] = keep_n
        if tags:
            manifest["tags"] = tags
        self.fs.write_bytes_atomic(
            self._manifest_path(),
            json.dumps(manifest).encode(),
        )
        for v in versions:
            if v not in keep:
                try:
                    self.fs.delete(posixpath.join(self.root, v))
                except Exception:
                    pass  # GC is best-effort; next commit retries
        return seq
