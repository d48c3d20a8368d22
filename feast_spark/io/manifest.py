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

from pyspark.sql import DataFrame, SparkSession

from feast_spark.io.fs import LocalFS, StoreFS

MANIFEST = "_MANIFEST.json"


class ManifestedParquetTable:
    """A versioned parquet directory with atomic manifest-flip commits."""

    def __init__(
        self,
        root: str,
        fs: StoreFS | None = None,
        keep_versions: int = 2,
    ):
        self.root = root
        self.fs = fs or LocalFS()
        self.keep_versions = max(1, keep_versions)

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

    def read(self, spark: SparkSession) -> DataFrame | None:
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
    ) -> None:
        """Atomically commit SEVERAL named tables as ONE snapshot (one
        manifest flip): each DataFrame lands under
        ``{root}/v_<n>/<name>``, optionally ``partitionBy`` its listed
        columns, and readers resolving the manifest always see a
        CONSISTENT set (e.g. a postings table and the corpus stats it
        was computed with — two separate manifests could flip between a
        reader's two resolves).  Meta merges like :meth:`commit`."""
        version = self._next_version()
        for name, tdf in tables.items():
            w = tdf.write.mode("errorifexists")
            cols = (partition_by or {}).get(name)
            if cols:
                w = w.partitionBy(*cols)
            w.parquet(posixpath.join(self.root, version, name))
        self._flip(version, meta, tables=sorted(tables))

    def commit(self, df: DataFrame, meta: dict | None = None) -> None:
        """Write a new snapshot and flip the manifest to it.

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
        self._flip(version, meta)

    def _flip(
        self,
        version: str,
        meta: dict | None,
        tables: list[str] | None = None,
    ) -> None:
        manifest = {"current": version, "format": "parquet"}
        if tables:
            manifest["tables"] = tables
        merged = dict(self.current_meta())
        merged.update(meta or {})
        merged = {k: v for k, v in merged.items() if v is not None}
        if merged:
            manifest["meta"] = merged
        self.fs.write_bytes_atomic(
            self._manifest_path(),
            json.dumps(manifest).encode(),
        )
        versions = sorted(
            d
            for d in self.fs.list_subdirs(self.root)
            if d.startswith("v_") and d[2:].isdigit()
        )
        keep = set(versions[-self.keep_versions :]) | {version}
        for v in versions:
            if v not in keep:
                try:
                    self.fs.delete(posixpath.join(self.root, v))
                except Exception:
                    pass  # GC is best-effort; next commit retries
