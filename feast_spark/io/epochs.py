"""Shared epoch-append commit protocol for persisted indexes.

One implementation of the stage-then-flip discipline the BM25
(``operators/bm25.py``), minhash (``operators/minhash_index.py``) and
IVF (``operators/similarity.py``) indexes all follow:

* writers stage new ``epoch=N`` directories under each of the index's
  sub-tables first, then atomically rewrite ``_MANIFEST.json`` to
  include the epoch — readers resolve the manifest, so a crashed
  writer's partial directories are invisible;
* epoch numbering skips BOTH committed epochs and orphaned directories
  (a crashed writer's leftovers), so stages never collide — appends
  are single-writer;
* ``vacuum`` deletes only directories the committed manifest no longer
  references (compaction leftovers, crash orphans) — never anything a
  new reader could resolve (the Delta/Iceberg OPTIMIZE-then-VACUUM
  split; run it once readers of the previous manifest have drained).

Each index keeps its own manifest SCHEMA (signature params, bucketing
params, centroid generation pointer); this module owns only the
protocol mechanics.
"""

from __future__ import annotations

import json
import posixpath

from feast_spark.io.fs import LocalFS, StoreFS

MANIFEST = "_MANIFEST.json"


def read_manifest(
    path: str,
    fs: StoreFS,
    required_keys: tuple[str, ...] = ("epochs",),
    kind: str = "index",
    kind_id: str | None = None,
) -> dict:
    """Load and validate the committed manifest.  A manifest missing
    ``required_keys`` — e.g. one written by an older, incompatible
    layout of the same index — raises the same friendly ValueError as
    a missing index rather than a downstream KeyError.

    ``kind_id`` is the positive cross-kind guard: builders stamp their
    manifest with ``"kind"`` and readers pass their own id, so a path
    rebuilt as a DIFFERENT index kind fails loudly even when the
    required keys happen to overlap (every kind writes ``epochs``, so
    key checks alone cannot distinguish e.g. a stale IVF reader from a
    fresh IVFPQ manifest).  Manifests predating the stamp (no ``kind``
    key) are accepted for backward compatibility."""
    mp = posixpath.join(path, MANIFEST)
    if not fs.exists(mp):
        raise ValueError(f"no {kind} committed at {path}")
    manifest = json.loads(fs.read_bytes(mp))
    missing = [k for k in required_keys if k not in manifest]
    if missing:
        raise ValueError(
            f"no {kind} committed at {path}: manifest lacks "
            f"{missing} (incompatible or foreign layout)"
        )
    if (
        kind_id is not None
        and "kind" in manifest
        and manifest["kind"] != kind_id
    ):
        raise ValueError(
            f"no {kind} committed at {path}: the committed manifest is a "
            f"{manifest['kind']!r} index (rebuilt as a different kind?)"
        )
    return manifest


def commit_manifest(path: str, fs: StoreFS, manifest: dict) -> None:
    fs.write_bytes_atomic(
        posixpath.join(path, MANIFEST), json.dumps(manifest).encode()
    )


# the sidecar keys a rebuild preserves from a pre-existing manifest
CARRY_KEYS = ("stream_epoch",)


def carried_meta(
    path: str, fs: StoreFS, carry_keys: tuple[str, ...] = CARRY_KEYS
) -> dict:
    """The ALLOWLISTED sidecar keys of the manifest already committed
    at ``path``, if any.  Rebuild-over-existing-index carries these
    forward into the fresh manifest so sidecar state survives —
    concretely the streaming sink's ``stream_epoch`` watermark: a
    rebuild that dropped it would let a crash-replay straddling the
    rebuild re-append a micro-batch whose docs the rebuild corpus
    already contains (``streaming/index_sink.py`` promises the
    watermark survives non-streaming commits).

    An allowlist, NOT everything-but-my-structural-keys: rebuilding a
    path as a DIFFERENT index kind must not drag the old kind's
    structural keys (e.g. minhash ``params``) into the new manifest —
    that would let the old kind's readers pass ``read_manifest``
    validation and silently read the STALE pre-rebuild epoch
    directories, instead of failing loudly with the
    incompatible-layout error.  (The ``kind`` stamp guards that too,
    but only for manifests new enough to carry it.)  The accepted
    trade-off: user sidecar keys written via ``*_index_append(meta=)``
    survive appends and compacts ({**manifest, ...}) but NOT a
    rebuild — a rebuild is a new index over a new corpus, so stale
    per-corpus annotations are dropped by design; re-attach them via
    the first append's ``meta`` if they still apply."""
    mp = posixpath.join(path, MANIFEST)
    if not fs.exists(mp):
        return {}
    manifest = json.loads(fs.read_bytes(mp))
    return {k: manifest[k] for k in carry_keys if k in manifest}


def next_epoch(
    path: str, fs: StoreFS, committed: list[int], subdirs: tuple[str, ...]
) -> int:
    """Number past every committed epoch AND every orphaned directory a
    crashed writer may have left under any sub-table."""
    seen = set(committed)
    for sub in subdirs:
        base = posixpath.join(path, sub)
        for d in fs.list_subdirs(base) if fs.exists(base) else []:
            if d.startswith("epoch=") and d[6:].isdigit():
                seen.add(int(d[6:]))
    return (max(seen) + 1) if seen else 0


def vacuum_epochs(
    path: str,
    fs: StoreFS | None,
    live_epochs: list[int],
    subdirs: tuple[str, ...],
) -> dict[str, list[str]]:
    """Delete ``epoch=*`` directories not in ``live_epochs`` under each
    sub-table; returns {subdir: [removed, ...]}."""
    fs = fs or LocalFS()
    live = {f"epoch={e}" for e in live_epochs}
    removed: dict[str, list[str]] = {sub: [] for sub in subdirs}
    for sub in subdirs:
        base = posixpath.join(path, sub)
        for d in fs.list_subdirs(base) if fs.exists(base) else []:
            if d.startswith("epoch=") and d not in live:
                fs.delete(posixpath.join(base, d))
                removed[sub].append(d)
    return {k: sorted(v) for k, v in removed.items()}


def epoch_paths(path: str, sub: str, epochs: list[int]) -> list[str]:
    return [posixpath.join(path, sub, f"epoch={e}") for e in epochs]
