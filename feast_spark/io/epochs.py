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


class ConcurrentCommitError(RuntimeError):
    """A manifest flip raced another writer: the committed head is no
    longer the manifest this write derived from.  The epoch protocol is
    single-writer by contract; this error turns a contract violation —
    which plain ``os.replace`` would resolve as silent last-writer-wins
    (lost epochs, lost pair stamps) — into a loud failure.  Re-read the
    manifest and re-apply the change, or fix the duplicated writer."""


def commit_manifest(path: str, fs: StoreFS, manifest: dict) -> None:
    """Atomically publish ``manifest`` — with optimistic concurrency
    for every read-modify-write flow.

    Every committed manifest carries a monotonically increasing
    ``commit_seq``.  Writers that derive their manifest from the
    committed head (appends, compacts, meta stamps — anything built as
    ``{**read_manifest, ...}``) carry the head's ``commit_seq`` along,
    and this function treats that carried value as the expected parent:
    if the committed head has moved past it, the flip raises
    :class:`ConcurrentCommitError` instead of silently discarding the
    other writer's epochs/stamps.  Fresh manifests without a
    ``commit_seq`` (index BUILDS — including rebuild-over-existing,
    where ``carried_meta``'s allowlist deliberately drops the seq)
    overwrite unconditionally: a rebuild is a new index over a
    caller-supplied corpus, last-writer-wins by design, and it still
    bumps the seq so any in-flight pre-rebuild appender fails its CAS.

    The check-then-rename window is closed entirely on LocalFS (an
    flock around the read+compare+replace); on object stores
    ``StoreFS.lock`` defaults to a no-op and a production deployment
    maps the compare to the store's conditional put (S3 ``If-Match``,
    GCS ``ifGenerationMatch``) — SCALE.md documents the mapping.
    Manifests written before this protocol carry no seq; protection
    engages from their first re-commit."""
    mp = posixpath.join(path, MANIFEST)
    expected = manifest.get("commit_seq")
    with fs.lock(mp):
        head_seq = (
            json.loads(fs.read_bytes(mp)).get("commit_seq", 0)
            if fs.exists(mp)
            else None
        )
        if expected is not None and head_seq != expected:
            raise ConcurrentCommitError(
                f"manifest at {path} moved from commit_seq={expected} to "
                f"{head_seq} since it was read — another writer committed "
                "in between (the epoch protocol is single-writer per "
                "index).  Re-read the manifest and re-apply, or remove "
                "the duplicate writer."
            )
        out = {**manifest, "commit_seq": (head_seq or 0) + 1}
        fs.write_bytes_atomic(mp, json.dumps(out).encode())


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
