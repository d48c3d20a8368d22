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
HISTORY_DIR = "_history"
TAGS = "_TAGS.json"


def _history_path(path: str, seq: int) -> str:
    return posixpath.join(path, HISTORY_DIR, f"commit_seq={seq}.json")


def history_manifest_path(path: str, seq: int) -> str:
    """Where commit ``seq``'s archived manifest lives — the one owner
    of the archive layout (CLI and tools resolve through this)."""
    return _history_path(path, seq)


def retention_lock(path: str, fs: StoreFS):
    """The lock every retention-affecting writer must hold: tag /
    delete_tag / the vacuum sequence (retention_window → deletes →
    expire_history) all serialize on it, so a tag committed while a
    vacuum computes its keep set cannot end up pinned to a commit that
    vacuum then expires — the race would silently violate the
    'tagged commits are vacuum-immune' contract."""
    return fs.lock(posixpath.join(path, MANIFEST))


def read_tags(path: str, fs: StoreFS) -> dict[str, int]:
    """The index's named commit tags: ``{name: commit_seq}``.  A tagged
    commit is PINNED — exempt from every vacuum retention window until
    the tag is deleted (the Iceberg table-tag discipline): 'the corpus
    the 2024-06 model trained on' stays reproducible while daily
    vacuums reclaim everything else."""
    tp = posixpath.join(path, TAGS)
    if not fs.exists(tp):
        return {}
    return {str(k): int(v) for k, v in json.loads(fs.read_bytes(tp)).items()}


def tag_commit(path: str, fs: StoreFS | None, name: str, seq: int) -> None:
    """Pin ``commit_seq=seq`` under ``name``.  The seq must have an
    archived manifest (and therefore resolvable epochs) — tagging an
    already-expired commit would pin a read that can never succeed.
    Re-tagging an existing name moves it (one writer's deliberate
    choice; tags share the manifest's single-writer contract and the
    same lock)."""
    fs = fs or LocalFS()
    if not name or "=" in name or name.isdigit():
        # a digit-only tag would be ambiguous with a literal seq in
        # as_of=; '=' breaks the doctor --history rendering contract
        raise ValueError(
            f"tag name must be non-empty, non-numeric and '='-free, "
            f"got {name!r}"
        )
    tp = posixpath.join(path, TAGS)
    with retention_lock(path, fs):
        # existence checked INSIDE the lock: a vacuum holding it has
        # either finished (this seq survived or is gone — checked
        # against the post-vacuum truth) or has not started (it will
        # see this tag in its keep set) — never in between
        if not fs.exists(_history_path(path, seq)):
            avail = history_seqs(path, fs)
            window = (
                f"archived commits: {avail[0]}..{avail[-1]}"
                if avail else "no archived commits"
            )
            raise ValueError(
                f"cannot tag commit_seq={seq} at {path}: no archived "
                f"manifest ({window}) — only commits inside the history "
                "window can be pinned"
            )
        tags = read_tags(path, fs)
        tags[name] = int(seq)
        fs.write_bytes_atomic(tp, json.dumps(tags).encode())


def delete_tag(path: str, fs: StoreFS | None, name: str) -> None:
    """Unpin ``name`` — its commit joins the normal retention window
    and the NEXT vacuum may reclaim it.  Missing names raise (a cron
    deleting the wrong tag name should hear about it)."""
    fs = fs or LocalFS()
    tp = posixpath.join(path, TAGS)
    with retention_lock(path, fs):
        tags = read_tags(path, fs)
        if name not in tags:
            raise ValueError(
                f"no tag {name!r} at {path}; committed tags: "
                f"{sorted(tags)}"
            )
        del tags[name]
        fs.write_bytes_atomic(tp, json.dumps(tags).encode())


def resolve_as_of(
    path: str, fs: StoreFS, as_of: int | str
) -> int:
    """An ``as_of`` value as the commit seq it names: ints pass
    through, strings resolve through the tag table."""
    if isinstance(as_of, str):
        tags = read_tags(path, fs)
        if as_of not in tags:
            raise ValueError(
                f"no tag {as_of!r} at {path}; committed tags: "
                f"{sorted(tags)}"
            )
        return tags[as_of]
    return as_of


def history_seqs(path: str, fs: StoreFS) -> list[int]:
    """Sorted ``commit_seq`` values with an archived manifest under
    ``_history/`` — the index's time-travel window.  Bounded: one entry
    per commit, expired by vacuum down to its retention window."""
    base = posixpath.join(path, HISTORY_DIR)
    seqs = []
    for name in fs.list_files(base) if fs.exists(base) else []:
        if name.startswith("commit_seq=") and name.endswith(".json"):
            body = name[len("commit_seq="):-len(".json")]
            if body.isdigit():
                seqs.append(int(body))
    return sorted(seqs)


def read_manifest(
    path: str,
    fs: StoreFS,
    required_keys: tuple[str, ...] = ("epochs",),
    kind: str = "index",
    kind_id: str | None = None,
    as_of_seq: int | str | None = None,
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
    key) are accepted for backward compatibility.

    ``as_of_seq`` resolves the ARCHIVED manifest of that commit instead
    of the head — time travel, the Delta/Iceberg ``VERSION AS OF``
    discipline: every ``commit_manifest`` archives its result under
    ``_history/commit_seq=N.json``, and because epoch directories are
    write-once, a historical manifest's epoch list reads exactly the
    bytes head served at commit N (until vacuum expires the retention
    window — the error then names the surviving range).  Validation
    (required keys, kind stamp) applies to the archived manifest the
    same as to head, so travelling across a rebuild to a DIFFERENT
    index kind fails loudly rather than reading a foreign layout.
    A STRING ``as_of_seq`` resolves through the tag table
    (:func:`tag_commit`) — pinned named commits."""
    if as_of_seq is not None:
        as_of_seq = resolve_as_of(path, fs, as_of_seq)
        hp = _history_path(path, as_of_seq)
        if not fs.exists(hp):
            avail = history_seqs(path, fs)
            window = (
                f"archived commits: {avail[0]}..{avail[-1]}"
                if avail
                else "no archived commits (index predates manifest "
                "history, or vacuum expired them all)"
            )
            raise ValueError(
                f"no {kind} manifest archived at {path} for "
                f"commit_seq={as_of_seq} — {window}; commits past the "
                "vacuum retention window are expired"
            )
        manifest = json.loads(fs.read_bytes(hp))
    else:
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
        data = json.dumps(out).encode()
        # archive BEFORE the head flip so a committed head always has
        # its history entry (time travel to the head seq never 404s).
        # A crash between the two writes leaves an orphan history file
        # for a seq head never reached; the next commit computes the
        # same seq from head and atomically overwrites the orphan, so
        # history never shows a manifest that was not, or will not be,
        # the committed head at that seq.
        fs.write_bytes_atomic(
            _history_path(path, out["commit_seq"]), data
        )
        fs.write_bytes_atomic(mp, data)


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


def retention_window(
    path: str,
    fs: StoreFS,
    retain_last: int,
    head_seq: int | None = None,
) -> tuple[set[int], set[int], list[dict]]:
    """The vacuum retention window: ``(protected_epochs, keep_seqs,
    retained_manifests)`` covering the ``retain_last`` most recent
    archived commits plus the head's own archive entry (always kept so
    ``as_of=head`` never expires).  Epochs any retained manifest
    references are PROTECTED from vacuum — the Iceberg
    expire-snapshots discipline: the time-travel window and the
    in-flight-reader grace window are the same mechanism, because a
    reader that resolved manifest N scans exactly the directories
    manifest N lists."""
    if retain_last < 0:
        raise ValueError(f"retain_last must be >= 0, got {retain_last}")
    seqs = history_seqs(path, fs)
    keep = set(seqs[-retain_last:]) if retain_last > 0 else set()
    if head_seq is not None:
        keep.add(head_seq)
    # tagged commits are pinned OUTSIDE the sliding window: they stay
    # readable through any number of vacuums until the tag is deleted
    keep.update(read_tags(path, fs).values())
    protected: set[int] = set()
    manifests: list[dict] = []
    for s in sorted(keep):
        hp = _history_path(path, s)
        if not fs.exists(hp):
            continue  # a pre-history head has no archive entry
        m = json.loads(fs.read_bytes(hp))
        manifests.append(m)
        protected.update(m.get("epochs", []))
    return protected, keep, manifests


def expire_history(
    path: str, fs: StoreFS, keep_seqs: set[int]
) -> list[int]:
    """Delete archived manifests outside ``keep_seqs`` — run by vacuum
    AFTER epoch deletion so the time-travel window is honest: every
    surviving ``as_of`` target still has all of its epoch directories,
    and an expired target fails with the friendly range error instead
    of a missing-path read mid-scan."""
    removed = []
    for s in history_seqs(path, fs):
        if s not in keep_seqs:
            fs.delete(_history_path(path, s))
            removed.append(s)
    return removed


def vacuum_epochs(
    path: str,
    fs: StoreFS | None,
    live_epochs: list[int],
    subdirs: tuple[str, ...],
    protect_epochs: set[int] | frozenset[int] = frozenset(),
) -> dict[str, list[str]]:
    """Delete ``epoch=*`` directories not in ``live_epochs`` (nor in
    ``protect_epochs`` — the retention window's time-travel targets)
    under each sub-table; returns {subdir: [removed, ...]}."""
    fs = fs or LocalFS()
    live = {f"epoch={e}" for e in [*live_epochs, *protect_epochs]}
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
