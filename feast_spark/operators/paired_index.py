"""Cross-index corpus alignment for the hybrid retrieval pair.

``hybrid_index_topk`` (operators/bm25.py) fuses a persisted BM25 index
with a persisted vector index (IVF/IVFPQ) by reciprocal-rank fusion.
The two indexes are committed by INDEPENDENT atomic manifest flips, so
a crash — or a plain operator mistake — between the paired appends
leaves the lexical channel seeing documents the vector channel doesn't
(or vice versa), and RRF silently fuses over mismatched corpora.  The
reference enforces the same "two stores must agree on the slice"
contract between its offline and online stores
(sdk/python/tests/test_offline_online_store_consistency.py); this
module is that discipline for the index pair.

Mechanism — a shared CORPUS-EPOCH token:

* :func:`hybrid_index_append` appends one document slice to BOTH
  indexes, stamping each manifest with the same ``corpus_epoch``
  token in the SAME atomic flip that publishes that index's epoch
  directory.  The flips stay independent — a crash between them
  leaves the committed tokens UNEQUAL, which is exactly the
  detection signal (no two-phase commit needed: detection + loud
  failure is the contract, matching the epoch protocol's
  reader-resolves-the-manifest model).
* :func:`check_corpus_alignment` compares the committed tokens; the
  hybrid query paths call it per query (two tiny manifest reads —
  the manifest is the freshness authority and is deliberately never
  cached, ``io/model_cache.py``) and fail or warn on mismatch,
  flag-controlled.  Indexes that never went through a paired append
  carry no token and are exempt (backward compatible: alignment is
  opt-in by using the paired verbs).
* A crashed pair is repaired by re-running :func:`hybrid_index_append`
  with the SAME slice and ``resume=True``: the token arithmetic
  (leader exactly one token ahead) identifies the lagging side and
  appends the slice only there, under the leader's token.  ``resume``
  is explicit on purpose — a fresh append observing diverged tokens
  raises instead of guessing, because silently skipping the leader
  with a DIFFERENT slice would desynchronize both corpora while
  EQUALIZING the tokens (the one failure mode worse than a crash).

The streaming shape (one micro-batch into both indexes, exactly-once
under at-least-once redelivery) is ``hybrid_index_sink`` in
``streaming/index_sink.py``, which composes these stamps with the
per-index ``stream_epoch`` watermark.

Scale: everything here is O(1) driver-side manifest work on top of the
appends themselves — no new Spark jobs, no new shuffles; the per-query
validation cost is one extra small JSON read per channel (the BM25
read is shared with the query's own manifest resolution on object
stores that cache GETs, and is microseconds on local/HDFS).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession

from feast_spark.io import epochs as epochs_io
from feast_spark.io.fs import LocalFS, StoreFS

__all__ = [
    "CORPUS_EPOCH_KEY",
    "corpus_epoch",
    "check_corpus_alignment",
    "ensure_meta",
    "hybrid_index_append",
    "restamp_pair",
]

CORPUS_EPOCH_KEY = "corpus_epoch"


def corpus_epoch(
    path: str, fs: StoreFS | None = None, as_of: int | str | None = None
) -> int | None:
    """The committed corpus-epoch token of the index at ``path``, or
    ``None`` for an index that never went through a paired append.
    ``as_of`` reads the token the archived commit carried — the pair
    alignment a TIME-TRAVEL query must validate is the alignment of
    the two historical manifests it reads, not head's."""
    fs = fs or LocalFS()
    manifest = epochs_io.read_manifest(path, fs, as_of_seq=as_of)
    tok = manifest.get(CORPUS_EPOCH_KEY)
    return int(tok) if tok is not None else None


def ensure_meta(path: str, fs: StoreFS, meta: dict) -> None:
    """Make sure the committed manifest carries ``meta`` — a
    manifest-only atomic flip when an append NO-OPED (an EMPTY slice:
    appends skip their epoch for zero input rows, but the pair token
    must still advance on both sides or the pair would read as
    diverged even though the corpora agree).  Non-empty slices always
    commit an epoch — even all-stopword/all-blank ones, whose postings
    are empty but whose doc counts belong in the stats table — so this
    stamp is a no-op for them."""
    manifest = epochs_io.read_manifest(path, fs)
    if any(manifest.get(k) != v for k, v in meta.items()):
        epochs_io.commit_manifest(path, fs, {**manifest, **meta})


def check_corpus_alignment(
    bm25_path: str,
    vec_index_path: str,
    fs: StoreFS | None = None,
    on_mismatch: str = "fail",
    as_of: tuple[int | str, int | str] | None = None,
) -> dict:
    """Compare the pair's committed corpus-epoch tokens.

    Returns ``{"bm25": tok|None, "vector": tok|None, "aligned": bool}``.
    ``aligned`` is False only when BOTH indexes carry a token and they
    differ — that is the half-applied-pair signature.  ``on_mismatch``:
    ``"fail"`` raises ValueError (serving default: wrong fused results
    are worse than no results), ``"warn"`` emits a UserWarning and
    lets the query proceed (degraded-mode serving), ``"ignore"``
    checks nothing.  ``as_of=(bm25_seq, vec_seq)`` validates the two
    ARCHIVED manifests a time-travel query reads — a historical pair
    is aligned iff those manifests' tokens agree, regardless of what
    head looks like now."""
    if on_mismatch not in ("fail", "warn", "ignore"):
        raise ValueError(
            "on_mismatch must be 'fail', 'warn' or 'ignore', "
            f"got {on_mismatch!r}"
        )
    if on_mismatch == "ignore":
        return {"bm25": None, "vector": None, "aligned": True}
    fs = fs or LocalFS()
    tb = corpus_epoch(bm25_path, fs, as_of=as_of[0] if as_of else None)
    tv = corpus_epoch(
        vec_index_path, fs, as_of=as_of[1] if as_of else None
    )
    aligned = tb is None or tv is None or tb == tv
    if not aligned:
        msg = (
            f"hybrid index pair is corpus-misaligned: BM25 index at "
            f"{bm25_path} committed corpus_epoch={tb} but vector index "
            f"at {vec_index_path} committed corpus_epoch={tv} — a paired "
            "append crashed between the two commits, so one channel "
            "serves documents the other doesn't.  Re-run "
            "hybrid_index_append with the SAME document slice and "
            "resume=True to catch the lagging side up."
        )
        if on_mismatch == "fail":
            raise ValueError(msg)
        warnings.warn(msg, UserWarning, stacklevel=2)
    return {"bm25": tb, "vector": tv, "aligned": aligned}


def restamp_pair(
    bm25_path: str,
    vec_index_path: str,
    fs: StoreFS | None = None,
    attest_same_corpus: bool = False,
) -> int:
    """Close the alignment-exemption window a REBUILD opens.

    Rebuilding one side of a stamped pair from the full corpus drops
    its ``corpus_epoch`` (by the carried-meta allowlist — correct: a
    rebuild is a new index over whatever corpus the caller passed).
    Until the next paired append re-stamps it, the pair is EXEMPT from
    alignment checks — a detection window where a later crash could go
    unnoticed (``doctor --pair --strict`` exits 3 on exactly this
    state).  When the caller can attest the rebuilt side was rebuilt
    from the PAIR'S corpus — the blessed maintenance runbook, e.g. a
    BM25 rebuild applying the advisor's ``stopwords=`` over the same
    documents — this verb copies the surviving side's token onto the
    unstamped side, restoring the check immediately.

    ``attest_same_corpus=True`` is REQUIRED: the stamp is a statement
    about corpus identity that only the caller can make, and making it
    explicit keeps an automated pipeline from restamping a pair whose
    rebuilt side actually serves a different corpus (which would turn
    the alignment check into a false negative — worse than the window).

    Refuses (raises ValueError) when: neither side is stamped (nothing
    to carry — initialize via a paired append), both sides are stamped
    and DIVERGED (that is a crashed append: repair with
    ``hybrid_index_append(..., resume=True)``), or the attestation is
    missing.  Both sides stamped and aligned is an idempotent no-op.
    Returns the token the pair carries afterwards."""
    if not attest_same_corpus:
        raise ValueError(
            "restamp_pair requires attest_same_corpus=True — the caller "
            "must attest the rebuilt side was rebuilt from the pair's "
            "corpus; restamping a different corpus would silence the "
            "alignment check exactly when it matters"
        )
    fs = fs or LocalFS()
    tb = corpus_epoch(bm25_path, fs)
    tv = corpus_epoch(vec_index_path, fs)
    if tb is None and tv is None:
        raise ValueError(
            "neither side of the pair carries a corpus_epoch stamp — "
            "nothing to carry forward; initialize the pair with "
            "hybrid_index_append instead"
        )
    if tb is not None and tv is not None:
        if tb != tv:
            raise ValueError(
                f"pair is diverged (bm25 corpus_epoch={tb}, vector "
                f"corpus_epoch={tv}) — that is a crashed paired append, "
                "not a rebuild window; repair with hybrid_index_append("
                "..., resume=True) and the ORIGINAL slice"
            )
        return tb  # already aligned: idempotent no-op
    token = tb if tb is not None else tv
    meta = {CORPUS_EPOCH_KEY: token}
    if tb is None:
        ensure_meta(bm25_path, fs, meta)
    else:
        ensure_meta(vec_index_path, fs, meta)
    return token


def hybrid_index_append(
    spark: SparkSession,
    bm25_path: str,
    vec_index_path: str,
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs: StoreFS | None = None,
    resume: bool = False,
) -> int:
    """Append one document slice to BOTH halves of a hybrid retrieval
    pair, stamping each manifest with a shared ``corpus_epoch`` token.

    ``docs`` feeds the BM25 index (must carry its manifest's id/text
    columns); ``embeddings`` feeds the vector index (``id_col`` /
    ``vec_col``) and defaults to ``docs`` itself when the slice carries
    both text and embedding columns.  The vector side dispatches on
    the committed kind stamp (IVF or IVFPQ) via
    ``vector_index.vector_index_append``.  Returns the token both
    manifests carry afterwards.

    Crash contract: both manifests are first INITIALIZED with the
    current token (a manifest-only flip, first paired append only — an
    unstamped side would otherwise be exempt from the alignment check
    and a first-append crash would go undetected), then the BM25 side
    commits, then the vector side.  A crash between the two commits
    leaves tokens diverged by exactly one; hybrid queries then FAIL
    LOUDLY (``check_corpus_alignment``) instead of fusing mismatched
    corpora.  To repair, re-run with the SAME slice and
    ``resume=True`` — only the lagging side is appended, under the
    leader's token.  A fresh (``resume=False``) append over diverged
    tokens raises: appending a NEW slice to only the lagging side
    would equalize the tokens while desynchronizing both corpora.
    ``resume=True`` over an ALIGNED pair also raises rather than
    guessing — aligned tokens mean either the crashed attempt
    committed neither side (re-run fresh) or a retry raced a completed
    pair (nothing to do), and silently picking one could lose or
    double-append the slice.  Doc-id uniqueness per index across
    appends remains the caller's contract, which is why ``resume``
    must replay the ORIGINAL slice.

    Single writer per pair (the epoch protocol's contract per index,
    lifted to the pair).  For the streaming shape use
    ``streaming.index_sink.hybrid_index_sink``, which keys the same
    stamps on the stream's exactly-once batch watermark and therefore
    repairs replays automatically."""
    from feast_spark.operators.bm25 import bm25_index_append
    from feast_spark.operators.vector_index import vector_index_append

    fs = fs or LocalFS()
    if embeddings is None:
        embeddings = docs
    tb = corpus_epoch(bm25_path, fs)
    tv = corpus_epoch(vec_index_path, fs)
    nb = -1 if tb is None else tb
    nv = -1 if tv is None else tv
    if not resume:
        if tb is not None and tv is not None and tb != tv:
            raise ValueError(
                f"cannot append a fresh slice to a diverged pair "
                f"(bm25 corpus_epoch={tb}, vector corpus_epoch={tv}): "
                "repair first by re-running with the ORIGINAL slice "
                "and resume=True"
            )
        # an unstamped side (first paired append, or one side was just
        # REBUILT — rebuilds drop the token by the carried-meta
        # allowlist) adopts the pair's current token: stamp both sides
        # BEFORE touching either, so a crash after the first commit is
        # detectable (an unstamped side is exempt from the check)
        base = max(nb, nv)
        if tb is None:
            ensure_meta(bm25_path, fs, {CORPUS_EPOCH_KEY: base})
        if tv is None:
            ensure_meta(vec_index_path, fs, {CORPUS_EPOCH_KEY: base})
        token = base + 1
        append_bm25, append_vec = True, True
    else:
        if tb is None or tv is None:
            # an unstamped side is UNKNOWN, not "one behind": e.g. a
            # side rebuilt from the full corpus (rebuild drops the
            # token) already CONTAINS the slice — resuming onto it
            # would double-append.  A fresh append re-initializes an
            # unstamped side safely; resume refuses to guess.
            raise ValueError(
                f"resume=True needs BOTH sides stamped (bm25 "
                f"corpus_epoch={tb}, vector corpus_epoch={tv}): an "
                "unstamped side's contents are unknown — if it was "
                "rebuilt from the full corpus, append the NEXT slice "
                "fresh instead"
            )
        if abs(nb - nv) > 1:
            raise ValueError(
                f"pair diverged by more than one paired append "
                f"(bm25 corpus_epoch={tb}, vector corpus_epoch={tv}) — "
                "out of the single-writer contract; rebuild both "
                "indexes from the corpus"
            )
        if nb == nv:
            raise ValueError(
                f"resume=True on an aligned pair (corpus_epoch={tb} on "
                "both sides): either the crashed attempt committed "
                "neither side (re-run WITHOUT resume) or it completed "
                "(nothing to repair) — refusing to guess between "
                "losing and double-appending the slice"
            )
        token = max(nb, nv)
        append_bm25 = nb < token
        append_vec = nv < token
    meta = {CORPUS_EPOCH_KEY: token}
    if append_bm25:
        bm25_index_append(spark, bm25_path, docs, fs=fs, meta=meta)
        ensure_meta(bm25_path, fs, meta)  # no-op append still stamps
    if append_vec:
        vector_index_append(
            spark, vec_index_path, embeddings,
            id_col=id_col, vec_col=vec_col, fs=fs, meta=meta,
        )
        ensure_meta(vec_index_path, fs, meta)
    return token
