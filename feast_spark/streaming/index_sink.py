"""Streaming ingestion into the persisted retrieval/dedup indexes —
``writeStream.foreachBatch`` sinks that fold each micro-batch into the
BM25 lexical index or the minhash near-dup index as one epoch append.

The crawl pipeline shape this serves: documents arrive continuously;
the lexical index and the dedup index must track the corpus without
ever re-tokenizing or re-signing it.  Each micro-batch is exactly the
"new slice" the epoch-append protocol was built for — one pass over
the batch, one atomic manifest flip.

Exactly-once: foreachBatch is at-least-once (a crashed trigger is
re-delivered after restart), and an index append is NOT idempotent
(replaying a batch would duplicate its postings/bands).  The sink
therefore records the last applied streaming epoch id in the manifest
— written in the SAME atomic flip that publishes the epoch directory
(the ``SketchTable.foreach_batch_writer`` discipline) — and skips any
epoch id at or below the watermark.  A crash between the epoch-dir
write and the flip leaves an invisible orphan (numbering skips it,
``*_index_vacuum`` deletes it) and the replay re-appends cleanly.

Manual appends/compactions may interleave with the stream: they carry
the existing manifest keys forward (``io/manifest``-style meta merge),
so the watermark survives non-streaming commits.  Single writer at a
time, like every epoch index — run ONE stream per index and pause it
around manual maintenance.

Dedup-then-append composition: to keep only novel documents, call
``dedup_against_index`` inside your own foreachBatch before the
append — both steps see the same committed manifest, and the append
publishes after the dedup read, so a batch never dedups against
itself.

CHECKPOINT-RESET TRAP: the watermark is keyed on Spark's per-
checkpoint batch ids.  Deleting or re-pointing ``checkpointLocation``
restarts ids at 0, and every batch up to the stored watermark would be
silently skipped as a replay.  One checkpoint per index, for the life
of the index; if you must re-point a stream, call
``clear_stream_watermark(path)`` first (single-writer, stream
stopped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "bm25_index_sink",
    "minhash_index_sink",
    "ivf_index_sink",
    "ivfpq_index_sink",
    "hybrid_index_sink",
    "clear_stream_watermark",
]

_WATERMARK_KEY = "stream_epoch"


def _should_skip(manifest: dict, epoch_id: int) -> bool:
    last = manifest.get(_WATERMARK_KEY)
    return last is not None and epoch_id <= last


def bm25_index_sink(spark: SparkSession, path: str, fs=None):
    """foreachBatch sink folding each micro-batch of documents into a
    persisted BM25 index (``build_bm25_index`` must have committed it;
    batch columns must include the index's id/text columns)."""
    from feast_spark.operators.bm25 import _bm25_manifest, bm25_index_append
    from feast_spark.io.fs import LocalFS

    fs = fs or LocalFS()

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if _should_skip(_bm25_manifest(path, fs), epoch_id):
            return  # at-least-once replay of an applied epoch
        bm25_index_append(
            spark, path, batch_df, fs=fs, meta={_WATERMARK_KEY: epoch_id}
        )

    return fn


def minhash_index_sink(spark: SparkSession, path: str, fs=None):
    """foreachBatch sink folding each micro-batch of documents into a
    persisted minhash near-dup index (``build_minhash_index`` must
    have committed it)."""
    from feast_spark.operators.minhash_index import (
        _manifest,
        minhash_index_append,
    )
    from feast_spark.io.fs import LocalFS

    fs = fs or LocalFS()

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if _should_skip(_manifest(path, fs), epoch_id):
            return
        minhash_index_append(
            spark, path, batch_df, fs=fs, meta={_WATERMARK_KEY: epoch_id}
        )

    return fn


def ivf_index_sink(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
):
    """foreachBatch sink folding each micro-batch of embedding vectors
    into a persisted IVF ANN index (``build_ivf_index`` must have
    committed it; the frozen quantizer assigns cells — watch
    ``ivf_index_stats`` for drift and rebuild when cells skew)."""
    from feast_spark.operators.similarity import (
        _ivf_manifest,
        ivf_index_append,
    )
    from feast_spark.io.fs import LocalFS

    fs = fs or LocalFS()

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if _should_skip(_ivf_manifest(path, fs), epoch_id):
            return
        ivf_index_append(
            spark,
            path,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            fs=fs,
            meta={_WATERMARK_KEY: epoch_id},
        )

    return fn


def ivfpq_index_sink(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
):
    """foreachBatch sink folding each micro-batch of embedding vectors
    into a persisted IVFPQ index (``build_ivfpq_index`` must have
    committed it; the frozen quantizer + codebooks encode new vectors
    — watch ``ivfpq_index_stats`` for drift and rebuild when cells
    skew)."""
    from feast_spark.io.fs import LocalFS
    from feast_spark.operators.pq_index import _manifest, ivfpq_index_append

    fs = fs or LocalFS()

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if _should_skip(_manifest(path, fs), epoch_id):
            return
        ivfpq_index_append(
            spark,
            path,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            fs=fs,
            meta={_WATERMARK_KEY: epoch_id},
        )

    return fn


def hybrid_index_sink(
    spark: SparkSession,
    bm25_path: str,
    vec_index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
):
    """foreachBatch sink folding each micro-batch into BOTH halves of a
    hybrid retrieval pair — the BM25 lexical index and the vector index
    (IVF/IVFPQ, kind-dispatched) — under ONE shared ``corpus_epoch``
    token per batch (``operators/paired_index.py``), so
    ``hybrid_index_topk``'s alignment check holds across the stream.

    Exactly-once per SIDE: each index keeps its own ``stream_epoch``
    watermark, so an at-least-once redelivery after a crash BETWEEN
    the two appends re-applies only the side that missed the batch —
    the pair converges to the same token instead of double-appending
    the leader.  The lagging side adopts the leader's committed token
    (the leader's manifest carries this batch's token precisely
    because its watermark says the batch applied).  Batch columns must
    include the BM25 manifest's id/text columns AND
    ``id_col``/``vec_col``; both indexes must be built before the
    stream starts, share one checkpoint, and have a single writer
    (the per-index sink contracts, lifted to the pair).

    A batch id BELOW one side's watermark while the other side hasn't
    applied it means the pair diverged by more than the one in-flight
    batch — impossible under one stream + one checkpoint — and raises
    rather than guessing which token that historic slice carried."""
    from feast_spark.io.fs import LocalFS
    from feast_spark.operators.paired_index import CORPUS_EPOCH_KEY

    fs = fs or LocalFS()

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        # imported per batch (cheap module-attr lookups) so the append
        # verbs resolve at CALL time — matching the single-index sinks'
        # behavior under test fault injection and hot code reload
        from feast_spark.io import epochs as epochs_io
        from feast_spark.operators.bm25 import (
            _bm25_manifest,
            bm25_index_append,
        )
        from feast_spark.operators.paired_index import ensure_meta
        from feast_spark.operators.vector_index import vector_index_append

        mb = _bm25_manifest(bm25_path, fs)
        mv = epochs_io.read_manifest(vec_index_path, fs)
        skip_b = _should_skip(mb, epoch_id)
        skip_v = _should_skip(mv, epoch_id)
        if skip_b and skip_v:
            return  # replay of a fully applied pair
        for skipped, leader_m, name in (
            (skip_b, mb, "bm25"), (skip_v, mv, "vector"),
        ):
            # the leader's committed token is THIS batch's token only
            # when this batch is the leader's LATEST (the one in-flight
            # batch a crash can leave half-applied); a strictly higher
            # leader watermark means the lagging side missed more than
            # one batch, whose tokens are no longer recoverable
            if skipped and leader_m.get(_WATERMARK_KEY, -1) > epoch_id:
                raise ValueError(
                    f"hybrid sink: the {name} index applied batch "
                    f"{epoch_id} and more beyond it (watermark "
                    f"{leader_m[_WATERMARK_KEY]}) while its pair did not — "
                    "more than one in-flight batch diverged, which one "
                    "stream over one checkpoint cannot produce; rebuild "
                    "the pair from the corpus"
                )
        leader = mb if skip_b else (mv if skip_v else None)
        if leader is not None and leader.get(CORPUS_EPOCH_KEY) is not None:
            token = int(leader[CORPUS_EPOCH_KEY])
        else:
            # fresh pair batch — or a leader that predates the co-sink
            # (migrated from the single sinks, no token yet): mint past
            # both committed tokens
            token = max(
                int(mb.get(CORPUS_EPOCH_KEY, -1)),
                int(mv.get(CORPUS_EPOCH_KEY, -1)),
            ) + 1
        meta = {_WATERMARK_KEY: epoch_id, CORPUS_EPOCH_KEY: token}
        if not skip_b:
            bm25_index_append(spark, bm25_path, batch_df, fs=fs, meta=meta)
            # an all-blank batch no-ops the append; the stamp must
            # still advance or the pair reads as diverged
            ensure_meta(bm25_path, fs, meta)
        if not skip_v:
            vector_index_append(
                spark, vec_index_path, batch_df,
                id_col=id_col, vec_col=vec_col, fs=fs, meta=meta,
            )
            ensure_meta(vec_index_path, fs, meta)

    return fn


def clear_stream_watermark(path: str, fs=None) -> None:
    """Remove the streaming epoch watermark from an index manifest —
    REQUIRED before re-pointing a stream at a fresh checkpoint (batch
    ids restart at 0 and would otherwise be skipped as replays; see
    the module docstring).  Run with the stream stopped, from the
    single writer; the rewrite is one atomic manifest flip."""
    from feast_spark.io import epochs as epochs_io
    from feast_spark.io.fs import LocalFS

    fs = fs or LocalFS()
    manifest = epochs_io.read_manifest(path, fs)
    if _WATERMARK_KEY in manifest:
        manifest = {
            k: v for k, v in manifest.items() if k != _WATERMARK_KEY
        }
        epochs_io.commit_manifest(path, fs, manifest)
