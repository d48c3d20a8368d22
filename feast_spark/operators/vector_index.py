"""Kind-dispatching facade over the persisted vector indexes.

Two persisted ANN layouts exist — IVF (float vectors per cell,
``operators/similarity.py``) and IVFPQ (PQ codes per cell,
``operators/pq_index.py``) — and both stamp their manifest with a
``kind`` (``io/epochs.py``).  A caller holding only a path should not
have to carry index-kind knowledge the store already has: this facade
reads the committed stamp and dispatches.

Reference parity: Feast has no ANN; training-data-pipeline extension
(SURVEY §2.6) — the single entry point over the two index families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from feast_spark.io import epochs as epochs_io
from feast_spark.io.fs import LocalFS, StoreFS

__all__ = [
    "vector_index_kind",
    "vector_index_dim",
    "vector_index_topk",
    "vector_index_append",
]

_VECTOR_KINDS = ("ivf", "ivfpq")


def vector_index_kind(
    path: str, fs: StoreFS | None = None, as_of: int | str | None = None
) -> str:
    """The committed manifest's vector-index kind: ``"ivf"`` or
    ``"ivfpq"``.  Manifests predating the kind stamp are IVF (the only
    vector layout that ever wrote stampless manifests); a committed
    NON-vector index (bm25/minhash) raises rather than mis-serving.
    ``as_of`` resolves the archived commit's stamp — time travel
    across a kind-rebuild dispatches to the kind that served THEN."""
    fs = fs or LocalFS()
    manifest = epochs_io.read_manifest(
        path, fs, required_keys=("epochs",), kind="vector index",
        as_of_seq=as_of,
    )
    kind = manifest.get("kind", "ivf")
    if kind not in _VECTOR_KINDS:
        raise ValueError(
            f"no vector index committed at {path}: the committed manifest "
            f"is a {kind!r} index"
        )
    return kind


def vector_index_dim(
    path: str, fs: StoreFS | None = None, kind: str | None = None,
    as_of: int | str | None = None,
) -> int:
    """Embedding dimensionality of the committed index at ``path``,
    read from its quantizer's centroid table (driver-side, through the
    model-cache-backed loaders — no Spark job).  Serving edges use it
    to reject a wrong-length query vector BEFORE it reaches a fused
    batch call, where the failure would take every concurrent request
    down with it (serving.VectorQueryCoalescer / HybridQueryCoalescer).
    Pass ``kind`` when already resolved to skip one manifest read.
    ``as_of`` resolves the ARCHIVED commit's quantizer — a pinned
    serving tier validates against the model it actually serves."""
    fs = fs or LocalFS()
    kind = kind or vector_index_kind(path, fs, as_of=as_of)
    if kind == "ivfpq":
        from feast_spark.operators.pq_index import _load_centroids, _manifest

        return len(
            _load_centroids(path, _manifest(path, fs, as_of=as_of), fs)[0]
        )
    from feast_spark.operators.similarity import _ivf_load_centroids, _ivf_manifest

    return len(
        _ivf_load_centroids(
            None, path, fs, manifest=_ivf_manifest(path, fs, as_of=as_of)
        )[0]
    )


def vector_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    k: int = 10,
    fs: StoreFS | None = None,
    as_of: int | str | None = None,
) -> DataFrame:
    """Top-k ANN against whatever vector index is committed at
    ``path``, dispatching on the manifest's kind stamp.  ``as_of``
    time-travels: dispatch AND the underlying read both resolve the
    archived commit (a kind-rebuild inside the window serves the kind
    that served then).

    The result carries the kind's native score column — (query_id,
    neighbor_id, cos, rank) from IVF (cosine, self excluded), (query_id,
    neighbor_id, adc_dist) ascending from IVFPQ (asymmetric L2, self
    included — PQ codes cannot know the query's identity).  Consumers
    that only need ranked neighbor ids (RRF fusion, candidate
    generation) are agnostic; consumers comparing scores across kinds
    have a modeling problem no facade should paper over."""
    kind = vector_index_kind(path, fs, as_of=as_of)
    if kind == "ivfpq":
        from feast_spark.operators.pq_index import ivfpq_index_topk

        return ivfpq_index_topk(
            spark, path, queries, id_col=id_col, vec_col=vec_col,
            n_probe=n_probe, k=k, fs=fs or LocalFS(), as_of=as_of,
        )
    from feast_spark.operators.similarity import ivf_index_topk

    return ivf_index_topk(
        spark, path, queries, id_col=id_col, vec_col=vec_col,
        n_probe=n_probe, k=k, fs=fs, as_of=as_of,
    )


def vector_index_append(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs: StoreFS | None = None,
    meta: dict | None = None,
) -> None:
    """Append vectors to whatever vector index is committed at
    ``path``, dispatching on the manifest's kind stamp — the write-side
    sibling of :func:`vector_index_topk` (same frozen-model append
    semantics either way: ``similarity.ivf_index_append`` /
    ``pq_index.ivfpq_index_append``).  ``meta`` merges into the
    manifest in the same atomic flip (stream watermarks, the paired
    ``corpus_epoch`` stamp)."""
    kind = vector_index_kind(path, fs)
    if kind == "ivfpq":
        from feast_spark.operators.pq_index import ivfpq_index_append

        ivfpq_index_append(
            spark, path, new_vectors, id_col=id_col, vec_col=vec_col,
            fs=fs or LocalFS(), meta=meta,
        )
        return
    from feast_spark.operators.similarity import ivf_index_append

    ivf_index_append(
        spark, path, new_vectors, id_col=id_col, vec_col=vec_col,
        fs=fs, meta=meta,
    )
