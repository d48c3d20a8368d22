"""The kind-dispatching vector-index facade
(operators/vector_index.py) and the hybrid's auto kind resolution:
callers hold a path; the committed manifest's kind stamp decides
which serving implementation runs."""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.vector_index import (
    vector_index_kind,
    vector_index_topk,
)
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    from feast_spark.operators.bm25 import build_bm25_index
    from feast_spark.operators.pq_index import build_ivfpq_index
    from feast_spark.operators.similarity import build_ivf_index

    base = tmp_path_factory.mktemp("vecidx")
    emb = load_table(spark, SF_SMALL, "embeddings")
    docs = load_table(spark, SF_SMALL, "documents")
    paths = {
        "ivf": str(base / "ivf"),
        "ivfpq": str(base / "ivfpq"),
        "bm25": str(base / "bm25"),
    }
    build_ivf_index(emb, paths["ivf"], n_centroids=4, iters=1)
    build_ivfpq_index(
        emb, paths["ivfpq"], n_centroids=4, iters=1,
        m_subspaces=4, k_codes=8,
    )
    build_bm25_index(docs, paths["bm25"], "doc_id", "text", n_term_buckets=4)
    return paths, emb


def test_kind_reads_the_stamp(indexes):
    paths, _ = indexes
    assert vector_index_kind(paths["ivf"]) == "ivf"
    assert vector_index_kind(paths["ivfpq"]) == "ivfpq"


def test_non_vector_index_fails_loudly(indexes):
    paths, _ = indexes
    with pytest.raises(ValueError, match="bm25"):
        vector_index_kind(paths["bm25"])


def test_facade_matches_direct_calls(spark, indexes):
    from feast_spark.operators.pq_index import ivfpq_index_topk
    from feast_spark.operators.similarity import ivf_index_topk

    paths, emb = indexes
    q = emb.filter(F.col("vec_id") < 2)
    via_facade = vector_index_topk(
        spark, paths["ivf"], q, n_probe=2, k=5
    ).collect()
    direct = ivf_index_topk(spark, paths["ivf"], q, n_probe=2, k=5).collect()
    assert sorted(map(tuple, via_facade)) == sorted(map(tuple, direct))

    via_facade = vector_index_topk(
        spark, paths["ivfpq"], q, n_probe=2, k=5
    ).collect()
    direct = ivfpq_index_topk(
        spark, paths["ivfpq"], q, n_probe=2, k=5
    ).collect()
    assert sorted(map(tuple, via_facade)) == sorted(map(tuple, direct))


@pytest.mark.nightly
def test_hybrid_auto_dispatch_matches_explicit_kind(spark, indexes):
    from feast_spark.operators.bm25 import hybrid_index_topk

    paths, emb = indexes
    dim = len(emb.select("embedding").first()[0])
    qvec = [float((i * 37) % 19) / 19.0 for i in range(dim)]
    for kind in ("ivf", "ivfpq"):
        auto = hybrid_index_topk(
            spark, paths["bm25"], None, ["hash", "scan"], qvec,
            k=5, vec_index_path=paths[kind], n_probe=2,
        ).collect()
        explicit = hybrid_index_topk(
            spark, paths["bm25"], None, ["hash", "scan"], qvec,
            k=5, vec_index_path=paths[kind], n_probe=2,
            vec_index_kind=kind,
        ).collect()
        assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
    with pytest.raises(ValueError, match="vec_index_kind"):
        hybrid_index_topk(
            spark, paths["bm25"], None, ["hash"], qvec,
            k=5, vec_index_path=paths["ivf"], vec_index_kind="hnsw",
        )
