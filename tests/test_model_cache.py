"""The serving control-plane cache (io/model_cache.py): repeat queries
against an unchanged index skip the centroid/codebook/stats reads,
while every mutation through the write API — append, compact, rebuild
— flips the immutable pointer the cache keys on, so the next query
misses onto fresh artifacts.  No TTLs: staleness is structurally
impossible as long as artifacts are write-once, which the epoch
protocol guarantees."""

import pytest
from pyspark.sql import functions as F

from feast_spark.io import model_cache
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(autouse=True)
def _fresh_cache():
    model_cache.clear()
    yield
    model_cache.clear()


def test_get_or_load_caches_and_evicts():
    calls = []

    def loader(v):
        return lambda: calls.append(v) or v

    assert model_cache.get_or_load(("a",), loader(1)) == 1
    assert model_cache.get_or_load(("a",), loader(99)) == 1  # hit: no load
    assert calls == [1]
    st = model_cache.stats()
    assert st["hits"] == 1 and st["misses"] == 1
    # fill past capacity: the oldest entry is evicted and reloads
    for i in range(model_cache._MAX_ENTRIES):
        model_cache.get_or_load(("fill", i), loader(i))
    assert model_cache.get_or_load(("a",), loader(2)) == 2  # evicted -> reload
    assert model_cache.stats()["entries"] <= model_cache._MAX_ENTRIES


def test_ivf_serving_hits_cache_and_rebuild_misses(spark, tmp_path):
    from feast_spark.operators.similarity import build_ivf_index, ivf_index_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=4, iters=1)
    q = emb.filter(F.col("vec_id") < 2)

    first = ivf_index_topk(spark, path, q, n_probe=4, k=5).collect()
    misses_after_first = model_cache.stats()["misses"]
    second = ivf_index_topk(spark, path, q, n_probe=4, k=5).collect()
    st = model_cache.stats()
    assert st["misses"] == misses_after_first  # centroids served from cache
    assert st["hits"] >= 1
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))

    # REBUILD with a different quantizer: new generation dir -> new key
    # -> the cached centroids are never consulted for the new manifest
    build_ivf_index(emb.limit(200), path, n_centroids=2, iters=1)
    rebuilt = ivf_index_topk(spark, path, q, n_probe=2, k=5).collect()
    assert model_cache.stats()["misses"] > misses_after_first
    ids = {r["neighbor_id"] for r in rebuilt}
    assert ids <= {r["vec_id"] for r in emb.limit(200).collect()}


def test_bm25_append_flips_stats_key(spark, tmp_path):
    from feast_spark.operators.bm25 import (
        bm25_index_append,
        bm25_index_topk,
        build_bm25_index,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "bm25")
    build_bm25_index(
        docs.filter(F.col("doc_id") % 2 == 0), path, "doc_id", "text",
        n_term_buckets=4,
    )
    r1 = bm25_index_topk(spark, path, ["hash", "scan"], k=5).collect()
    misses_after_first = model_cache.stats()["misses"]
    r2 = bm25_index_topk(spark, path, ["hash", "scan"], k=5).collect()
    assert model_cache.stats()["misses"] == misses_after_first  # stats cached
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))

    # append flips the committed epoch list -> new stats key -> scores
    # now reflect the grown corpus (n_docs and idf change)
    bm25_index_append(spark, path, docs.filter(F.col("doc_id") % 2 == 1))
    r3 = bm25_index_topk(spark, path, ["hash", "scan"], k=5).collect()
    assert model_cache.stats()["misses"] > misses_after_first
    assert sorted(map(tuple, r3)) != sorted(map(tuple, r1))

    # and the appended-index scores equal a fresh single build's (the
    # cached path can't diverge from the uncached ground truth)
    fresh = str(tmp_path / "bm25_fresh")
    build_bm25_index(docs, fresh, "doc_id", "text", n_term_buckets=4)
    r_fresh = bm25_index_topk(spark, fresh, ["hash", "scan"], k=5).collect()
    assert sorted(map(tuple, r3)) == sorted(map(tuple, r_fresh))


def test_ivfpq_rebuild_flips_codebook_key(spark, tmp_path):
    from feast_spark.operators.pq import md5_codebooks
    from feast_spark.operators.pq_index import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )
    from feast_spark.operators.similarity import md5_centroids

    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivfpq")
    cents = md5_centroids(emb, n_centroids=4)
    books = md5_codebooks(emb, m_subspaces=4, k_codes=8)
    build_ivfpq_index(emb, path, centroids=cents, codebooks=books)
    q = emb.filter(F.col("vec_id") < 2)

    r1 = ivfpq_index_topk(spark, path, q, n_probe=4, k=5).collect()
    misses_after_first = model_cache.stats()["misses"]
    r2 = ivfpq_index_topk(spark, path, q, n_probe=4, k=5).collect()
    assert model_cache.stats()["misses"] == misses_after_first
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))

    # rebuild with DIFFERENT codebooks: gen pointer flips, the query
    # must rank by the new books' ADC (coarser books -> different dists)
    books2 = md5_codebooks(emb, m_subspaces=4, k_codes=2)
    build_ivfpq_index(emb, path, centroids=cents, codebooks=books2)
    r3 = ivfpq_index_topk(spark, path, q, n_probe=4, k=5).collect()
    assert model_cache.stats()["misses"] > misses_after_first
    d1 = {(r["query_id"], r["neighbor_id"]): r["adc_dist"] for r in r1}
    d3 = {(r["query_id"], r["neighbor_id"]): r["adc_dist"] for r in r3}
    assert d1 != d3
