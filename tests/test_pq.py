"""Product quantization: encode compression, training determinism,
ADC top-k recall against exact cosine/L2, and the partition-local
top-k candidate bound."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.pq import pq_encode, pq_topk, pq_train


def _vectors(n=400, d=16, seed=5):
    """Deterministic vectors along a smooth manifold (sinusoid per
    dim + small LCG noise): vector i's nearest neighbors are i±1, i±2,
    ... with GRADED distances — rankable under quantization, unlike
    tight equidistant clusters."""
    vals = np.empty(n * d)
    x = seed
    for i in range(n * d):
        x = (1103515245 * x + 12345) % (1 << 31)
        vals[i] = x / (1 << 31)
    noise = vals.reshape(n, d) * 0.02
    t = np.arange(n)[:, None] * 0.04 + np.arange(d)[None, :] * 0.9
    return np.sin(t) + noise


@pytest.fixture(scope="module")
def corpus(spark):
    X = _vectors()
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in row])
         for i, row in enumerate(X)]
    ).cache()


@pytest.fixture(scope="module")
def books(corpus):
    return pq_train(corpus, m_subspaces=4, k_codes=32, iters=5)


def test_train_deterministic(corpus, books):
    again = pq_train(corpus, m_subspaces=4, k_codes=32, iters=5)
    assert books == again


def test_encode_shape_and_compression(corpus, books):
    out = pq_encode(corpus, books).collect()
    assert all(len(r["pq_codes"]) == 4 for r in out)  # 16 floats -> 4 codes
    assert all(0 <= c < 32 for r in out for c in r["pq_codes"])
    # same vector always encodes identically
    again = {r["vec_id"]: r["pq_codes"] for r in pq_encode(corpus, books).collect()}
    for r in out:
        assert again[r["vec_id"]] == r["pq_codes"]


def test_adc_candidates_cover_exact_topk(spark, corpus, books):
    """The standard PQ acceptance: the exact top-10 must sit inside a
    modest ADC candidate set (top-40 of 400).  PQ ties vectors sharing
    codes — it finds the neighborhood; exact ranking inside it is the
    re-rank stage's job (done on the fetched candidates in practice)."""
    X = _vectors()
    queries = corpus.where(F.col("vec_id") < 5)
    codes = pq_encode(corpus, books)
    got = pq_topk(codes, queries, books, k=40).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, neighbors in by_q.items():
        assert len(neighbors) == 40
        d2 = ((X - X[qid]) ** 2).sum(1)
        exact = set(np.argsort(d2, kind="stable")[:10].tolist())
        recall = len(exact & set(neighbors)) / 10
        assert recall >= 0.8, f"query {qid} candidate recall {recall}"


def test_adc_distances_track_exact_coarsely(corpus, books):
    """ADC ordering tracks exact distances at the neighborhood level:
    the first half of the ADC ranking is genuinely closer on average
    than the second half."""
    X = _vectors()
    queries = corpus.where(F.col("vec_id") == 0)
    codes = pq_encode(corpus, books)
    got = sorted(
        pq_topk(codes, queries, books, k=100).collect(),
        key=lambda r: r["adc_dist"],
    )
    exact = [((X[r["neighbor_id"]] - X[0]) ** 2).sum() for r in got]
    half = len(exact) // 2
    assert np.mean(exact[:half]) < np.mean(exact[half:])


def test_dim_mismatch_raises(spark, corpus, books):
    bad_q = spark.createDataFrame([Row(vec_id=0, embedding=[0.0] * 8)])
    codes = pq_encode(corpus, books)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(codes, bad_q, books)


def test_train_rejects_indivisible_dims(corpus):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(corpus, m_subspaces=5)


def test_reranked_matches_exact_topk(spark, corpus, books):
    """ADC recall + exact cosine re-rank recovers the exact cosine
    top-k (the production two-stage shape)."""
    from feast_spark.operators.pq import pq_topk_reranked
    from feast_spark.operators.similarity import cosine_topk

    queries = corpus.where(F.col("vec_id") < 3)
    codes = pq_encode(corpus, books)
    got = pq_topk_reranked(
        corpus, codes, queries, books, k=5, candidates_per_query=60
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    exact = cosine_topk(corpus, queries, k=6).collect()  # k+1: incl. self
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qid in (0, 1, 2):
        # cosine_topk excludes self; reranked includes it — align on
        # the top-5 of (self + exact list)
        want = ([qid] + exact_by_q[qid])[:5]
        assert set(by_q[qid]) == set(want), f"query {qid}"


def test_ivfpq_matches_pq_within_probed_cells(spark, corpus, books):
    """IVF+PQ returns the same neighbors plain PQ-ADC would find when
    restricted to the query's probed cells — pruning without silent
    result corruption; with all cells probed it equals plain pq_topk."""
    from feast_spark.operators.pq import ivfpq_topk
    from feast_spark.operators.similarity import assign_nearest, md5_centroids

    X = _vectors()
    cents = md5_centroids(corpus, n_centroids=8, vec_col="embedding",
                          id_col="vec_id")
    cells = assign_nearest(
        corpus,
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cell int, centroid array<double>",
        ),
        id_col="vec_id",
        vec_col="embedding",
    )
    codes = pq_encode(corpus, books).join(cells.select("vec_id", "cell"),
                                          "vec_id")
    queries = corpus.where(F.col("vec_id") < 3)

    # full probe == plain PQ (ordering by ADC distance then id)
    full = ivfpq_topk(codes, queries, cents, books, k=5, n_probe=8)
    plain = pq_topk(codes.select("vec_id", "pq_codes"), queries, books, k=5)
    key = lambda r: (r["query_id"], round(r["adc_dist"], 9))  # noqa: E731
    assert sorted(map(key, full.collect())) == sorted(map(key, plain.collect()))

    # partial probe: every neighbor must come from a probed cell
    part = ivfpq_topk(codes, queries, cents, books, k=5, n_probe=2)
    from feast_spark.operators.similarity import probe_cells as _pc

    probed = {
        r["vec_id"]: set(r["cells"])
        for r in queries.select(
            "vec_id", _pc(F.col("embedding"), cents, 2).alias("cells")
        ).collect()
    }
    cell_of = {r["vec_id"]: r["cell"] for r in cells.collect()}
    rows = part.collect()
    assert len(rows) > 0
    for r in rows:
        assert cell_of[r["neighbor_id"]] in probed[r["query_id"]]


def test_codebook_save_load_roundtrip(books, corpus, tmp_path):
    from feast_spark.operators.pq import load_codebooks, save_codebooks

    path = str(tmp_path / "pq.json")
    save_codebooks(books, path)
    loaded = load_codebooks(path)
    assert loaded == books
    a = {r["vec_id"]: r["pq_codes"] for r in pq_encode(corpus, books).collect()}
    b = {r["vec_id"]: r["pq_codes"] for r in pq_encode(corpus, loaded).collect()}
    assert a == b


def test_cell_partitioned_index_partition_prunes(spark, corpus, books, tmp_path):
    """Persisting the PQ index partitioned by cell turns the probed-
    cell filter into PARTITION pruning: the scan's partition filters
    carry the isin, so unprobed cells are never read at all — the
    100 TB posture of the IVFPQ layout."""
    from feast_spark.operators.similarity import assign_nearest, md5_centroids
    from feast_spark.plans import explain_formatted

    cents = md5_centroids(corpus, n_centroids=8, vec_col="embedding",
                          id_col="vec_id")
    cells = assign_nearest(
        corpus,
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cell int, centroid array<double>",
        ),
        id_col="vec_id",
        vec_col="embedding",
    )
    codes = pq_encode(corpus, books).join(cells.select("vec_id", "cell"),
                                          "vec_id")
    path = str(tmp_path / "pq_index")
    codes.write.partitionBy("cell").parquet(path)

    index = spark.read.parquet(path)
    pruned = index.where(F.col("cell").isin([1, 3]))
    plan = explain_formatted(pruned)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]
    # and the pruned read really only returns those cells
    assert set(r["cell"] for r in pruned.select("cell").distinct().collect()) \
        <= {1, 3}
