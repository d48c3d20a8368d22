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


def test_ivfpq_exact_k_under_cell_skew(spark, books):
    """Adversarial skew: a huge unprobed cell sits ADC-closer to query A
    than anything in A's own probe cells.  A union-scored over-fetch
    heuristic would fill A's top-k' with big-cell rows and deliver <k
    (here: 0) survivors after masking; the in-kernel probe mask must
    return EXACTLY k rows per query, equal to plain PQ restricted to
    that query's probed cells."""
    from feast_spark.operators.pq import ivfpq_topk
    from feast_spark.operators.similarity import probe_cells as _pc

    d = 8

    def vec(x, y, i):
        # embed 2-D geometry in 8-D with tiny deterministic jitter so
        # rows are distinct (jitter << any inter-point distance)
        j = [((i * 2654435761 + dim * 40503) % 997) / 997 * 1e-3
             for dim in range(d - 2)]
        return [float(x), float(y)] + j

    cents = [vec(0, 0, 0), vec(4, 3, 1), vec(4, -3, 2), vec(20, 0, 3)]
    rows = []
    vid = 0
    # cell 0: 300-row hot cell clustered near (1.8, 0) — ADC-closest to
    # query A (d~2.2) but NOT in A's probe set
    for i in range(300):
        rows.append(Row(vec_id=vid, embedding=vec(1.8 + (i % 7) * 0.01,
                                                  (i % 5 - 2) * 0.01, vid)))
        vid += 1
    # cells 1 and 2: 8 rows each near their centroids (d~3 from A)
    for cx, cy in ((4, 3), (4, -3)):
        for i in range(8):
            rows.append(Row(vec_id=vid,
                            embedding=vec(cx + (i % 3) * 0.05,
                                          cy + (i % 2) * 0.05, vid)))
            vid += 1
    # cell 3: far away, never probed
    for i in range(4):
        rows.append(Row(vec_id=vid, embedding=vec(20 + i * 0.1, 0, vid)))
        vid += 1
    corpus2 = spark.createDataFrame(rows)
    books2 = pq_train(corpus2, m_subspaces=4, k_codes=32, iters=5)

    # query A at (4, 0): centroid distances 4 / 3 / 3 / 16 -> probes
    # {1, 2}; query B inside the hot cell -> probes {0, ...}
    queries = spark.createDataFrame(
        [Row(vec_id=9001, embedding=vec(4, 0, 9001)),
         Row(vec_id=9002, embedding=vec(1.7, 0.05, 9002))]
    )
    probes = {
        r["vec_id"]: sorted(r["cells"])
        for r in queries.select(
            "vec_id", _pc(F.col("embedding"), cents, 2).alias("cells")
        ).collect()
    }
    assert probes[9001] == [1, 2], probes  # the skew-victim setup holds
    assert 0 in probes[9002]

    codes = pq_encode(corpus2, books2)
    # cell assignment consistent with the centroids used for probing
    from feast_spark.operators.similarity import assign_nearest

    cells = assign_nearest(
        corpus2,
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "cell int, centroid array<double>",
        ),
        id_col="vec_id",
        vec_col="embedding",
    )
    codes = codes.join(cells.select("vec_id", "cell"), "vec_id")

    k = 6
    got = ivfpq_topk(codes, queries, cents, books2, k=k, n_probe=2)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    # EXACTLY k per query — the guarantee the over-fetch heuristic broke
    assert sorted(by_q) == [9001, 9002]
    assert len(by_q[9001]) == k and len(by_q[9002]) == k

    # and each equals plain pq_topk restricted to that query's probe set
    for qid in (9001, 9002):
        restricted = codes.where(F.col("cell").isin(probes[qid]))
        want = pq_topk(
            restricted.select("vec_id", "pq_codes"),
            queries.where(F.col("vec_id") == qid),
            books2,
            k=k,
        ).collect()
        key = lambda r: (round(r["adc_dist"], 9))  # noqa: E731
        assert sorted(key(r) for r in by_q[qid]) == sorted(key(r) for r in want)
    # the victim's neighbors all come from its own (small) probe cells
    cell_of = {r["vec_id"]: r["cell"] for r in cells.collect()}
    for r in by_q[9001]:
        assert cell_of[r["neighbor_id"]] in {1, 2}


def test_empty_query_batch_returns_empty_topk(spark, corpus, books):
    """An empty queries frame yields an empty (query_id, neighbor_id,
    adc_dist) result instead of the bare numpy IndexError the
    shape-(0,) query matrix used to raise (r17 review fix)."""
    codes = pq_encode(corpus, books)
    empty_q = corpus.where(F.col("vec_id") < 0)
    out = pq_topk(codes, empty_q, books, k=5)
    assert out.columns == ["query_id", "neighbor_id", "adc_dist"]
    assert out.count() == 0
    from feast_spark.operators.pq import pq_topk_reranked

    reranked = pq_topk_reranked(corpus, codes, empty_q, books, k=5)
    assert reranked.count() == 0
