"""Similarity-search tests: brute-force correctness + LSH recall."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.similarity import (
    cosine,
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_ann_topk,
)
from tests.conftest import SF_MED


def test_cosine_exact_values(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0], b=[1.0, 0.0]), Row(a=[1.0, 0.0], b=[0.0, 1.0]),
         Row(a=[1.0, 1.0], b=[1.0, 0.0])]
    )
    got = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(1 / math.sqrt(2))


def test_topk_ranks_and_self_exclusion(spark):
    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    out = cosine_topk(emb, emb.filter("vec_id < 3"), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 5
        assert all(r["neighbor_id"] != q for r in rows)
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        ordered = sorted(rows, key=lambda r: r["rank"])
        cosines = [r["cos"] for r in ordered]
        assert cosines == sorted(cosines, reverse=True)


def test_lsh_ann_subset_of_bruteforce_space(spark):
    """LSH results must be genuine vectors with correct cosines; recall
    of top-1 should be decent on 64-dim random data."""
    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    queries = emb.filter("vec_id < 10")
    exact = cosine_topk(emb, queries, k=1, round_digits=None).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in exact}
    approx = lsh_ann_topk(emb, queries, planes=8, probe_hamming=2, k=1).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in approx}
    hits = sum(1 for q, n in got.items() if top1.get(q) == n)
    # random 64-dim gaussian vectors are nearly orthogonal => LSH recall is
    # data-dependent; just require the mechanism finds some true top-1s
    # and returns only valid neighbors
    assert all(n != q for q, n in got.items())
    assert hits >= 1


def test_embedding_near_dup_pairs_finds_duplicates(spark):
    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet").limit(50)
    # plant an exact duplicate of vec 0 with id 9999
    dup = emb.filter("vec_id = 0").select(
        F.lit(9999).cast("long").alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(dup)
    pairs = embedding_near_dup_pairs(both, threshold=0.999).collect()
    assert any({r["id_a"], r["id_b"]} == {0, 9999} for r in pairs)

def test_exact_cosine_pairs_symmetric_ground_truth(spark):
    from feast_spark.operators.similarity import exact_cosine_pairs

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet").limit(60)
    pairs = exact_cosine_pairs(emb, threshold=-1.1, round_digits=None).collect()
    # all n*(n-1)/2 pairs scored exactly once, ids strictly ordered
    assert len(pairs) == 60 * 59 // 2
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    # spot-check one pair against the scalar cosine
    r0 = pairs[0]
    a = emb.filter(F.col("vec_id") == r0["id_a"]).first()["embedding"]
    b = emb.filter(F.col("vec_id") == r0["id_b"]).first()["embedding"]
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    assert r0["cos"] == pytest.approx(dot / (na * nb), rel=1e-9)


def test_ivf_ann_recall_and_validity(spark):
    from feast_spark.operators.similarity import ivf_ann_topk

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    queries = emb.filter("vec_id < 10")
    exact = cosine_topk(emb, queries, k=10, round_digits=4).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = ivf_ann_topk(emb, queries, n_centroids=8, n_probe=4, k=10).collect()
    by_q = {}
    for r in got:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # probing half the cells must recover a good chunk of the true top-10
    total = sum(len(v) for v in truth.values())
    hit = sum(len(truth[q] & by_q.get(q, set())) for q in truth)
    assert hit / total >= 0.3
    # ranks are dense and cosines descend per query
    for q, rows in {
        q: sorted([r for r in got if r["query_id"] == q], key=lambda r: r["rank"])
        for q in by_q
    }.items():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r["cos"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_nprobe_all_cells_is_exact(spark):
    from feast_spark.operators.similarity import ivf_ann_topk

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet").limit(200)
    queries = emb.filter("vec_id < 5")
    exact = cosine_topk(emb, queries, k=5, round_digits=4).collect()
    full = ivf_ann_topk(
        emb, queries, n_centroids=4, n_probe=4, k=5
    ).collect()
    key = lambda rows: sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in rows)
    assert key(full) == key(exact)


def test_ivf_persisted_index_matches_inline(spark, tmp_path):
    """build_ivf_index + ivf_index_topk must return exactly what the
    retrain-per-call ivf_ann_topk returns for the same params, and the
    on-disk layout must be partitioned by cell (so queries prune)."""
    import os

    from feast_spark.operators.similarity import (
        build_ivf_index,
        ivf_ann_topk,
        ivf_index_topk,
    )

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    queries = emb.filter("vec_id < 3")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=2)

    got = ivf_index_topk(spark, path, queries, n_probe=3, k=5)
    want = ivf_ann_topk(emb, queries, n_centroids=8, n_probe=3, k=5, iters=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    cells = [
        d
        for d in os.listdir(f"{path}/vectors/epoch=0")
        if d.startswith("cell=")
    ]
    assert len(cells) > 1, "corpus must be laid out one directory per cell"


def test_ivf_index_query_prunes_partitions(spark, tmp_path):
    """With literal probe cells, the vectors scan must read only the
    probed cells (partition filters in the scan, not a full read)."""
    from feast_spark.operators.similarity import _ivf_vectors, build_ivf_index

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=2)
    vectors = _ivf_vectors(spark, path)
    pruned = vectors.filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("#", " #").replace(
        "cell #", "cell"
    ) or "cell IN (0,1)" in plan, plan


def test_quantize_int8_degenerate_vectors(spark):
    """Zero, empty, and all-null vectors all take the scale=0 branch
    instead of dividing by a NULL scale."""
    from pyspark.sql import Row

    from feast_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[2.0, -4.0]),
            Row(vec_id=2, embedding=[0.0, 0.0]),
            Row(vec_id=3, embedding=[]),
            Row(vec_id=4, embedding=[None, None]),
        ],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert out[1]["scale"] == 4.0
    assert out[1]["qvec"] == [64, -127]
    assert out[2]["scale"] == 0.0
    assert out[2]["qvec"] == [0, 0]
    assert out[3]["scale"] == 0.0
    assert out[3]["qvec"] == []
    assert out[4]["scale"] == 0.0
    assert out[4]["qvec"] == [0, 0]


def test_ivf_index_append_equals_rebuild_with_frozen_quantizer(spark, tmp_path):
    """Appending a slice == building over the full corpus with the SAME
    centroids: the quantizer is frozen, so cell assignment — and hence
    every query result — is identical."""
    from pyspark.sql import functions as F

    from feast_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_index_stats,
        ivf_index_topk,
        nearest_centroid,
    )
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    first = emb.filter(F.col("vec_id") % 3 != 0)
    later = emb.filter(F.col("vec_id") % 3 == 0)

    inc_path = str(tmp_path / "inc")
    build_ivf_index(first, inc_path, n_centroids=8, iters=2)
    ivf_index_append(spark, inc_path, later)

    # reference: assign the FULL corpus with the incremental index's
    # (frozen) centroids and write a fresh index
    cents = [
        list(r.centroid)
        for r in spark.read.parquet(f"{inc_path}/centroids")
        .orderBy("cell")
        .collect()
    ]
    full_path = str(tmp_path / "full")
    spark.read.parquet(f"{inc_path}/centroids").coalesce(1).write.parquet(
        f"{full_path}/centroids"
    )
    (
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .withColumn("cell", nearest_centroid(F.col("vec"), cents))
        .write.partitionBy("cell")
        .parquet(f"{full_path}/vectors/epoch=0")
    )
    import json as _json

    with open(f"{full_path}/_MANIFEST.json", "w") as f:
        _json.dump({"epochs": [0]}, f)

    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_index_topk(spark, inc_path, queries, n_probe=3, k=5).collect()
    want = ivf_index_topk(spark, full_path, queries, n_probe=3, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)

    # appended vectors are actually retrievable: query an appended id
    # against itself being excluded -> its nearest cellmates come back
    stats = ivf_index_stats(spark, inc_path).collect()
    assert sum(r["n_vectors"] for r in stats) == emb.count()
    assert all(r["skew_ratio"] >= 1.0 for r in stats)


def test_ivf_crashed_append_is_invisible(spark, tmp_path):
    """A staged-but-uncommitted epoch (crash between stage and manifest
    flip) is never read by queries or stats, and the next append
    numbers past the orphan — the minhash_index commit protocol applied
    to the ANN index."""
    import os

    from pyspark.sql import functions as F

    from feast_spark.operators.similarity import (
        _ivf_vectors,
        build_ivf_index,
        ivf_index_append,
        ivf_index_stats,
    )
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), path, n_centroids=4)
    n0 = _ivf_vectors(spark, path).count()
    # simulate a crashed append: epoch dir staged, manifest not flipped
    orphan = os.path.join(path, "vectors", "epoch=1")
    (
        emb.filter(F.col("vec_id") % 3 == 1)
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .withColumn("cell", F.lit(0))
        .write.partitionBy("cell")
        .parquet(orphan)
    )
    assert _ivf_vectors(spark, path).count() == n0  # orphan invisible
    assert (
        sum(r["n_vectors"] for r in ivf_index_stats(spark, path).collect())
        == n0
    )
    # next append numbers PAST the orphan and commits atomically
    ivf_index_append(spark, path, emb.filter(F.col("vec_id") % 3 == 2))
    assert os.path.isdir(os.path.join(path, "vectors", "epoch=2"))
    import json as _json

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        assert _json.load(f)["epochs"] == [0, 2]
    assert (
        _ivf_vectors(spark, path).count()
        == n0 + emb.filter(F.col("vec_id") % 3 == 2).count()
    )


def test_ivf_rebuild_is_atomic_and_vacuum(spark, tmp_path):
    """Rebuilding over an existing index must never let readers pair
    new centroids with old-epoch cell assignments: the quantizer
    generation and the epoch list flip together in the manifest.
    A crash after the centroid write but before the commit (simulated
    by writing an orphan gen dir) leaves queries on the old pairing;
    vacuum removes exactly the unreferenced dirs."""
    import os

    from pyspark.sql import functions as F

    from feast_spark.operators.similarity import (
        _ivf_manifest,
        build_ivf_index,
        ivf_index_topk,
        ivf_index_vacuum,
    )
    from feast_spark.io.fs import LocalFS
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=2)
    queries = emb.filter(F.col("vec_id") < 5)
    before = ivf_index_topk(spark, path, queries, n_probe=3, k=5).collect()
    m0 = _ivf_manifest(path, LocalFS())
    assert m0["centroids"] == "centroids/gen=0"

    # crashed rebuild: a newer gen dir exists but was never committed
    os.makedirs(f"{path}/centroids/gen=1")
    mid = ivf_index_topk(spark, path, queries, n_probe=3, k=5).collect()
    assert mid == before  # readers still on the committed pairing

    # completed rebuild with a different quantizer: one atomic flip
    build_ivf_index(emb, path, n_centroids=4, iters=2)
    m1 = _ivf_manifest(path, LocalFS())
    assert m1["centroids"] == "centroids/gen=2"  # past the orphan
    assert m1["epochs"] != m0["epochs"]
    after = ivf_index_topk(spark, path, queries, n_probe=3, k=5)
    assert after.count() > 0

    removed = ivf_index_vacuum(path)
    assert removed["centroid_gens_removed"] == ["gen=0", "gen=1"]
    assert removed["epochs_removed"] == [f"epoch={e}" for e in m0["epochs"]]
    # the live pairing is untouched
    assert (
        ivf_index_topk(spark, path, queries, n_probe=3, k=5).collect()
        == after.collect()
    )


def test_ivf_compact_preserves_results(spark, tmp_path):
    """Compacting appended epochs into one changes nothing a query can
    observe: centroids frozen, cells frozen, top-k identical."""
    from pyspark.sql import functions as F

    from feast_spark.operators.similarity import (
        _ivf_manifest,
        build_ivf_index,
        ivf_index_append,
        ivf_index_compact,
        ivf_index_topk,
        ivf_index_vacuum,
    )
    from feast_spark.io.fs import LocalFS
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivfc")
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), path, n_centroids=8)
    ivf_index_append(spark, path, emb.filter(F.col("vec_id") % 3 == 1))
    ivf_index_append(spark, path, emb.filter(F.col("vec_id") % 3 == 2))
    queries = emb.filter(F.col("vec_id") < 5)
    before = ivf_index_topk(spark, path, queries, n_probe=3, k=5).collect()
    assert len(_ivf_manifest(path, LocalFS())["epochs"]) == 3

    ivf_index_compact(spark, path)
    m = _ivf_manifest(path, LocalFS())
    assert len(m["epochs"]) == 1
    assert m["centroids"] == "centroids/gen=0"  # quantizer untouched
    assert ivf_index_topk(spark, path, queries, n_probe=3, k=5).collect() == before

    removed = ivf_index_vacuum(path)
    assert removed["epochs_removed"] == ["epoch=0", "epoch=1", "epoch=2"]
    assert removed["centroid_gens_removed"] == []
    assert ivf_index_topk(spark, path, queries, n_probe=3, k=5).collect() == before


def test_probe_cells_py_matches_expression_probe(spark):
    """The pure-Python probe (the serving fast path) must pick the
    SAME cells as the probe_cells_df expression — same doubles, same
    summation order, same (distance, cell) tie-break."""
    from pyspark.sql import functions as F

    from feast_spark.operators.similarity import (
        md5_centroids,
        probe_cells_df,
        probe_cells_py,
    )

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet").limit(150)
    cents = md5_centroids(emb, n_centroids=8)
    # duplicate centroid -> exact distance ties must break to the
    # lowest cell on both paths
    cents = cents + [list(cents[0])]
    q = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qvec")
    )
    expr = {}
    for r in probe_cells_df(q, cents, 4).collect():
        expr.setdefault(r["query_id"], []).append(r["cell"])
    for r in q.collect():
        assert probe_cells_py(r["__qvec"], cents, 4) == expr[r["query_id"]]


def test_ivf_driver_probe_identical_and_single_job(spark, tmp_path):
    """driver_probe=True must return exactly the expression-probe
    result while launching fewer Spark jobs (the serving-floor win)."""
    from feast_spark.operators.similarity import build_ivf_index, ivf_index_topk

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    queries = emb.filter("vec_id < 3")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, iters=2)

    want = ivf_index_topk(spark, path, queries, n_probe=3, k=5).collect()

    # count jobs in DEDICATED job groups: len(getJobIdsForGroup(None))
    # deltas go negative in long sessions because the status tracker
    # retains a bounded job-id window (spark.ui.retainedJobs) and
    # evicts old ids between the two snapshots
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("probe_default", "job-count probe")
    try:
        ivf_index_topk(spark, path, queries, n_probe=3, k=5)
    finally:
        sc.setJobGroup(None, None)
    jobs_default = len(tracker.getJobIdsForGroup("probe_default") or [])

    sc.setJobGroup("probe_driver", "job-count probe")
    try:
        got_df = ivf_index_topk(
            spark, path, queries, n_probe=3, k=5, driver_probe=True
        )
    finally:
        sc.setJobGroup(None, None)
    jobs_driver = len(tracker.getJobIdsForGroup("probe_driver") or [])
    got = got_df.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # plan construction swaps (probe job + distinct-cells job) for one
    # query-collect job: strictly fewer jobs before the query runs
    assert jobs_driver < jobs_default
