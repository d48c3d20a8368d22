"""SemDeDup semantic dedup: planted-duplicate recovery vs the exact
all-pairs ground truth, determinism, the mega-cluster cap, and plan
shape (equi-join on the cluster id — never a cross join)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_pairs,
)
from feast_spark.operators.similarity import exact_cosine_pairs

DIM = 16


@pytest.fixture(scope="module")
def corpus(spark):
    """8 well-separated gaussian clusters; within each, vec 0 and vec 1
    are near-identical (cos > 0.999) — the planted semantic dups —
    and the rest are distinct directions (cos << 0.95)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (8, DIM)) * 10
    rows = []
    vid = 0
    for c in range(8):
        base = centers[c] + rng.normal(0, 0.05, DIM)
        for i in range(6):
            if i == 1:
                v = base + rng.normal(0, 0.001, DIM)  # near-dup of i=0
            elif i == 0:
                v = base
            else:
                v = centers[c] + rng.normal(0, 1.5, DIM)
            rows.append(
                Row(vec_id=vid, embedding=[float(x) for x in v], cluster=c)
            )
            vid += 1
    return spark.createDataFrame(rows)


def test_pairs_match_exact_ground_truth(spark, corpus):
    """With well-separated clusters every >=0.999-cosine pair is
    intra-cluster, so SemDeDup's clustered search must find EXACTLY
    the exact-all-pairs ground truth (recall 1.0 here; the
    cross-cluster miss mode needs pairs straddling a boundary)."""
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            corpus, n_clusters=8, threshold=0.999, iters=3
        ).collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"])
        for r in exact_cosine_pairs(corpus, threshold=0.999).collect()
    )
    assert got == want and len(got) >= 8  # one planted pair per cluster


def test_semantic_dedup_keeps_one_representative(spark, corpus):
    out = semantic_dedup(corpus, n_clusters=8, threshold=0.999, iters=3)
    kept = {r["vec_id"] for r in out.collect()}
    # min-id representative: vec 0 of each planted pair survives, vec 1
    # (its near-copy) does not; all distinct vectors survive
    pair_ids = {c * 6 + 1 for c in range(8)}
    assert kept.isdisjoint(pair_ids)
    assert {c * 6 for c in range(8)} <= kept
    assert len(kept) == corpus.count() - len(pair_ids)
    # deterministic
    again = {r["vec_id"] for r in semantic_dedup(
        corpus, n_clusters=8, threshold=0.999, iters=3
    ).collect()}
    assert again == kept


def test_keep_by_prefers_high_value(spark, corpus):
    scored = corpus.withColumn(
        "quality", (F.col("vec_id") % 6).cast("double")
    )
    out = semantic_dedup(
        scored, n_clusters=8, threshold=0.999, iters=3, keep_by="quality"
    )
    kept = {r["vec_id"] for r in out.collect()}
    # within each planted pair (ids c*6, c*6+1) quality is 0 vs 1:
    # the HIGH-quality member (c*6+1) now survives instead of min-id
    assert {c * 6 + 1 for c in range(8)} <= kept
    assert kept.isdisjoint({c * 6 for c in range(8)})


def test_mega_cluster_cap(spark):
    """A degenerate near-constant embedding region (collapsed encoder)
    is dropped from pair generation by max_cluster_size instead of
    exploding quadratically."""
    rng = np.random.default_rng(3)
    rows = [
        Row(vec_id=i, embedding=[1.0 + float(x) for x in rng.normal(0, 1e-4, DIM)])
        for i in range(50)
    ]
    # a distinct small cluster with one planted dup pair
    v = rng.normal(0, 1, DIM) * 5
    rows += [
        Row(vec_id=100, embedding=[float(x) for x in v]),
        Row(vec_id=101, embedding=[float(x) for x in v + 1e-4]),
    ]
    df = spark.createDataFrame(rows)
    # explicit quantizer: cell 0 = the collapsed blob (50 rows > cap),
    # cell 1 = the healthy region (2 rows) — a TRAINED quantizer would
    # place several centroids inside the blob and split it under the
    # cap, which is also fine at scale but not what this test pins
    pairs = semantic_dedup_pairs(
        df, threshold=0.999, max_cluster_size=10,
        centroids=[[1.0] * DIM, [float(x) for x in v]],
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in ids
    assert all(a >= 100 for a, _ in ids), ids  # collapsed region skipped


def test_plan_is_equi_join_no_python(spark, corpus):
    plan = (
        semantic_dedup_pairs(corpus, n_clusters=8, threshold=0.999)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for marker in ("BatchEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan, marker


def test_semdedup_against_index_matches_full_recompute(spark, tmp_path):
    """index(A) + semdedup_against_index(B) == semantic_dedup_pairs
    over A∪B with the SAME frozen centroids, restricted to pairs
    touching B — incremental semantic decisions never diverge from the
    full recompute, without re-embedding or re-clustering A."""
    from pyspark.sql import functions as F

    from feast_spark.operators.semdedup import (
        semantic_dedup_pairs,
        semdedup_against_index,
    )
    from feast_spark.operators.similarity import (
        _ivf_load_centroids,
        build_ivf_index,
    )
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_MED

    emb = load_table(spark, SF_MED, "embeddings")
    a = emb.filter(F.col("vec_id") % 3 != 0)
    b = emb.filter(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "semidx")
    build_ivf_index(a, path, n_centroids=8, iters=2)
    got = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in semdedup_against_index(
            spark, path, b, threshold=0.3, max_cluster_size=None
        ).collect()
    }
    cents = _ivf_load_centroids(spark, path)
    full = semantic_dedup_pairs(
        emb, threshold=0.3, centroids=cents, max_cluster_size=None
    ).collect()
    b_ids = {r["vec_id"] for r in b.collect()}
    want = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in full
        if r["id_a"] in b_ids or r["id_b"] in b_ids
    }
    assert got == want
    assert got  # non-vacuous at threshold 0.3 on the sf0.01 embeddings

    # the corpus read is partition-pruned to the touched cells
    plan = (
        semdedup_against_index(spark, path, b, threshold=0.3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*cell[^\]]*)\]", plan)
    assert m and m.group(1).strip(), "corpus scan not pruned by cell"


def test_reserved_pair_column_names_still_work(spark):
    """r17 regression guard: the aliased verify self-join must accept a
    caller whose id/vec columns are literally id_a / id_b (the pair
    frame's own output names) — the probe side is alias-qualified."""
    from feast_spark.operators.semdedup import semantic_dedup_pairs

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "id_a BIGINT, id_b ARRAY<DOUBLE>",
    )
    out = semantic_dedup_pairs(
        df, id_col="id_a", vec_col="id_b", n_clusters=2, threshold=0.99
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
