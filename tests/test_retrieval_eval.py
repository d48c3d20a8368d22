"""Retrieval quality metrics: hand-computed differentials on a fixed
fixture, a DuckDB twin for each metric, and the ANN-vs-exact harness
over the real embeddings table."""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.retrieval_eval import (
    ann_recall_vs_exact,
    mrr_at_k,
    ndcg_at_k,
    recall_at_k,
)
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED

# query 1: relevant {a, b, c}; top-5 hits a(r1), c(r4)
# query 2: relevant {x};       top-5 hits none
# query 3: relevant {p, q};    top-5 hits q(r2), p(r3)
# query 4: qrels only (no results at all)
RESULTS = [
    (1, "a", 1), (1, "z", 2), (1, "y", 3), (1, "c", 4), (1, "w", 5),
    (2, "m", 1), (2, "n", 2), (2, "o", 3), (2, "u", 4), (2, "v", 5),
    (3, "t", 1), (3, "q", 2), (3, "p", 3),
    (5, "k", 1),  # results with no qrels -> dropped by every metric
]
QRELS = [
    (1, "a", 3), (1, "b", 2), (1, "c", 1),
    (2, "x", 1),
    (3, "p", 2), (3, "q", 1),
    (4, "j", 1),
]


def _frames(spark):
    res = spark.createDataFrame(
        RESULTS, "query_id INT, doc_id STRING, rank INT"
    )
    qrels = spark.createDataFrame(
        QRELS, "query_id INT, doc_id STRING, relevance INT"
    )
    return res, qrels


def test_recall_at_k_hand_computed(spark):
    res, qrels = _frames(spark)
    got = {
        r["query_id"]: (r["n_relevant"], r["n_hit"], r["recall"])
        for r in recall_at_k(res, qrels, k=5).collect()
    }
    assert got == {
        1: (3, 2, pytest.approx(2 / 3)),
        2: (1, 0, 0.0),
        3: (2, 2, 1.0),
        4: (1, 0, 0.0),
    }
    # k=2 with capped denominator: q1 has 3 qrels but denom min(3,2)=2
    got2 = {
        r["query_id"]: r["recall"]
        for r in recall_at_k(res, qrels, k=2).collect()
    }
    assert got2[1] == pytest.approx(1 / 2)  # only a in top-2
    # uncapped: denominator is all 3 qrels
    gotu = {
        r["query_id"]: r["recall"]
        for r in recall_at_k(res, qrels, k=2, capped=False).collect()
    }
    assert gotu[1] == pytest.approx(1 / 3)


def test_mrr_hand_computed(spark):
    res, qrels = _frames(spark)
    got = {
        r["query_id"]: (r["first_rank"], r["rr"])
        for r in mrr_at_k(res, qrels, k=5).collect()
    }
    assert got == {
        1: (1, 1.0),
        2: (None, 0.0),
        3: (2, 0.5),
        4: (None, 0.0),
    }


def test_ndcg_hand_computed(spark):
    import math

    res, qrels = _frames(spark)
    got = {
        r["query_id"]: (r["dcg"], r["idcg"], r["ndcg"])
        for r in ndcg_at_k(res, qrels, k=5, rel_col="relevance").collect()
    }
    # query 1: gains a=3@r1, c=1@r4; ideal order 3,2,1
    dcg1 = 3 / math.log2(2) + 1 / math.log2(5)
    idcg1 = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert got[1] == (
        pytest.approx(dcg1),
        pytest.approx(idcg1),
        pytest.approx(dcg1 / idcg1),
    )
    assert got[2] == (0.0, pytest.approx(1.0), 0.0)
    # query 3: q(gain 1)@r2, p(gain 2)@r3; ideal 2,1
    dcg3 = 1 / math.log2(3) + 2 / math.log2(4)
    idcg3 = 2 / math.log2(2) + 1 / math.log2(3)
    assert got[3] == (
        pytest.approx(dcg3),
        pytest.approx(idcg3),
        pytest.approx(dcg3 / idcg3),
    )
    # binary gains when rel_col omitted
    gotb = {
        r["query_id"]: r["ndcg"] for r in ndcg_at_k(res, qrels, k=5).collect()
    }
    bdcg1 = 1 / math.log2(2) + 1 / math.log2(5)
    bidcg1 = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert gotb[1] == pytest.approx(bdcg1 / bidcg1)


def test_metrics_match_duckdb(spark):
    """Same three metrics recomputed as plain SQL in DuckDB over the
    identical rows — engine-independent definitions."""
    import duckdb

    res, qrels = _frames(spark)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE results (query_id INT, doc_id VARCHAR, rank INT)"
    )
    con.executemany("INSERT INTO results VALUES (?, ?, ?)", RESULTS)
    con.execute(
        "CREATE TABLE qrels (query_id INT, doc_id VARCHAR, relevance INT)"
    )
    con.executemany("INSERT INTO qrels VALUES (?, ?, ?)", QRELS)
    k = 5
    want_recall = dict(
        con.execute(f"""
        WITH rel AS (SELECT DISTINCT query_id, doc_id FROM qrels),
        hit AS (
          SELECT r.query_id, COUNT(*) AS n
          FROM results r JOIN rel USING (query_id, doc_id)
          WHERE r.rank <= {k} GROUP BY r.query_id
        )
        SELECT rel.query_id,
               COALESCE(ANY_VALUE(hit.n), 0)
                 / LEAST(COUNT(*), {k})::DOUBLE
        FROM rel LEFT JOIN hit USING (query_id)
        GROUP BY rel.query_id
        """).fetchall()
    )
    got_recall = {
        r["query_id"]: r["recall"]
        for r in recall_at_k(res, qrels, k=k).collect()
    }
    assert got_recall == pytest.approx(want_recall)

    want_ndcg = dict(
        con.execute(f"""
        WITH q AS (SELECT query_id, doc_id, relevance::DOUBLE AS g FROM qrels),
        dcg AS (
          SELECT r.query_id, SUM(q.g / LOG2(r.rank + 1)) AS v
          FROM results r JOIN q USING (query_id, doc_id)
          WHERE r.rank <= {k} GROUP BY r.query_id
        ),
        ideal AS (
          SELECT query_id, g,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY g DESC, doc_id ASC) AS ir
          FROM q WHERE g > 0
        ),
        idcg AS (
          SELECT query_id, SUM(g / LOG2(ir + 1)) AS v
          FROM ideal WHERE ir <= {k} GROUP BY query_id
        )
        SELECT a.query_id,
               CASE WHEN COALESCE(idcg.v, 0) > 0
                    THEN COALESCE(dcg.v, 0) / idcg.v ELSE 0 END
        FROM (SELECT DISTINCT query_id FROM qrels) a
        LEFT JOIN dcg USING (query_id) LEFT JOIN idcg USING (query_id)
        """).fetchall()
    )
    got_ndcg = {
        r["query_id"]: r["ndcg"]
        for r in ndcg_at_k(res, qrels, k=k, rel_col="relevance").collect()
    }
    assert got_ndcg == pytest.approx(want_ndcg)

    want_mrr = dict(
        con.execute(f"""
        WITH rel AS (SELECT DISTINCT query_id, doc_id FROM qrels),
        fr AS (
          SELECT r.query_id, MIN(r.rank) AS m
          FROM results r JOIN rel USING (query_id, doc_id)
          WHERE r.rank <= {k} GROUP BY r.query_id
        )
        SELECT q.query_id, COALESCE(1.0 / ANY_VALUE(fr.m), 0)
        FROM (SELECT DISTINCT query_id FROM qrels) q
        LEFT JOIN fr USING (query_id) GROUP BY q.query_id
        """).fetchall()
    )
    got_mrr = {
        r["query_id"]: r["rr"] for r in mrr_at_k(res, qrels, k=k).collect()
    }
    assert got_mrr == pytest.approx(want_mrr)
    con.close()


@pytest.mark.nightly
def test_ann_recall_harness(spark):
    """IVF recall against brute-force on the real embeddings: exact vs
    itself is 1.0 everywhere; the approximate index lands in (0, 1]
    and loses recall as n_probe shrinks (or stays equal)."""
    from feast_spark.operators.similarity import cosine_topk, ivf_ann_topk, md5_centroids

    emb = load_table(spark, SF_MED, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10)
    self_recall = ann_recall_vs_exact(exact, exact, k=10).collect()
    assert all(r["recall"] == 1.0 for r in self_recall)
    assert len(self_recall) == 8

    cents = md5_centroids(emb, "vec_id", "embedding", n_centroids=16)
    lo = ivf_ann_topk(emb, queries, k=10, centroids=cents, n_probe=2)
    hi = ivf_ann_topk(emb, queries, k=10, centroids=cents, n_probe=8)
    avg = lambda rows: sum(r["recall"] for r in rows) / len(rows)  # noqa: E731
    r_lo = avg(ann_recall_vs_exact(lo, exact, k=10).collect())
    r_hi = avg(ann_recall_vs_exact(hi, exact, k=10).collect())
    assert 0.0 < r_lo <= 1.0
    assert r_hi >= r_lo  # more probes never lose recall on avg


def test_duplicate_rows_cannot_exceed_one(spark):
    """Duplicate qrel rows and duplicate result ranks must not push any
    metric past 1.0 (regression: dedup on both sides)."""
    res = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 3), (1, "b", 2)],
        "query_id INT, doc_id STRING, rank INT",
    )
    qrels = spark.createDataFrame(
        [(1, "a", 2), (1, "a", 2), (1, "b", 1)],
        "query_id INT, doc_id STRING, relevance INT",
    )
    rec = recall_at_k(res, qrels, k=5).collect()[0]
    assert rec["n_relevant"] == 2 and rec["n_hit"] == 2
    assert rec["recall"] == 1.0
    nd = ndcg_at_k(res, qrels, k=5, rel_col="relevance").collect()[0]
    assert 0.0 < nd["ndcg"] <= 1.0
    import math

    # a@r1 (gain 2, best rank wins), b@r2 (gain 1); ideal 2,1 -> perfect
    want = (2 / math.log2(2) + 1 / math.log2(3)) / (
        2 / math.log2(2) + 1 / math.log2(3)
    )
    assert nd["ndcg"] == pytest.approx(want)
