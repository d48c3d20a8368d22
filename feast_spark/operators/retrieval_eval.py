"""Retrieval quality metrics — recall@k, MRR@k, nDCG@k — over ranked
result tables, plus the ANN-vs-exact convenience harness.

The retrieval stack here (``operators/similarity.py`` ANN,
``operators/bm25.py`` lexical + hybrid) trades exactness for scan cost
at several points: IVF probes a subset of cells, LSH buckets collide
probabilistically, PQ quantizes distances, fetch_k truncates fusion
channels.  Those knobs are only tunable against MEASURED quality — at
100 TB you evaluate on a sampled query set (1e3-1e5 queries), and the
metrics below reduce (query, doc) pairs immediately, so the evaluation
is a pair of equi-joins + one aggregate per query regardless of corpus
size.  Nothing is collected; the output is one row per query (feed it
to ``F.avg`` for the headline number).

Input contract (matches every retrieval operator in this repo):

* ``results``: (query_id, doc_id, rank) — rank 1-based, dense per
  query, as produced by ``*_topk`` / ``*_topk_batch``.
* ``qrels``: (query_id, doc_id[, relevance]) — the ground truth.  For
  recall/MRR any row counts as relevant; for nDCG ``relevance`` is a
  non-negative gain (binary qrels work: gain 1).

Formulas (standard IR definitions, e.g. Manning et al., IIR ch. 8):

    recall@k = |top-k ∩ relevant| / min(k, |relevant|)
    MRR@k    = 1 / rank of the first relevant hit (0 if none in top-k)
    nDCG@k   = DCG@k / IDCG@k,  DCG@k = Σ_{r<=k} gain_r / log2(r + 1)

``recall@k`` uses the min(k, |relevant|) denominator (a.k.a. "capped"
recall) so a query with more qrels than k can still reach 1.0; pass
``capped=False`` for the plain |relevant| denominator.

Reference parity: Feast has no retrieval operators at all; this is
part of the training-data-pipeline extension (SURVEY §2.6), the
evaluation counterpart of the ANN/BM25 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "recall_at_k",
    "mrr_at_k",
    "ndcg_at_k",
    "ann_recall_vs_exact",
]


def _ranked(results: DataFrame, query_col: str, id_col: str, rank_col: str, k: int):
    """Top-k slice with one row per (query, doc): a doc listed at two
    ranks <= k (malformed or merged result lists) keeps its BEST rank,
    so set-intersection metrics can never exceed 1."""
    r = results.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).alias("rank"),
    ).filter(F.col("rank") <= k)
    return r.groupBy("query_id", "doc_id").agg(F.min("rank").alias("rank"))


def recall_at_k(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    capped: bool = True,
) -> DataFrame:
    """Per-query recall@k: (query_id, n_relevant, n_hit, recall).

    Queries come from QRELS (a query with ground truth but no results
    scores 0; a result query with no qrels is dropped — there is
    nothing to recall).  Plan: one inner join of the top-k slice
    against qrels on (query, doc) — shuffle O(result + qrel rows) —
    then one aggregate per side joined on query."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    r = _ranked(results, query_col, id_col, rank_col, k)
    q = qrels.select(
        F.col(query_col).alias("query_id"), F.col(id_col).alias("doc_id")
    ).distinct()
    n_rel = q.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_relevant"))
    hits = (
        r.join(q, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    denom = (
        F.least(F.col("n_relevant"), F.lit(k))
        if capped
        else F.col("n_relevant")
    )
    return (
        n_rel.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_relevant",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) / denom).alias("recall"),
        )
    )


def mrr_at_k(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query reciprocal rank of the FIRST relevant hit within the
    top k: (query_id, first_rank, rr).  first_rank is NULL and rr 0.0
    when no relevant doc appears in the top k.  One join + a min
    aggregate — the min folds map-side."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    r = _ranked(results, query_col, id_col, rank_col, k)
    q = qrels.select(
        F.col(query_col).alias("query_id"), F.col(id_col).alias("doc_id")
    ).distinct()
    first = (
        r.join(q, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rank"))
    )
    all_q = q.select("query_id").distinct()
    return all_q.join(first, "query_id", "left").select(
        "query_id",
        "first_rank",
        F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)).alias("rr"),
    )


def ndcg_at_k(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str | None = None,
) -> DataFrame:
    """Per-query nDCG@k: (query_id, dcg, idcg, ndcg), gains taken
    as-is (linear; binary qrels give the classic binary nDCG).  When
    ``rel_col`` is None every qrel row counts gain 1.

    IDCG ranks each query's own qrels by gain descending — a window
    over the QRELS table (rows per query = qrels per query, human-
    labeled and small), never over the corpus.  A query with zero
    positive-gain qrels has IDCG 0 and is emitted with ndcg 0.0."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    gain = (
        F.col(rel_col).cast("double") if rel_col is not None else F.lit(1.0)
    )
    # one gain per (query, doc): duplicate qrel rows (unioned qrel
    # sources) would otherwise double-count in DCG while spreading
    # across two ideal ranks — the max gain wins, matching trec_eval
    q = (
        qrels.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            gain.alias("gain"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.max("gain").alias("gain"))
    )
    r = _ranked(results, query_col, id_col, rank_col, k)
    dcg = (
        r.join(q, ["query_id", "doc_id"])
        .select(
            "query_id",
            (F.col("gain") / F.log2(F.col("rank") + 1.0)).alias("__d"),
        )
        .groupBy("query_id")
        .agg(F.sum("__d").alias("dcg"))
    )
    iw = Window.partitionBy("query_id").orderBy(
        F.col("gain").desc(), F.col("doc_id").asc()
    )
    idcg = (
        q.filter(F.col("gain") > 0)
        .withColumn("__ir", F.row_number().over(iw))
        .filter(F.col("__ir") <= k)
        .select(
            "query_id",
            (F.col("gain") / F.log2(F.col("__ir") + 1.0)).alias("__d"),
        )
        .groupBy("query_id")
        .agg(F.sum("__d").alias("idcg"))
    )
    all_q = q.select("query_id").distinct()
    return (
        all_q.join(dcg, "query_id", "left")
        .join(idcg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
            F.coalesce("idcg", F.lit(0.0)).alias("idcg"),
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0,
                F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )


def ann_recall_vs_exact(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Recall@k of an approximate ANN result against the brute-force
    top-k on the same queries — the tuning harness for
    n_probe/band/bucket knobs (``ann_ivf`` vs ``ann_topk_cosine``
    etc.).  The exact top-k IS the qrel set, so this is ``recall_at_k``
    with qrels = exact results truncated to k."""
    exact_k = _ranked(exact, query_col, id_col, rank_col, k)
    return recall_at_k(
        _ranked(approx, query_col, id_col, rank_col, k),
        exact_k.select("query_id", "doc_id"),
        k,
        query_col="query_id",
        id_col="doc_id",
        rank_col="rank",
    )
