"""BM25 lexical retrieval over a document corpus — the keyword side of
hybrid (lexical + vector) search; companion to ``operators.similarity``
(cosine/IVF/PQ ANN over the embedding column).

Okapi BM25 with the Lucene idf variant (public formula):

    idf(t)      = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
    score(d, q) = sum_t idf(t) * tf_td * (k1 + 1)
                  / (tf_td + k1 * (1 - b + b * len_d / avg_len))

Scale shape: the query's terms are filtered INSIDE the token array
before any explode row survives, so the (doc, term) aggregation moves
only the postings of the query terms — O(docs containing a query
term), not O(corpus tokens) — and doc length rides through that
aggregate (no separate lengths join).  The tokenizer runs once per
consumer — the corpus-stats aggregate and the postings branch; two
narrow passes total, with nothing corpus-sized shuffled by either.
Corpus stats (N, avg_len) ride in as a broadcast one-row aggregate;
doc-frequencies are a second tiny aggregate over the same filtered
postings.  The final top-k is orderBy+limit = per-partition heaps + a
k-row merge (TakeOrderedAndProject), never a global sort.  Everything
is built-in column expressions — no Python on executors — and the
whole formula is mirrored in the DuckDB differential test
term-for-term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feast_spark.functions.text import normalize_text, tokens

__all__ = [
    "bm25_topk",
    "bm25_topk_batch",
    "hybrid_topk",
    "hybrid_topk_batch",
]


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a keyword query by BM25 score (ties broken
    by ascending id for cross-engine determinism).  Query terms are
    normalized the same way the corpus is (lowercase); duplicate query
    terms count once — the standard bag-of-words-query simplification."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    terms = sorted({t.lower() for t in query if t})
    if not terms:
        raise ValueError("query must contain at least one non-empty term")

    from feast_spark.operators.docdedup import widen_parallelism

    # tokenization is CPU-bound: widen a few-files scan up to the
    # session parallelism (no-op at scale, where file count >> cores —
    # same stance as the docdedup operators)
    df = widen_parallelism(df)
    # tokenize ONCE into (len_d, query-term subset); the two consumers
    # (corpus stats, postings) each run the tokenizer a single time —
    # and len_d rides through the posting aggregate, so no separate
    # lengths join re-tokenizes a third time
    feat = df.select(
        F.col(id_col),
        F.size(tokens(normalize_text(F.col(text_col)))).alias("len_d"),
        F.filter(
            tokens(normalize_text(F.col(text_col))),
            lambda t: t.isin(terms),
        ).alias("__qt"),
    )
    # doc lengths BEFORE the query filter (BM25 normalizes by full doc
    # length); one narrow agg — map-side combined
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len_d").alias("avg_len"),
    )
    tf = (
        feat.select(id_col, "len_d", F.explode("__qt").alias("term"))
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.first("len_d").alias("len_d"),
        )
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("len_d") / F.col("avg_len"))
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    fetch_k: int = 50,
    rrf_k: int = 60,
    query_vec_id=-1,
) -> DataFrame:
    """Hybrid retrieval: lexical BM25 + vector cosine fused by
    Reciprocal Rank Fusion (Cormack et al., SIGIR'09 — public method):

        rrf(d) = sum over channels  1 / (rrf_k + rank_channel(d))

    RRF is rank-based, so the two channels' incomparable score scales
    never need normalizing, and the result is deterministic.  Each
    channel fetches its own top ``fetch_k`` (cheap: both channels are
    top-k plans — TakeOrderedAndProject over one narrow pass), the two
    k-row lists full-outer join on id (driver-trivial row counts), and
    the fused top-k is re-ranked with ties broken by id.

    ``docs`` and ``embeddings`` are joined by id equality
    (``id_col`` <-> ``emb_id_col``); a document missing from either
    channel simply scores on the one it appears in.

    ``query_vec_id`` is the synthetic id given to the query vector —
    it is typed to match the embeddings id column (string id tables
    work) and MUST NOT collide with a real corpus id (cosine_topk's
    self-exclusion would silently drop that document; pass e.g.
    ``"__query__"`` for string ids, or any id outside your range)."""
    from feast_spark.operators.similarity import cosine_topk

    if fetch_k < k:
        raise ValueError(f"fetch_k ({fetch_k}) must be >= k ({k})")
    lex = bm25_topk(docs, id_col, text_col, query_terms, k=fetch_k)
    lex = lex.select(
        F.col(id_col).alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc()))
        .alias("lex_rank"),
    )
    # build the one-row query schema structurally (StructType, not an
    # f-string DDL) so id/vec column names containing spaces, dots, or
    # commas can't break schema parsing
    from pyspark.sql.types import StructField, StructType

    qdf = embeddings.sparkSession.createDataFrame(
        [(query_vec_id, [float(x) for x in query_vec])],
        StructType(
            [
                StructField(
                    emb_id_col, embeddings.schema[emb_id_col].dataType
                ),
                StructField(vec_col, embeddings.schema[vec_col].dataType),
            ]
        ),
    )
    vec = cosine_topk(
        embeddings, qdf, id_col=emb_id_col, vec_col=vec_col, k=fetch_k
    ).select(
        F.col("neighbor_id").alias("id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = (
        lex.join(vec, "id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)),
        )
        .select("id", "lex_rank", "vec_rank", "rrf")
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("id").asc()).limit(k)


def bm25_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-query BM25 top-k for a DataFrame of keyword queries — the
    retrieval-workload shape of :func:`bm25_topk`, mirroring
    ``similarity.cosine_topk`` / ``timeseries.ts_topk_similar_batch``:
    the (small) query table is broadcast; the corpus streams once.

    ``queries`` holds (query_id, terms: array<string>); terms are
    normalized to lowercase and deduplicated inside the plan.  Output:
    (query_id, doc id, bm25, rank), rank 1..k per query, ties broken
    by ascending doc id.

    Plan shape: the corpus token explode is filtered by a broadcast
    semi-join against the UNION of all query terms — so the postings
    shuffle stays O(docs containing any query's term) no matter how
    many queries ride in the batch; per-(query, doc) scores then rank
    under one hash exchange on query_id (the cosine_topk shape)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(
                F.transform(F.col(terms_col), lambda t: F.lower(t))
            )
        ).alias("term"),
    )
    all_terms = qt.select("term").distinct()

    from feast_spark.operators.docdedup import widen_parallelism

    df = widen_parallelism(df)  # CPU-bound tokenize; no-op at scale
    # tokenize once per consumer (stats, postings); len_d rides through
    # the posting aggregate so no third tokenizing join is needed
    feat = df.select(
        F.col(id_col),
        F.size(tokens(normalize_text(F.col(text_col)))).alias("len_d"),
        tokens(normalize_text(F.col(text_col))).alias("__toks"),
    )
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len_d").alias("avg_len"),
    )
    posting = feat.select(
        id_col, "len_d", F.explode("__toks").alias("term")
    ).join(F.broadcast(all_terms), "term", "leftsemi")
    tf = posting.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("len_d").alias("len_d"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("len_d") / F.col("avg_len"))
            ),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("term_score").alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", id_col, "bm25", F.col("__rn").alias("rank"))
    )


def hybrid_topk_batch(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    qvec_col: str = "qvec",
    k: int = 10,
    fetch_k: int = 50,
    rrf_k: int = 60,
) -> DataFrame:
    """Per-query hybrid retrieval for a DataFrame of (keyword terms,
    query vector) pairs — RRF fusion of :func:`bm25_topk_batch` and
    ``similarity.cosine_topk`` channel rankings, one corpus pass per
    channel regardless of batch size.

    ``queries`` holds (query_id, terms: array<string>, qvec:
    array<float/double>); query ids must not collide with corpus ids
    (cosine_topk's self-exclusion).  Output: (query_id, id, lex_rank,
    vec_rank, rrf, rank) with rank 1..k per query, ties by id."""
    from feast_spark.operators.similarity import cosine_topk

    if fetch_k < k:
        raise ValueError(f"fetch_k ({fetch_k}) must be >= k ({k})")
    lex = bm25_topk_batch(
        docs, queries, id_col=id_col, text_col=text_col,
        query_id_col=query_id_col, terms_col=terms_col, k=fetch_k,
    ).select(
        "query_id", F.col(id_col).alias("id"),
        F.col("rank").alias("lex_rank"),
    )
    vec = cosine_topk(
        embeddings,
        queries.select(
            F.col(query_id_col).alias(emb_id_col),
            F.col(qvec_col).alias(vec_col),
        ),
        id_col=emb_id_col, vec_col=vec_col, k=fetch_k,
    ).select(
        "query_id", F.col("neighbor_id").alias("id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = (
        lex.join(vec, ["query_id", "id"], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "id", "lex_rank", "vec_rank", "rrf",
            F.col("__rn").alias("rank"),
        )
    )
