"""BM25 retrieval: DuckDB differential on the real documents table,
ranking sanity, and the TakeOrderedAndProject plan pin."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.bm25 import bm25_topk
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def test_bm25_vs_duckdb(spark, duck):
    docs = load_table(spark, SF_MED, "documents")
    query = ["spark", "window", "merge"]
    out = bm25_topk(docs, "doc_id", "text", query, k=15).collect()
    oracle = duck.execute(
        f"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array({_NORM}, '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
lens AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array({_NORM}, '\\s+')) END AS len_d
  FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(len_d) AS avg_len FROM lens),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tk
  WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - dfreq.df_t + 0.5)
                 / (dfreq.df_t + 0.5) + 1.0)
              * tf.tf * (1.2 + 1)
              / (tf.tf + 1.2 * (1 - 0.75
                  + 0.75 * lens.len_d / stats.avg_len)) ) AS bm25
  FROM tf
  JOIN dfreq USING (term)
  JOIN lens USING (doc_id)
  CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 15
"""
    ).fetchall()
    assert len(out) == len(oracle) == 15
    for got, (doc_id, score) in zip(out, oracle):
        assert got["doc_id"] == doc_id
        assert got["bm25"] == pytest.approx(score, rel=1e-9)


def test_bm25_ranking_sanity(spark):
    docs = spark.createDataFrame(
        [
            Row(id=1, text="rare words here rare rare"),
            Row(id=2, text="rare words"),
            Row(id=3, text="completely unrelated content " + "filler " * 20),
            Row(id=4, text="rare " + "pad " * 50),
        ]
    )
    out = bm25_topk(docs, "id", "text", ["rare"], k=4).collect()
    ids = [r["id"] for r in out]
    # doc 3 has no query term at all -> not returned
    assert 3 not in ids
    # the short doc with repeated 'rare' outranks the long padded one
    assert ids.index(1) < ids.index(4)


def test_bm25_validation(spark):
    docs = spark.createDataFrame([Row(id=1, text="a b c")])
    with pytest.raises(ValueError):
        bm25_topk(docs, "id", "text", [], k=5)
    with pytest.raises(ValueError):
        bm25_topk(docs, "id", "text", ["a"], k=0)


def test_bm25_topk_plan_is_take_ordered(spark):
    docs = load_table(spark, SF_MED, "documents")
    plan = (
        bm25_topk(docs, "doc_id", "text", ["spark"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_hybrid_rrf_fusion(spark):
    """RRF fusion: a doc ranked well in BOTH channels beats docs strong
    in only one; channel-missing docs still score; python-computed RRF
    over the channel ranks matches exactly."""
    from feast_spark.operators.bm25 import hybrid_topk
    from feast_spark.operators.similarity import cosine_topk

    docs = load_table(spark, SF_MED, "documents")
    emb = load_table(spark, SF_MED, "embeddings").limit(500)
    # use vec_id as doc_id namespace (both 0..499 at sf0.01's limit)
    terms = ["spark", "merge"]
    qvec = [float((i * 7) % 13 - 6) for i in range(64)]

    out = hybrid_topk(
        docs, emb, terms, qvec, k=10, fetch_k=30
    ).collect()
    assert len(out) == 10

    # recompute RRF in python from the two channel rankings
    from feast_spark.operators.bm25 import bm25_topk

    lex_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            bm25_topk(docs, "doc_id", "text", terms, k=30).collect()
        )
    }
    qdf = spark.createDataFrame(
        [(-1, qvec)], "vec_id long, embedding array<float>"
    )
    vec_rank = {
        r["neighbor_id"]: r["rank"]
        for r in cosine_topk(emb, qdf, k=30).collect()
    }
    def rrf(i):
        s = 0.0
        if i in lex_rank:
            s += 1.0 / (60 + lex_rank[i])
        if i in vec_rank:
            s += 1.0 / (60 + vec_rank[i])
        return s
    want = sorted(
        set(lex_rank) | set(vec_rank), key=lambda i: (-rrf(i), i)
    )[:10]
    assert [r["id"] for r in out] == want
    for r in out:
        assert r["rrf"] == pytest.approx(rrf(r["id"]), rel=1e-12)


def test_hybrid_validation(spark):
    from feast_spark.operators.bm25 import hybrid_topk

    docs = spark.createDataFrame([Row(doc_id=1, text="a")])
    emb = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        hybrid_topk(docs, emb, ["a"], [1.0], k=10, fetch_k=5)


def test_bm25_batch_matches_single(spark):
    """Each query's batch result == the single-query bm25_topk run."""
    from feast_spark.operators.bm25 import bm25_topk_batch

    docs = load_table(spark, SF_MED, "documents")
    qs = spark.createDataFrame(
        [
            (1, ["spark", "window", "merge"]),
            (2, ["customer", "order"]),
            (3, ["SPARK"]),  # case-normalized inside the plan
        ],
        "query_id long, terms array<string>",
    )
    batch = bm25_topk_batch(docs, qs, k=10)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["bm25"])
        )
    for qid, terms in ((1, ["spark", "window", "merge"]),
                       (2, ["customer", "order"]), (3, ["spark"])):
        single = bm25_topk(docs, "doc_id", "text", terms, k=10).collect()
        want = [(i + 1, r["doc_id"], r["bm25"]) for i, r in enumerate(single)]
        rows = sorted(got[qid])
        assert [(a, b) for a, b, _ in rows] == [(a, b) for a, b, _ in want]
        for (_, _, s1), (_, _, s2) in zip(rows, want):
            assert s1 == pytest.approx(s2, rel=1e-12)


def test_hybrid_supports_string_embedding_ids(spark):
    from feast_spark.operators.bm25 import hybrid_topk

    docs = spark.createDataFrame(
        [Row(doc_id="d1", text="spark merge " * 10),
         Row(doc_id="d2", text="unrelated words " * 10)]
    )
    emb = spark.createDataFrame(
        [("d1", [1.0, 0.0]), ("d2", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    out = hybrid_topk(
        docs, emb, ["spark"], [1.0, 0.0], k=2, fetch_k=2,
        query_vec_id="__query__",
    ).collect()
    assert [r["id"] for r in out][0] == "d1"  # wins both channels


def test_hybrid_batch_matches_per_query_fusion(spark):
    """Each query's batch-hybrid result == the python RRF recomputation
    from its own two channel rankings."""
    from feast_spark.operators.bm25 import bm25_topk_batch, hybrid_topk_batch
    from feast_spark.operators.similarity import cosine_topk

    docs = load_table(spark, SF_MED, "documents")
    emb = load_table(spark, SF_MED, "embeddings").limit(500)
    qs = spark.createDataFrame(
        [
            (9001, ["spark", "merge"], [float((i * 7) % 13 - 6) for i in range(64)]),
            (9002, ["customer"], [float((i * 3) % 11 - 5) for i in range(64)]),
        ],
        "query_id long, terms array<string>, qvec array<float>",
    )
    out = hybrid_topk_batch(docs, emb, qs, k=8, fetch_k=25)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["id"], r["rrf"]))

    lexb = bm25_topk_batch(docs, qs, k=25)
    lex_ranks = {}
    for r in lexb.collect():
        lex_ranks.setdefault(r["query_id"], {})[r["doc_id"]] = r["rank"]
    vec = cosine_topk(
        emb,
        qs.select(F.col("query_id").alias("vec_id"),
                  F.col("qvec").alias("embedding")),
        k=25,
    )
    vec_ranks = {}
    for r in vec.collect():
        vec_ranks.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["rank"]

    for qid in (9001, 9002):
        lr, vr = lex_ranks.get(qid, {}), vec_ranks.get(qid, {})
        def rrf(i):
            return (1.0 / (60 + lr[i]) if i in lr else 0.0) + (
                1.0 / (60 + vr[i]) if i in vr else 0.0)
        want = sorted(set(lr) | set(vr), key=lambda i: (-rrf(i), i))[:8]
        rows = sorted(got[qid])
        assert [i for _, i, _ in rows] == want, qid
        for _, i, s in rows:
            assert s == pytest.approx(rrf(i), rel=1e-12)


def test_hybrid_handles_weird_column_names(spark):
    """emb id / vec column names with spaces and dots must not break
    the one-row query-vector DataFrame construction (structural schema,
    not a parsed DDL string)."""
    from feast_spark.operators.bm25 import hybrid_topk

    docs = spark.createDataFrame(
        [(1, "spark shuffle join"), (2, "parquet scan pruning")],
        "doc_id INT, text STRING",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "`vec id.x` INT, `my, vec` ARRAY<DOUBLE>",
    )
    out = hybrid_topk(
        docs, emb, ["shuffle"], [1.0, 0.0],
        emb_id_col="vec id.x", vec_col="my, vec", k=2,
    ).collect()
    assert len(out) == 2
    assert out[0]["id"] == 1


# ---------------------------------------------------------------------------
# Persisted BM25 index
# ---------------------------------------------------------------------------


def test_bm25_index_matches_inline(spark, tmp_path):
    """Index path == inline path, score for score — the identity that
    makes the index a pure caching layer."""
    from feast_spark.operators.bm25 import (
        bm25_index_topk,
        bm25_topk,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents")
    path = str(tmp_path / "bm25")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    for query in (["spark", "window", "merge"], ["parquet"], ["zzz_absent", "spark"]):
        inline = bm25_topk(docs, "doc_id", "text", query, k=12).collect()
        indexed = bm25_index_topk(spark, path, query, k=12).collect()
        assert [r["doc_id"] for r in indexed] == [r["doc_id"] for r in inline]
        assert [r["bm25"] for r in indexed] == pytest.approx(
            [r["bm25"] for r in inline], rel=1e-12
        )


def test_bm25_index_batch_matches_inline_batch(spark, tmp_path):
    from feast_spark.operators.bm25 import (
        bm25_index_topk_batch,
        bm25_topk_batch,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents")
    path = str(tmp_path / "bm25b")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    qs = spark.createDataFrame(
        [(1, ["spark", "merge"]), (2, ["parquet", "scan"]), (3, ["window"])],
        "query_id INT, terms ARRAY<STRING>",
    )
    inline = sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["bm25"])
        for r in bm25_topk_batch(docs, qs, k=7).collect()
    )
    indexed = sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["bm25"])
        for r in bm25_index_topk_batch(spark, path, qs, k=7).collect()
    )
    assert [t[:3] for t in indexed] == [t[:3] for t in inline]
    assert [t[3] for t in indexed] == pytest.approx([t[3] for t in inline])


def test_hybrid_index_matches_inline_hybrid(spark, tmp_path):
    from feast_spark.operators.bm25 import (
        build_bm25_index,
        hybrid_index_topk,
        hybrid_topk,
    )

    docs = load_table(spark, SF_MED, "documents")
    emb = load_table(spark, SF_MED, "embeddings")
    path = str(tmp_path / "bm25h")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    qvec = [float((i * 37) % 19) / 19.0 for i in range(
        len(emb.select("embedding").first()[0])
    )]
    inline = hybrid_topk(docs, emb, ["spark", "merge"], qvec, k=10).collect()
    indexed = hybrid_index_topk(
        spark, path, emb, ["spark", "merge"], qvec, k=10
    ).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in inline]


def test_bm25_index_scan_is_partition_pruned(spark, tmp_path):
    """The postings scan must prune to the query terms' bucket
    directories: PartitionFilters on bucket, no full-index read."""
    from feast_spark.operators.bm25 import (
        bm25_index_topk,
        build_bm25_index,
        term_bucket,
    )

    docs = load_table(spark, SF_MED, "documents")
    path = str(tmp_path / "bm25p")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    plan = bm25_index_topk(
        spark, path, ["spark", "merge"], k=5
    )._jdf.queryExecution().executedPlan().toString()
    b1, b2 = term_bucket("spark", 16), term_bucket("merge", 16)
    assert "bucket IN" in plan or f"bucket" in plan
    # the pruned scan mentions only the query buckets
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters in plan:\n{plan[:2000]}"
    assert m.group(1).strip(), "PartitionFilters empty — full index scan"
    for b in {b1, b2}:
        assert str(b) in m.group(1)


def test_bm25_index_empty_and_unbuilt(spark, tmp_path):
    from feast_spark.operators.bm25 import bm25_index_topk

    with pytest.raises(ValueError, match="no BM25 index"):
        bm25_index_topk(spark, str(tmp_path / "missing"), ["x"]).collect()


def test_hybrid_index_batch_matches_inline_batch(spark, tmp_path):
    """hybrid_index_topk_batch == hybrid_topk_batch on the same corpus
    and query batch: the lexical channel swap (persisted index vs
    corpus scan) must not change a single fused row."""
    from feast_spark.operators.bm25 import (
        build_bm25_index,
        hybrid_index_topk_batch,
        hybrid_topk_batch,
    )

    docs = load_table(spark, SF_MED, "documents")
    emb = load_table(spark, SF_MED, "embeddings")
    path = str(tmp_path / "bm25hb")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    dim = len(emb.select("embedding").first()[0])
    qs = spark.createDataFrame(
        [
            (
                -1 - i,
                ["spark", "merge", "scan"][i : i + 2],
                [float((j * 37 + i * 11) % 19) / 19.0 for j in range(dim)],
            )
            for i in range(2)
        ],
        "query_id BIGINT, terms ARRAY<STRING>, qvec ARRAY<DOUBLE>",
    )
    inline = hybrid_topk_batch(docs, emb, qs, k=8).collect()
    indexed = hybrid_index_topk_batch(spark, path, emb, qs, k=8).collect()
    assert sorted(map(tuple, indexed), key=lambda t: (t[0], t[5])) == sorted(
        map(tuple, inline), key=lambda t: (t[0], t[5])
    )
    assert len(indexed) == 16  # k rows per query


def _build_hybrid_indexes(spark, tmp_path, n_centroids=8):
    from feast_spark.operators.bm25 import build_bm25_index
    from feast_spark.operators.similarity import build_ivf_index

    docs = load_table(spark, SF_MED, "documents")
    emb = load_table(spark, SF_MED, "embeddings")
    lex_path = str(tmp_path / "bm25ai")
    vec_path = str(tmp_path / "ivfai")
    build_bm25_index(docs, lex_path, "doc_id", "text", n_term_buckets=16)
    build_ivf_index(emb, vec_path, n_centroids=n_centroids, iters=2)
    return docs, emb, lex_path, vec_path


def test_hybrid_all_index_matches_brute_at_full_probe(spark, tmp_path):
    """With vec_index_path set and n_probe >= the index's centroid
    count, the IVF vector channel is exactly the brute cosine scan, so
    the all-index hybrid must reproduce the brute hybrid row-for-row —
    and must work with embeddings=None (no corpus frame needed at
    serving time)."""
    from feast_spark.operators.bm25 import hybrid_index_topk

    docs, emb, lex_path, vec_path = _build_hybrid_indexes(
        spark, tmp_path, n_centroids=8
    )
    dim = len(emb.select("embedding").first()[0])
    qvec = [float((i * 37) % 19) / 19.0 for i in range(dim)]
    brute = hybrid_index_topk(
        spark, lex_path, emb, ["spark", "merge"], qvec, k=10
    ).collect()
    indexed = hybrid_index_topk(
        spark, lex_path, None, ["spark", "merge"], qvec, k=10,
        vec_index_path=vec_path, n_probe=8,
    ).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in brute]


def test_hybrid_all_index_batch_matches_brute_at_full_probe(spark, tmp_path):
    from feast_spark.operators.bm25 import hybrid_index_topk_batch

    docs, emb, lex_path, vec_path = _build_hybrid_indexes(
        spark, tmp_path, n_centroids=8
    )
    dim = len(emb.select("embedding").first()[0])
    qs = spark.createDataFrame(
        [
            (
                -1 - i,
                ["spark", "merge", "scan"][i : i + 2],
                [float((j * 37 + i * 11) % 19) / 19.0 for j in range(dim)],
            )
            for i in range(2)
        ],
        "query_id BIGINT, terms ARRAY<STRING>, qvec ARRAY<DOUBLE>",
    )
    brute = hybrid_index_topk_batch(spark, lex_path, emb, qs, k=8).collect()
    indexed = hybrid_index_topk_batch(
        spark, lex_path, None, qs, k=8, vec_index_path=vec_path, n_probe=8
    ).collect()
    key = lambda t: (t[0], t[5])
    assert sorted(map(tuple, indexed), key=key) == sorted(
        map(tuple, brute), key=key
    )


def test_hybrid_all_index_both_channels_pruned(spark, tmp_path):
    """The all-index hybrid plan must prune BOTH persisted scans: the
    postings read down to the query terms' bucket dirs and the IVF
    vectors read down to the probed cells (static ``cell IN`` filter —
    the probed-cell set is collected bounded-by-C, so the pruning
    never depends on Catalyst choosing to insert a DPP subquery) — no
    full-corpus scan on either channel."""
    import re

    from feast_spark.operators.bm25 import hybrid_index_topk

    docs, emb, lex_path, vec_path = _build_hybrid_indexes(
        spark, tmp_path, n_centroids=8
    )
    dim = len(emb.select("embedding").first()[0])
    qvec = [float((i * 37) % 19) / 19.0 for i in range(dim)]
    df = hybrid_index_topk(
        spark, lex_path, None, ["spark", "merge"], qvec, k=10,
        vec_index_path=vec_path, n_probe=3,
    )
    df.collect()  # AQE: finalize the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in f and f.strip() for f in filters), plan[:2000]
    cell_filters = [f for f in filters if "cell" in f and f.strip()]
    assert cell_filters, plan[:2000]
    # exactly n_probe=3 cells in the IN-list, not all 8
    m = re.search(r"cell[^ ]* IN \(([^)]*)\)", " ".join(cell_filters))
    assert m, cell_filters
    assert len(m.group(1).split(",")) == 3, m.group(1)


def test_hybrid_index_requires_some_vector_source(spark, tmp_path):
    from feast_spark.operators.bm25 import (
        hybrid_index_topk,
        hybrid_index_topk_batch,
    )

    with pytest.raises(ValueError, match="embeddings or vec_index_path"):
        hybrid_index_topk(spark, str(tmp_path), None, ["x"], [0.0])
    with pytest.raises(ValueError, match="embeddings or vec_index_path"):
        hybrid_index_topk_batch(spark, str(tmp_path), None, None)


def test_bm25_index_stats(spark, tmp_path):
    from feast_spark.operators.bm25 import bm25_index_stats, build_bm25_index

    docs = load_table(spark, SF_MED, "documents")
    path = str(tmp_path / "bm25s")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=8)
    rows = bm25_index_stats(spark, path).collect()
    assert 1 <= len(rows) <= 8
    total = rows[0]["total_postings"]
    assert total == sum(r["n_postings"] for r in rows)
    assert all(r["skew_ratio"] >= 1.0 for r in rows)
    assert rows[0]["n_docs"] == docs.count()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no BM25 index"):
        bm25_index_stats(spark, str(tmp_path / "nope")).collect()


def test_bm25_index_batch_null_terms(spark, tmp_path):
    """NULL / empty elements inside a terms array are dropped — the
    same treatment the inline batch path gives them (null never
    equi-joins a posting) — instead of crashing the driver-side term
    collection; an all-null batch raises the documented ValueError."""
    from feast_spark.operators.bm25 import (
        bm25_index_topk_batch,
        bm25_topk_batch,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents")
    path = str(tmp_path / "bm25n")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    qs = spark.createDataFrame(
        [(1, ["spark", None, ""]), (2, ["merge"])],
        "query_id INT, terms ARRAY<STRING>",
    )
    inline = sorted(
        (r["query_id"], r["doc_id"], r["rank"])
        for r in bm25_topk_batch(docs, qs, k=5).collect()
    )
    indexed = sorted(
        (r["query_id"], r["doc_id"], r["rank"])
        for r in bm25_index_topk_batch(spark, path, qs, k=5).collect()
    )
    assert indexed == inline

    all_null = spark.createDataFrame(
        [(1, [None])], "query_id INT, terms ARRAY<STRING>"
    )
    with pytest.raises(ValueError, match="non-empty term"):
        bm25_index_topk_batch(spark, path, all_null, k=5)


def test_bm25_index_append_equals_rebuild(spark, tmp_path):
    """append(B) onto index(A) scores identically to a rebuild over
    A∪B — exact-long per-epoch stats sum to the corpus stats, and df_t
    comes from the combined postings, so nothing drifts."""
    from pyspark.sql import functions as F

    from feast_spark.operators.bm25 import (
        bm25_index_append,
        bm25_index_stats,
        bm25_index_topk,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents")
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    inc, reb = str(tmp_path / "inc"), str(tmp_path / "reb")
    build_bm25_index(a, inc, "doc_id", "text", n_term_buckets=16)
    bm25_index_append(spark, inc, b)
    build_bm25_index(docs, reb, "doc_id", "text", n_term_buckets=16)
    for query in (["spark", "merge"], ["parquet", "scan", "window"]):
        got = bm25_index_topk(spark, inc, query, k=12).collect()
        want = bm25_index_topk(spark, reb, query, k=12).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
        assert [r["bm25"] for r in got] == pytest.approx(
            [r["bm25"] for r in want], rel=1e-12
        )
    srow = bm25_index_stats(spark, inc).collect()[0]
    assert srow["n_docs"] == docs.count()
    assert srow["n_epochs"] == 2


def test_bm25_index_compact_and_vacuum(spark, tmp_path):
    """Compaction merges epochs with identical scores; vacuum removes
    exactly the superseded + orphaned dirs and the live epoch keeps
    serving."""
    import json
    import os

    from pyspark.sql import functions as F

    from feast_spark.operators.bm25 import (
        bm25_index_append,
        bm25_index_compact,
        bm25_index_topk,
        bm25_index_vacuum,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents")
    path = str(tmp_path / "cmp")
    build_bm25_index(
        docs.filter(F.col("doc_id") % 2 == 0), path, "doc_id", "text",
        n_term_buckets=16,
    )
    bm25_index_append(spark, path, docs.filter(F.col("doc_id") % 2 == 1))
    before = bm25_index_topk(spark, path, ["spark", "merge"], k=10).collect()

    os.makedirs(f"{path}/postings/epoch=7")  # crashed-writer orphan

    bm25_index_compact(spark, path)
    with open(f"{path}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["epochs"] == [8]  # one epoch, numbered past the orphan
    after = bm25_index_topk(spark, path, ["spark", "merge"], k=10).collect()
    assert [r["doc_id"] for r in after] == [r["doc_id"] for r in before]
    assert [r["bm25"] for r in after] == pytest.approx(
        [r["bm25"] for r in before], rel=1e-12
    )

    removed = bm25_index_vacuum(path)
    assert removed["postings"] == ["epoch=0", "epoch=1", "epoch=7"]
    assert removed["stats"] == ["epoch=0", "epoch=1"]
    still = bm25_index_topk(spark, path, ["spark", "merge"], k=10).collect()
    assert [r["doc_id"] for r in still] == [r["doc_id"] for r in before]


def test_bm25_index_empty_and_legacy_guards(spark, tmp_path):
    """Empty builds are refused (a zero-row partitioned write would
    commit an unreadable epoch), empty appends are a no-op, and a
    foreign/legacy manifest raises the friendly ValueError instead of
    a KeyError."""
    import json

    from pyspark.sql import functions as F

    from feast_spark.operators.bm25 import (
        bm25_index_append,
        bm25_index_topk,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents")
    empty = docs.filter(F.lit(False))
    with pytest.raises(ValueError, match="no postings"):
        build_bm25_index(empty, str(tmp_path / "e"), "doc_id", "text")
    # non-empty corpus whose texts all tokenize to nothing: same guard
    blank = docs.limit(3).withColumn("text", F.lit("   "))
    with pytest.raises(ValueError, match="no postings"):
        build_bm25_index(blank, str(tmp_path / "b"), "doc_id", "text")

    path = str(tmp_path / "idx")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=8)
    before = bm25_index_topk(spark, path, ["spark"], k=5).collect()
    bm25_index_append(spark, path, empty)  # no-op, not an error
    with open(f"{path}/_MANIFEST.json") as f:
        assert len(json.load(f)["epochs"]) == 1  # no epoch added
    assert bm25_index_topk(spark, path, ["spark"], k=5).collect() == before

    legacy = tmp_path / "legacy"
    legacy.mkdir()
    (legacy / "_MANIFEST.json").write_text(
        json.dumps({"current": "v_00000001", "meta": {}})
    )
    with pytest.raises(ValueError, match="no BM25 index"):
        bm25_index_topk(spark, str(legacy), ["spark"], k=5)


def test_bm25_index_batch_semijoin_path_matches_inlist(spark, tmp_path):
    """Past max_terms_inlist the batch path stops collecting terms
    driver-side (only bucket ids, bounded by n_term_buckets) and
    filters postings with a broadcast semi-join — results must be
    identical to the IN-list path, and the bucket partition pruning
    must survive."""
    import re

    from feast_spark.operators.bm25 import (
        bm25_index_topk_batch,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents")
    path = str(tmp_path / "bm25sj")
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=16)
    qs = spark.createDataFrame(
        [(1, ["spark", "merge"]), (2, ["parquet", "scan", "window"])],
        "query_id INT, terms ARRAY<STRING>",
    )
    inlist = bm25_index_topk_batch(spark, path, qs, k=7).collect()
    semi_df = bm25_index_topk_batch(spark, path, qs, k=7, max_terms_inlist=1)
    semi = semi_df.collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, semi), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, inlist), key=lambda t: (t[0], t[3])
    )
    plan = semi_df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1) and m.group(1).strip(), plan[:1500]


def test_hybrid_all_index_string_ids(spark, tmp_path):
    """With embeddings=None the query frame's id/vec types come from
    the IVF INDEX schema, not a LongType guess — a string-id index must
    keep its vector channel alive (a bigint-vs-string self-exclusion
    filter would NULL out every candidate and silently degrade the
    hybrid to lexical-only)."""
    from feast_spark.operators.bm25 import build_bm25_index, hybrid_index_topk
    from feast_spark.operators.similarity import build_ivf_index

    docs = spark.createDataFrame(
        [("d1", "spark merge " * 10), ("d2", "unrelated words " * 10)],
        "doc_id STRING, text STRING",
    )
    emb = spark.createDataFrame(
        [("d1", [1.0, 0.0]), ("d2", [0.0, 1.0]), ("d3", [0.9, 0.1])],
        "vec_id STRING, embedding ARRAY<DOUBLE>",
    )
    lex_path = str(tmp_path / "lex")
    vec_path = str(tmp_path / "vec")
    build_bm25_index(docs, lex_path, "doc_id", "text", n_term_buckets=4)
    build_ivf_index(emb, vec_path, n_centroids=2, iters=2)
    out = hybrid_index_topk(
        spark, lex_path, None, ["spark"], [1.0, 0.0], k=3,
        vec_index_path=vec_path, n_probe=2, query_vec_id="__q__",
    ).collect()
    # the vector channel contributed: d3 has no lexical hit at all but
    # ranks by cosine, so it must appear with a vec_rank
    by_id = {r["id"]: r for r in out}
    assert "d3" in by_id and by_id["d3"]["vec_rank"] is not None
    assert by_id["d1"]["vec_rank"] is not None  # wins both channels


def test_hybrid_ivfpq_channel(spark, tmp_path):
    """vec_index_kind='ivfpq' serves the vector channel from PQ codes:
    the channel's ranks must equal the direct ivfpq_index_topk ADC
    ordering, fusion must behave (a doc winning both channels ranks
    first; a vec-only doc appears), and unknown kinds raise."""
    from feast_spark.operators.bm25 import (
        build_bm25_index,
        hybrid_index_topk,
        hybrid_index_topk_batch,
    )
    from feast_spark.operators.pq_index import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )

    docs = load_table(spark, SF_MED, "documents")
    emb = load_table(spark, SF_MED, "embeddings")
    lex_path = str(tmp_path / "lex")
    vec_path = str(tmp_path / "pq")
    build_bm25_index(docs, lex_path, "doc_id", "text", n_term_buckets=16)
    build_ivfpq_index(emb, vec_path, n_centroids=8, iters=2)
    dim = len(emb.select("embedding").first()[0])
    qvec = [float((i * 37) % 19) / 19.0 for i in range(dim)]

    out = hybrid_index_topk(
        spark, lex_path, None, ["spark", "merge"], qvec, k=10,
        vec_index_path=vec_path, n_probe=8, vec_index_kind="ivfpq",
    ).collect()
    assert len(out) == 10
    # the channel ranks == the direct ADC ordering
    qdf = spark.createDataFrame(
        [(-1, qvec)], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    adc = ivfpq_index_topk(spark, vec_path, qdf, n_probe=8, k=50).collect()
    want_order = [
        r["neighbor_id"]
        for r in sorted(adc, key=lambda r: (r["adc_dist"], r["neighbor_id"]))
    ]
    got_vec = {
        r["id"]: r["vec_rank"] for r in out if r["vec_rank"] is not None
    }
    for doc_id, rank in got_vec.items():
        assert want_order[rank - 1] == doc_id

    # batch twin agrees with the single-query call for one query
    qs = spark.createDataFrame(
        [(-1, ["spark", "merge"], qvec)],
        "query_id BIGINT, terms ARRAY<STRING>, qvec ARRAY<DOUBLE>",
    )
    batch = hybrid_index_topk_batch(
        spark, lex_path, None, qs, k=10,
        vec_index_path=vec_path, n_probe=8, vec_index_kind="ivfpq",
    ).collect()
    assert sorted(
        (r["id"], r["lex_rank"], r["vec_rank"], round(r["rrf"], 12))
        for r in batch
    ) == sorted(
        (r["id"], r["lex_rank"], r["vec_rank"], round(r["rrf"], 12))
        for r in out
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="vec_index_kind"):
        hybrid_index_topk(
            spark, lex_path, None, ["spark"], qvec,
            vec_index_path=vec_path, vec_index_kind="hnsw",
        )


def test_stopword_index_keeps_other_scores_bit_identical(spark, tmp_path):
    """stopwords= drops postings only — doc lengths still count the
    stopword tokens, so every non-stopword query scores BIT-IDENTICAL
    to an unfiltered index; the stopword itself scores as
    absent-everywhere (empty top-k)."""
    from feast_spark.operators.bm25 import (
        bm25_index_append,
        bm25_index_topk,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents").filter(
        F.col("doc_id") < 200
    )
    plain, stopped = str(tmp_path / "plain"), str(tmp_path / "stopped")
    build_bm25_index(
        docs.filter(F.col("doc_id") < 150), plain, "doc_id", "text",
        n_term_buckets=8,
    )
    build_bm25_index(
        docs.filter(F.col("doc_id") < 150), stopped, "doc_id", "text",
        n_term_buckets=8, stopwords=["the", "And", "of", ""],
    )
    # appends apply the committed list automatically
    tail = docs.filter(F.col("doc_id") >= 150)
    bm25_index_append(spark, plain, tail)
    bm25_index_append(spark, stopped, tail)

    q = ["spark", "merge", "window"]
    a = [tuple(r) for r in bm25_index_topk(spark, plain, q, k=20).collect()]
    b = [tuple(r) for r in bm25_index_topk(spark, stopped, q, k=20).collect()]
    assert a == b  # bit-identical scores, not approximately

    # a query CONTAINING a stopword scores like the query without it
    # (the stopword contributes nothing — its postings don't exist)
    with_stop = [
        tuple(r)
        for r in bm25_index_topk(spark, stopped, q + ["the"], k=20).collect()
    ]
    assert with_stop == b

    # stopword postings truly absent from storage
    from feast_spark.operators.bm25 import _index_postings

    postings, _, _, _ = _index_postings(spark, stopped, ["the"])
    assert postings.count() == 0

    # an all-stopword query returns an empty top-k, not an error
    assert bm25_index_topk(spark, stopped, ["the", "of"], k=5).count() == 0


def test_append_all_stopword_slice_still_counts_docs(spark, tmp_path):
    """A non-empty slice whose every token is a committed stopword has
    zero postings but n_docs/total_len > 0: the append must commit the
    stats row anyway (an epoch whose postings dir holds no part files),
    or the stopword index's n_docs/avg_len — and therefore EVERY
    non-stopword score — silently drifts off the unfiltered index, and
    the hybrid pair desyncs (the vector side appends those docs)."""
    from feast_spark.operators.bm25 import (
        bm25_index_append,
        bm25_index_compact,
        bm25_index_stats,
        bm25_index_topk,
        build_bm25_index,
    )

    base = spark.createDataFrame(
        [(1, "grape melon kiwi"), (2, "melon kiwi kiwi the")],
        "doc_id BIGINT, text STRING",
    )
    tail = spark.createDataFrame(
        [(3, "the the the"), (4, "   ")], "doc_id BIGINT, text STRING"
    )
    stopped = str(tmp_path / "stopped")
    build_bm25_index(base, stopped, n_term_buckets=4, stopwords=["the"])
    bm25_index_append(spark, stopped, tail)  # zero-posting epoch

    # the unfiltered contract twin: full rebuild over the union
    plain = str(tmp_path / "plain")
    build_bm25_index(base.unionByName(tail), plain, n_term_buckets=4)
    want = [
        tuple(r) for r in bm25_index_topk(spark, plain, ["kiwi"], k=10).collect()
    ]
    got = [
        tuple(r)
        for r in bm25_index_topk(spark, stopped, ["kiwi"], k=10).collect()
    ]
    assert got == want  # bit-identical, including the n_docs=4 idf

    st = bm25_index_stats(spark, stopped).first()
    assert st["n_docs"] == 4 and st["n_epochs"] == 2

    # an EMPTY slice is still a no-op (no epoch, no manifest flip)
    bm25_index_append(spark, stopped, tail.limit(0))
    assert bm25_index_stats(spark, stopped).first()["n_epochs"] == 2

    # compact folds the zero-posting epoch without error and keeps
    # scores + stats identical
    bm25_index_compact(spark, stopped)
    st2 = bm25_index_stats(spark, stopped).first()
    assert st2["n_docs"] == 4 and st2["n_epochs"] == 1
    assert [
        tuple(r)
        for r in bm25_index_topk(spark, stopped, ["kiwi"], k=10).collect()
    ] == want


def test_dfreq_sidecar_serving_skips_postings_aggregate(spark, tmp_path):
    """r17: build/append write a per-epoch (term, df_t) sidecar and
    serving sums it instead of re-aggregating postings per query.

    Pins (a) the sidecar values equal a postings count exactly, so
    scores are bit-identical to a legacy index without the sidecar,
    and (b) the plan win: the sidecar-served executed plan scans the
    postings parquet ONCE and takes df_t from a LocalTableScan, while
    the legacy path scans postings twice (once for the df_t
    aggregate)."""
    import re

    from feast_spark.io.epochs import read_manifest
    from feast_spark.io.fs import LocalFS
    from feast_spark.operators.bm25 import (
        _bm25_commit,
        _dfreq_terms,
        bm25_index_append,
        bm25_index_topk,
        bm25_index_topk_batch,
        build_bm25_index,
    )

    docs = load_table(spark, SF_MED, "documents")
    path = str(tmp_path / "idx")
    build_bm25_index(
        docs.filter(F.col("doc_id") % 3 != 0), path, "doc_id", "text",
        n_term_buckets=16,
    )
    bm25_index_append(spark, path, docs.filter(F.col("doc_id") % 3 == 0))
    fs = LocalFS()
    manifest = read_manifest(path, fs, required_keys=("epochs",), kind="index")
    assert sorted(manifest["dfreq_epochs"]) == sorted(manifest["epochs"])

    # (a) sidecar df_t == a count over the postings, term by term
    terms = ["spark", "merge", "window", "parquet"]
    from feast_spark.operators.bm25 import _index_postings, term_bucket

    buckets = sorted({term_bucket(t, 16) for t in terms})
    dmap = _dfreq_terms(path, manifest["epochs"], buckets, terms, fs)
    tf, _, _, dfreq = _index_postings(spark, path, terms)
    assert dfreq is not None
    counted = {
        r["term"]: r["df_t"]
        for r in tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t")).collect()
    }
    assert dmap == counted

    # legacy twin: same data, manifest stripped of dfreq_epochs, so
    # serving falls back to the per-query postings aggregate
    legacy = str(tmp_path / "legacy")
    build_bm25_index(
        docs.filter(F.col("doc_id") % 3 != 0), legacy, "doc_id", "text",
        n_term_buckets=16,
    )
    bm25_index_append(spark, legacy, docs.filter(F.col("doc_id") % 3 == 0))
    lman = read_manifest(legacy, fs, required_keys=("epochs",), kind="index")
    lman.pop("dfreq_epochs")
    _bm25_commit(legacy, fs, lman)
    _, _, _, ldfreq = _index_postings(spark, legacy, terms)
    assert ldfreq is None

    got = bm25_index_topk(spark, path, terms, k=15)
    want = bm25_index_topk(spark, legacy, terms, k=15)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]  # bit-identical scores

    # (b) plan shapes: one postings scan + LocalTableScan df_t vs two
    # (both plans read ONLY postings parquet: stats/df_t are literal
    # LocalRelations on the sidecar path)
    def postings_scans(df, root):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]  # AQE echoes both
        return len(re.findall(r"Scan parquet", final)), plan

    n_sidecar, plan_sidecar = postings_scans(
        bm25_index_topk(spark, path, terms, k=15), path
    )
    n_legacy, _ = postings_scans(
        bm25_index_topk(spark, legacy, terms, k=15), legacy
    )
    assert n_sidecar == 1, plan_sidecar[:3000]
    assert n_legacy == 2
    assert "LocalTableScan" in plan_sidecar

    # batch serving takes the same shortcut (sidecar scan, zero
    # aggregates over the postings relation)
    qdf = spark.createDataFrame(
        [(1, ["spark", "merge"]), (2, ["parquet", "window"])],
        "query_id INT, terms ARRAY<STRING>",
    )
    gb = bm25_index_topk_batch(spark, path, qdf, k=5)
    wb = bm25_index_topk_batch(spark, legacy, qdf, k=5)
    assert sorted(map(tuple, gb.collect())) == sorted(map(tuple, wb.collect()))
