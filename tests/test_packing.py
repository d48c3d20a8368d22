"""Sequence packing / weighted sampling / corpus mixing.

Oracle: DuckDB reproduces every md5-derived ordering and draw
bit-for-bit (the same engine-portable idiom the driver's hash_split
oracle uses), so all three operators are value-checked, not just
shape-checked.
"""

import pytest
from pyspark.sql import functions as F

from feast_spark.functions.text import token_count
from feast_spark.operators.packing import (
    corpus_mix,
    pack_sequences,
    weighted_sample,
)

# DuckDB twins of feast_spark idioms
_TOK = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
)
_H32 = "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
_ORD = "md5(CAST(doc_id AS VARCHAR))"


@pytest.fixture(scope="module")
def docs(spark):
    from tests.conftest import SF_MED

    return (
        spark.read.parquet(f"{SF_MED}/documents.parquet")
        .withColumn("n_tokens", token_count(F.col("text")).cast("long"))
    )


def test_pack_sequences_oracle(spark, duck, docs):
    out = pack_sequences(
        docs, "doc_id", "n_tokens", max_tokens=512, n_shards=8
    ).select("doc_id", "shard", "seq_id", "seq_pos")
    got = {(r.doc_id, r.shard, r.seq_id, r.seq_pos) for r in out.collect()}
    want = set(
        map(
            tuple,
            duck.execute(
                f"""
        WITH d AS (
          SELECT doc_id, {_TOK} AS n_tokens,
                 {_H32} % 8 AS shard, {_ORD} AS ord
          FROM documents
        ), c AS (
          SELECT doc_id, shard, ord,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY ord, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 // 512 AS bin
          FROM d
        )
        SELECT doc_id, shard, CONCAT(shard, '-', bin) AS seq_id,
               ROW_NUMBER() OVER (
                 PARTITION BY shard, bin ORDER BY ord, doc_id) - 1 AS pos
        FROM c
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_pack_sequences_invariants(spark, docs):
    max_tokens = 256
    out = pack_sequences(docs, "doc_id", "n_tokens", max_tokens, n_shards=8)
    # every row assigned, nothing duplicated
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    stats = (
        out.groupBy("seq_id")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max("n_tokens").alias("biggest"),
            F.count("*").alias("n"),
            F.max("seq_pos").alias("maxpos"),
        )
        .collect()
    )
    for r in stats:
        # overflow bounded by the largest member document
        assert r.total <= max_tokens + r.biggest - 1
        # positions are 0..n-1
        assert r.maxpos == r.n - 1
    # deterministic under repartitioning
    again = pack_sequences(
        docs.repartition(7), "doc_id", "n_tokens", max_tokens, n_shards=8
    )
    a = {(r.doc_id, r.seq_id, r.seq_pos) for r in out.collect()}
    b = {(r.doc_id, r.seq_id, r.seq_pos) for r in again.collect()}
    assert a == b


def test_weighted_sample_oracle(spark, duck, docs):
    out = weighted_sample(docs, "doc_id", "n_chars", k=100)
    got = {r.doc_id for r in out.select("doc_id").collect()}
    want = {
        r[0]
        for r in duck.execute(
            f"""
        SELECT doc_id FROM (
          SELECT doc_id,
                 -ln(({_H32} + 1.0) / 4294967296.0) / n_chars AS key
          FROM documents WHERE n_chars > 0
        ) ORDER BY key, doc_id LIMIT 100
        """
        ).fetchall()
    }
    assert len(got) == 100
    assert got == want


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -5.0), (4, None), (5, 3.0)],
        "id long, w double",
    )
    out = weighted_sample(df, "id", "w", k=10)
    assert {r.id for r in out.collect()} == {1, 5}


def test_corpus_mix_oracle(spark, duck, docs):
    budgets = {"src0": 800, "src1": 400, "src2": 10_000, "src3": 0}
    n_shards = 4
    out = corpus_mix(docs, "doc_id", "n_tokens", "source", budgets, n_shards)
    got = {r.doc_id for r in out.select("doc_id").collect()}
    cases_b = " ".join(
        f"WHEN '{s}' THEN {b // n_shards}" for s, b in budgets.items()
    )
    cases_r = " ".join(
        f"WHEN '{s}' THEN {b % n_shards}" for s, b in budgets.items()
    )
    want = {
        r[0]
        for r in duck.execute(
            f"""
        WITH d AS (
          SELECT doc_id, source, {_TOK} AS n_tokens,
                 {_H32} % {n_shards} AS shard, {_ORD} AS ord
          FROM documents
          WHERE source IN ({",".join(f"'{s}'" for s in budgets)})
        ), c AS (
          SELECT doc_id, source,
                 SUM(n_tokens) OVER (
                   PARTITION BY source, shard ORDER BY ord, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 (CASE source {cases_b} END)
                 + (CASE WHEN shard < (CASE source {cases_r} END)
                         THEN 1 ELSE 0 END) AS budget
          FROM d
        )
        SELECT doc_id FROM c WHERE cum <= budget
        """
        ).fetchall()
    }
    assert got == want
    # and the budget is actually enforced
    totals = {
        r.source: r.total
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("total")).collect()
    }
    for s, total in totals.items():
        assert total <= budgets[s]
    assert "src3" not in totals
    assert "src4" not in totals  # unbudgeted source dropped
    # src2's budget exceeds its corpus: everything survives
    assert out.filter(F.col("source") == "src2").count() == 25


def test_corpus_mix_validation(spark, docs):
    with pytest.raises(ValueError):
        corpus_mix(docs, "doc_id", "n_tokens", "source", {})
    with pytest.raises(ValueError):
        corpus_mix(docs, "doc_id", "n_tokens", "source", {"src0": -1})
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n_tokens", 0)
    with pytest.raises(ValueError):
        weighted_sample(docs, "doc_id", "n_chars", 0)


def test_chunk_documents_oracle(spark, duck, docs):
    from feast_spark.operators.packing import chunk_documents

    out = chunk_documents(
        docs, "doc_id", "text", chunk_tokens=64, overlap=16
    ).select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
    got = {
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens)
        for r in out.collect()
    }
    want = set(
        map(
            tuple,
            duck.execute(
                """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
          FROM t
        )
        SELECT doc_id, start // 48 AS chunk_id,
               array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text,
               CAST(len(toks[start + 1 : start + 64]) AS BIGINT) AS n
        FROM s
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_chunk_documents_edges(spark):
    from feast_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "   "), (4, "x")],
        "id long, text string",
    )
    out = chunk_documents(df, "id", "text", chunk_tokens=2, overlap=1)
    rows = {(r.id, r.chunk_id): (r.chunk_text, r.n_chunk_tokens) for r in out.collect()}
    # doc 1: starts 0,1,2,3,4 (stride 1) -> 5 chunks, last is just "e"
    assert rows[(1, 0)] == ("a b", 2)
    assert rows[(1, 3)] == ("d e", 2)
    assert rows[(1, 4)] == ("e", 1)
    # blank docs vanish; single-token doc yields one chunk
    assert not any(k[0] in (2, 3) for k in rows)
    assert rows[(4, 0)] == ("x", 1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, "id", "text", chunk_tokens=2, overlap=2)
    with _pytest.raises(ValueError):
        chunk_documents(df, "id", "text", chunk_tokens=0)


def test_pack_sequences_group_cols_never_straddle(spark, docs):
    """group_cols columns join every window partition and prefix
    seq_id, so a sequence holds exactly one group value."""
    from feast_spark.functions.split import hash_split

    split = hash_split(docs.select("doc_id", "n_tokens"), "doc_id",
                       {"train": 0.8, "val": 0.2})
    packed = pack_sequences(
        split, "doc_id", "n_tokens", 512, group_cols=["split"]
    ).collect()
    seqs = {}
    for r in packed:
        seqs.setdefault(r["seq_id"], set()).add(r["split"])
    assert all(len(v) == 1 for v in seqs.values())
    # group value is embedded in the id -> ids unique across groups
    assert all(r["seq_id"].startswith(f"{r['split']}-") for r in packed)
    # positions still gapless within each sequence
    pos = {}
    for r in packed:
        pos.setdefault(r["seq_id"], []).append(r["seq_pos"])
    assert all(sorted(v) == list(range(len(v))) for v in pos.values())


def test_pack_and_mix_reject_bad_token_counts(spark):
    """NULL / non-positive token counts would silently corrupt the
    cumsum budgeting — the plan must raise, not drop or mispack."""
    import pytest
    from pyspark.sql import Row, utils as sql_utils

    bad_null = spark.createDataFrame(
        [Row(id=1, n_tokens=10, source="a"), Row(id=2, n_tokens=None, source="a")]
    )
    bad_neg = spark.createDataFrame(
        [Row(id=1, n_tokens=10, source="a"), Row(id=2, n_tokens=-5, source="a")]
    )
    for bad in (bad_null, bad_neg):
        with pytest.raises(Exception, match="positive token count"):
            pack_sequences(bad, "id", "n_tokens", 64).collect()
        with pytest.raises(Exception, match="positive token count"):
            corpus_mix(bad, "id", "n_tokens", "source", {"a": 100}).collect()


def test_cap_per_group_quality_order_and_determinism(spark):
    from pyspark.sql import Row

    from feast_spark.operators.packing import cap_per_group

    rows = [
        Row(doc_id=i, domain=f"d{i % 3}", score=float((i * 7) % 10))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows)
    capped = cap_per_group(df, "domain", 4, order_col="score")
    got = capped.collect()
    # exactly 4 per domain, and they are the top-4 by score
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r)
    assert {d: len(v) for d, v in by_dom.items()} == {"d0": 4, "d1": 4, "d2": 4}
    for d, kept in by_dom.items():
        all_scores = sorted(
            (r.score for r in rows if r.domain == d), reverse=True
        )
        assert sorted((r["score"] for r in kept), reverse=True) == all_scores[:4]
    # rerun keeps the identical subset (md5 tie-break, no randomness)
    again = cap_per_group(df, "domain", 4, order_col="score").collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)


def test_cap_per_group_no_order_is_stable_hash(spark):
    from pyspark.sql import Row

    from feast_spark.operators.packing import cap_per_group

    df = spark.createDataFrame([Row(doc_id=i, g="x") for i in range(20)])
    a = sorted(r["doc_id"] for r in cap_per_group(df, "g", 5).collect())
    b = sorted(r["doc_id"] for r in cap_per_group(df, "g", 5).collect())
    assert a == b and len(a) == 5
    import pytest

    with pytest.raises(ValueError, match="max_per_group"):
        cap_per_group(df, "g", 0)
