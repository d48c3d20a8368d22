"""Char n-gram LM train/score vs a DuckDB differential oracle: same
normalization, same deterministic top-V cut (count desc, ngram asc),
same add-half OOV floor, same mean-logprob arithmetic.
"""

import math

import pytest
from pyspark.sql import functions as F

from feast_spark.functions.lm import char_ngrams, score_char_lm, train_char_lm
from tests.conftest import SF_MED

_NGRAMS = (
    "list_transform("
    "  range(1, greatest(length(t) - 2, 0) + 1),"
    "  i -> substr(t, i, 3))"
)
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def test_char_ngrams_basic(spark):
    df = spark.createDataFrame([("Ab  cD",), ("x",), ("",)], "text string")
    rows = df.select(char_ngrams(F.col("text"), 3).alias("g")).collect()
    assert rows[0].g == ["ab ", "b c", " cd"]
    assert rows[1].g == []
    assert rows[2].g == []


def test_lm_oracle(spark, duck):
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    model = train_char_lm(train, "text", n=3, vocab_size=500)
    scored = score_char_lm(docs, "doc_id", "text", model, n=3)
    got = {r.doc_id: r.lm_logprob for r in scored.collect()}

    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"""
        WITH tr AS (
          SELECT {_NORM} AS t FROM documents WHERE doc_id % 2 = 0
        ), grams AS (
          SELECT unnest({_NGRAMS}) AS ngram FROM tr
        ), counts AS (
          SELECT ngram, COUNT(*) AS cnt FROM grams GROUP BY ngram
        ), tot AS (
          SELECT SUM(cnt) AS total FROM counts
        ), vocab AS (
          SELECT ngram, ln(cnt / (SELECT total FROM tot)) AS logp
          FROM counts ORDER BY cnt DESC, ngram ASC LIMIT 500
        ), dg AS (
          SELECT doc_id, unnest({_NGRAMS}) AS ngram
          FROM (SELECT doc_id, {_NORM} AS t FROM documents)
        ), j AS (
          SELECT dg.doc_id,
                 COALESCE(v.logp,
                          ln(0.5) - ln((SELECT total FROM tot))) AS lp
          FROM dg LEFT JOIN vocab v ON dg.ngram = v.ngram
        ), agg AS (
          SELECT doc_id, SUM(lp) / COUNT(*) AS s FROM j GROUP BY doc_id
        )
        SELECT d.doc_id, agg.s
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        """
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        if got[k] is None or want[k] is None:
            assert got[k] is None and want[k] is None, k
        else:
            assert math.isclose(got[k], want[k], rel_tol=1e-9), (
                k,
                got[k],
                want[k],
            )


def test_lm_filtering_signal(spark):
    """Documents from the training distribution score higher than
    adversarial junk."""
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    model = train_char_lm(docs, "text", n=3, vocab_size=2000)
    probe = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "zqxj vvvv kkkk wwww qqqq zzzz xxxx jjjj qzxw"),
            (3, "ab"),  # shorter than n -> NULL
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lm_logprob for r in
           score_char_lm(probe, "doc_id", "text", model, n=3).collect()}
    assert out[1] > out[2]
    assert out[3] is None


def test_lm_validation(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        train_char_lm(df, "text", n=0)
    with pytest.raises(ValueError):
        train_char_lm(df, "text", vocab_size=0)
