"""ngram_contamination / contaminated_spans: closed-form cases plus a
DuckDB differential oracle on the sf0.01 documents table (train/eval
split by hash, so the corpus's planted near-dups straddle the split)."""

from pyspark.sql import functions as F

from tests.conftest import SF_MED

_TOKS = """
SELECT doc_id,
       CASE WHEN text IS NULL OR length(trim(text)) = 0
            THEN []::VARCHAR[]
            ELSE regexp_split_to_array(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   '\\s+')
       END AS toks
FROM documents
"""

# with_shingles semantics: distinct n-grams; < n tokens -> one shingle
# of the whole text
_SHINGLES = """
SELECT doc_id, unnest(list_distinct(
  CASE WHEN len(toks) < {n}
       THEN [array_to_string(toks, ' ')]
       ELSE list_transform(range(1, len(toks) - {n} + 2),
                           i -> array_to_string(toks[i:i+{n}-1], ' '))
  END)) AS sh
FROM tk
"""


def test_contamination_closed_form(spark):
    train = spark.createDataFrame(
        [("t1", "the quick brown fox jumps"), ("t2", "lorem ipsum dolor sit")],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [
            ("e1", "the quick brown fox sleeps"),  # shares 2 of 3 trigrams? see below
            ("e2", "completely novel words here"),
            ("e3", "hi"),  # < n tokens: whole-text shingle, no train match
        ],
        "doc_id string, text string",
    )
    from feast_spark.operators.contamination import ngram_contamination

    out = {
        r["doc_id"]: r
        for r in ngram_contamination(train, ev, "doc_id", "text", n=3).collect()
    }
    # e1 trigrams: {the quick brown, quick brown fox, brown fox sleeps};
    # first two occur in t1
    assert out["e1"]["total_ngrams"] == 3
    assert out["e1"]["contaminated_ngrams"] == 2
    assert abs(out["e1"]["contamination_frac"] - 2 / 3) < 1e-12
    assert out["e2"]["contaminated_ngrams"] == 0
    assert out["e3"]["total_ngrams"] == 1
    assert out["e3"]["contaminated_ngrams"] == 0

    flagged = ngram_contamination(
        train, ev, "doc_id", "text", n=3, threshold=0.5
    ).collect()
    assert [r["doc_id"] for r in flagged] == ["e1"]


def test_contamination_duplicate_eval_ids_stay_id_grain(spark):
    """Duplicate eval ids fold into ONE output row per id (totals sum
    across the duplicates, hits count distinct across their union), so
    contamination_frac stays <= 1 and the output grain is stable."""
    from feast_spark.operators.contamination import ngram_contamination

    train = spark.createDataFrame(
        [("t1", "aa bb cc"), ("t2", "dd ee ff")],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [("e1", "aa bb cc"), ("e1", "dd ee ff"), ("e2", "zz yy xx")],
        "doc_id string, text string",
    )
    rows = ngram_contamination(train, ev, "doc_id", "text", n=3).collect()
    assert len(rows) == 2
    out = {r["doc_id"]: r for r in rows}
    assert out["e1"]["total_ngrams"] == 2  # one trigram per dup row
    assert out["e1"]["contaminated_ngrams"] == 2
    assert out["e1"]["contamination_frac"] == 1.0
    assert out["e2"]["contaminated_ngrams"] == 0


def test_contamination_exact_dup_is_full(spark):
    train = spark.createDataFrame(
        [("t1", "alpha beta gamma delta epsilon")], "doc_id string, text string"
    )
    ev = spark.createDataFrame(
        [("e1", "Alpha  beta GAMMA delta epsilon")], "doc_id string, text string"
    )
    from feast_spark.operators.contamination import ngram_contamination

    (row,) = ngram_contamination(train, ev, "doc_id", "text", n=4).collect()
    assert row["contamination_frac"] == 1.0  # normalization folds case/ws


def test_contaminated_spans_audit(spark):
    train = spark.createDataFrame(
        [("t1", "one two three four"), ("t2", "two three four five")],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [("e1", "one two three four five")], "doc_id string, text string"
    )
    from feast_spark.operators.contamination import contaminated_spans

    rows = {
        (r["eval_id"], r["train_id"]): r["shared_ngrams"]
        for r in contaminated_spans(
            train,
            ev,
            "doc_id",
            "doc_id",
            "text",
            n=3,
        ).collect()
    }
    # e1 trigrams: {one two three, two three four, three four five};
    # t1 holds the first two, t2 the last two
    assert rows[("e1", "t1")] == 2
    assert rows[("e1", "t2")] == 2


def test_contaminated_spans_freq_cap_identity(spark):
    """The r16 semi-join-before-freq rewrite must not change results:
    a shingle shared by MORE train docs than the cap is dropped, one
    under the cap survives, and the uncapped run sees both — the exact
    outputs the pre-rewrite full-corpus frequency pass produced."""
    from feast_spark.operators.contamination import contaminated_spans

    # "x y z" occurs in 5 train docs (over cap=3); "a b c" in t1 only.
    train = spark.createDataFrame(
        [("t1", "x y z a b c")]
        + [(f"t{i}", f"x y z p{i}") for i in range(2, 6)],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [("e1", "x y z a b c")], "doc_id string, text string"
    )

    def run(cap):
        return {
            (r["eval_id"], r["train_id"]): r["shared_ngrams"]
            for r in contaminated_spans(
                train, ev, "doc_id", "doc_id", "text",
                n=3, max_shingle_freq=cap,
            ).collect()
        }

    # cap=3: "x y z" (freq 5) dropped everywhere; t1 keeps its other
    # 3 trigrams ("y z a", "z a b", "a b c"); t2..t5 vanish entirely.
    assert run(3) == {("e1", "t1"): 3}
    # uncapped: t1 shares all 4 e1 trigrams, t2..t5 share "x y z" only
    assert run(None) == {("e1", "t1"): 4} | {
        ("e1", f"t{i}"): 1 for i in range(2, 6)
    }


def test_contamination_vs_duckdb(spark, duck):
    """Differential oracle at sf0.01: split documents by md5 parity into
    train/eval, n=5, portable string shingles both sides."""
    from feast_spark.functions.split import hash_split
    from feast_spark.operators.contamination import ngram_contamination
    from feast_spark.sources.testdata import load_table

    docs = hash_split(
        load_table(spark, SF_MED, "documents"),
        "doc_id",
        {"train": 0.5, "eval": 0.5},
    )
    train = docs.filter(F.col("split") == "train")
    ev = docs.filter(F.col("split") == "eval")
    out = ngram_contamination(
        train, ev, "doc_id", "text", n=5, portable=True
    )

    n = 5
    oracle = duck.execute(
        f"""
WITH tk AS ({_TOKS}),
side AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS s
  FROM documents
),
sh AS ({_SHINGLES.format(n=n)}),
tr AS (SELECT DISTINCT sh.sh FROM sh JOIN side USING (doc_id) WHERE s < 50),
ev AS (SELECT sh.doc_id, sh.sh FROM sh JOIN side USING (doc_id) WHERE s >= 50)
SELECT ev.doc_id,
       count(*)::BIGINT AS total_ngrams,
       sum(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS contaminated_ngrams,
       sum(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)
           AS contamination_frac
FROM ev LEFT JOIN tr ON ev.sh = tr.sh
GROUP BY ev.doc_id
"""
    ).fetchall()
    got = {
        r["doc_id"]: (
            r["total_ngrams"],
            r["contaminated_ngrams"],
            round(r["contamination_frac"], 9),
        )
        for r in out.collect()
    }
    want = {r[0]: (r[1], r[2], round(r[3], 9)) for r in oracle}
    assert len(got) == len(want) > 0
    assert got == want
    # the planted near-dups make SOME contamination certain
    assert any(v[1] > 0 for v in want.values())
