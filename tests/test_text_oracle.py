"""DuckDB differential oracles for repetition_stats and tfidf_top_terms.

These two text operators are implemented and plan-hygienic but sit
outside the driver's 50-query gate (the registry is capped); this file
gives them the same spark-vs-DuckDB value check the gated queries get,
on the sf0.01 documents table.
"""

import math

from tests.conftest import SF_MED

# tokens() over normalize_text(): lowercase, trim, collapse whitespace,
# split on \s+ — empty/null text yields an empty token array
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


def _compare(spark_df, duck_rows, float_cols=()):
    cols = spark_df.columns
    got = set()
    for r in spark_df.collect():
        got.add(
            tuple(
                round(float(r[c]), 9) if c in float_cols and r[c] is not None else r[c]
                for c in cols
            )
        )
    want = set()
    for row in duck_rows:
        want.add(
            tuple(
                round(float(v), 9) if c in float_cols and v is not None else v
                for c, v in zip(cols, row)
            )
        )
    missing = want - got
    extra = got - want
    assert not missing and not extra, (
        f"spark vs oracle diff: {len(missing)} missing, {len(extra)} extra; "
        f"sample missing={list(missing)[:3]} extra={list(extra)[:3]}"
    )


def test_repetition_stats_vs_duckdb(spark, duck):
    from feast_spark.functions.text import repetition_stats
    from feast_spark.sources.testdata import load_table

    docs = load_table(spark, SF_MED, "documents")
    out = repetition_stats(docs, "doc_id", "text")

    oracle = duck.execute(
        f"""
WITH tk AS ({_TOKS}),
uni AS (SELECT doc_id, unnest(toks) AS g FROM tk),
ucnt AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
uagg AS (
  SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_token_frac
  FROM ucnt GROUP BY 1
),
bg AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)),
                             i -> array_to_string(toks[i:i+1], ' '))
         ELSE [] END) AS g
  FROM tk
),
bcnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
bagg AS (
  SELECT doc_id,
         max(c)::DOUBLE / sum(c) AS top_bigram_frac,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c)
             AS dup_bigram_frac
  FROM bcnt GROUP BY 1
)
SELECT d.doc_id,
       coalesce(u.top_token_frac, 0.0) AS top_token_frac,
       coalesce(b.top_bigram_frac, 0.0) AS top_bigram_frac,
       coalesce(b.dup_bigram_frac, 0.0) AS dup_bigram_frac
FROM documents d
LEFT JOIN uagg u USING (doc_id)
LEFT JOIN bagg b USING (doc_id)
"""
    ).fetchall()
    assert out.count() == len(oracle) > 0
    _compare(
        out,
        oracle,
        float_cols=("top_token_frac", "top_bigram_frac", "dup_bigram_frac"),
    )


def test_tfidf_top_terms_vs_duckdb(spark, duck):
    from feast_spark.functions.text import tfidf_top_terms
    from feast_spark.sources.testdata import load_table

    docs = load_table(spark, SF_MED, "documents")
    out = tfidf_top_terms(docs, "doc_id", "text", k=3)

    oracle = duck.execute(
        f"""
WITH tk AS ({_TOKS}),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tk),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY 1, 2),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS nd FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         tf * ln(nd::DOUBLE / df) AS tfidf
  FROM tf JOIN dfq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, rank, tfidf FROM ranked WHERE rank <= 3
"""
    ).fetchall()
    assert out.count() == len(oracle) > 0
    _compare(out, oracle, float_cols=("tfidf",))


def test_tfidf_scores_sane(spark):
    from feast_spark.functions.text import tfidf_top_terms

    df = spark.createDataFrame(
        [("a", "apple banana apple"), ("b", "banana cherry"), ("c", "")],
        "doc_id string, text string",
    )
    rows = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # "apple" appears in 1 of 3 docs, tf=2 -> 2*ln(3)
    top_a = sorted(by_doc["a"], key=lambda r: r["rank"])[0]
    assert top_a["term"] == "apple"
    assert math.isclose(top_a["tfidf"], 2 * math.log(3), rel_tol=1e-9)
    # empty doc contributes no rows
    assert "c" not in by_doc
