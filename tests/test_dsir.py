"""DSIR importance resampling (operators/dsir.py): the hashed-ngram
log weights replay bit-for-bit (up to float summation order) in a
DuckDB twin of the md5-bucket feature space; resampling measurably
shifts the kept set toward the target distribution, deterministically
per seed; the whole pipeline stays JVM-side."""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    ngram_bucket_histogram,
)

N_BUCKETS = 512
N_MAX = 2

_A = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
_B = ["uno", "dos", "tres", "cuatro", "cinco", "seis"]


def _doc(vocab, i, n=12):
    return " ".join(vocab[(i * 7 + j * 3) % len(vocab)] for j in range(n))


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(
        [(i, _doc(_A, i)) for i in range(60)]
        + [(100 + i, _doc(_B, i)) for i in range(60)]
        + [(999, "   ")],  # featureless doc: weight must be 0.0
        "doc_id BIGINT, text STRING",
    )
    target = spark.createDataFrame(
        [(1000 + i, _doc(_B, i + 3)) for i in range(40)],
        "doc_id BIGINT, text STRING",
    )
    return raw, target


def test_log_weights_match_duckdb_twin(spark, corpora):
    import duckdb

    raw, target = corpora
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            raw, target, n_max=N_MAX, n_buckets=N_BUCKETS
        ).collect()
    }

    con = duckdb.connect()
    for name, df in (("raw", raw), ("target", target)):
        con.execute(f"CREATE TABLE {name} (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            f"INSERT INTO {name} VALUES (?, ?)",
            sorted((r["doc_id"], r["text"]) for r in df.collect()),
        )
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    bucket_sql = (
        "CAST(CONCAT('0x', substr(md5(g), 1, 8)) AS BIGINT) % {B}"
    ).format(B=N_BUCKETS)

    def buckets_cte(table):
        # unigrams + bigrams over the normalized tokens, every
        # occurrence kept; blank docs contribute nothing
        return f"""
  SELECT doc_id, {bucket_sql} AS bucket FROM (
    SELECT doc_id, unnest(
      CASE WHEN length(trim(text)) = 0 THEN []
           ELSE regexp_split_to_array({norm}, '\\s+') END
      || CASE WHEN length(trim(text)) = 0 THEN []
           WHEN len(regexp_split_to_array({norm}, '\\s+')) < 2 THEN []
           ELSE list_transform(
             range(1, len(regexp_split_to_array({norm}, '\\s+'))),
             i -> array_to_string(
               regexp_split_to_array({norm}, '\\s+')[i:i+1], ' '))
      END) AS g
    FROM {table})
"""

    q = f"""
WITH rb AS ({buckets_cte('raw')}),
tb AS ({buckets_cte('target')}),
hr AS (SELECT bucket, COUNT(*) AS cr FROM rb GROUP BY bucket),
ht AS (SELECT bucket, COUNT(*) AS ct FROM tb GROUP BY bucket),
tot AS (SELECT (SELECT SUM(cr) FROM hr) AS tr, (SELECT SUM(ct) FROM ht) AS tt),
ratio AS (
  SELECT COALESCE(hr.bucket, ht.bucket) AS bucket,
         ln((COALESCE(ct, 0) + 1.0) / (tt + {N_BUCKETS}))
       - ln((COALESCE(cr, 0) + 1.0) / (tr + {N_BUCKETS})) AS log_ratio
  FROM hr FULL OUTER JOIN ht ON hr.bucket = ht.bucket CROSS JOIN tot
),
doc AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM rb GROUP BY 1, 2)
SELECT r.doc_id,
       COALESCE(SUM(d.cnt * ratio.log_ratio), 0.0) AS log_weight
FROM raw r
LEFT JOIN doc d ON r.doc_id = d.doc_id
LEFT JOIN ratio ON d.bucket = ratio.bucket
GROUP BY r.doc_id
"""
    want = dict(con.execute(q).fetchall())
    assert set(got) == set(want)
    for did in want:
        assert got[did] == pytest.approx(want[did], rel=1e-9, abs=1e-12), did
    assert got[999] == 0.0  # blank doc: indifferent, not excluded
    # weights separate the populations: every B-vocab doc outweighs
    # every A-vocab doc
    assert min(got[100 + i] for i in range(60)) > max(
        got[i] for i in range(60)
    )


def test_resample_shifts_toward_target_and_is_deterministic(
    spark, corpora
):
    raw, target = corpora
    kept = dsir_resample(
        raw, target, n_docs=50, n_max=N_MAX, n_buckets=N_BUCKETS, seed="s1"
    )
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert len(ids) == 50
    frac_b = sum(1 for i in ids if 100 <= i < 200) / len(ids)
    assert frac_b > 0.9  # raw pool is 50/50; the kept set is ~target

    again = sorted(
        r["doc_id"]
        for r in dsir_resample(
            raw, target, n_docs=50, n_max=N_MAX, n_buckets=N_BUCKETS,
            seed="s1",
        ).select("doc_id").collect()
    )
    assert again == ids  # stateless determinism per seed
    other = sorted(
        r["doc_id"]
        for r in dsir_resample(
            raw, target, n_docs=50, n_max=N_MAX, n_buckets=N_BUCKETS,
            seed="s2",
        ).select("doc_id").collect()
    )
    assert other != ids  # the Gumbel noise actually depends on the seed

    with pytest.raises(ValueError, match="n_docs"):
        dsir_resample(raw, target, n_docs=0)


def test_gumbel_key_survives_u_equal_one(spark, corpora, monkeypatch):
    """The md5 draw hits exactly 1.0 with probability 2^-32 per doc;
    un-clamped, -ln(-ln(1.0)) is NULL, the key sorts LAST and the doc
    can never be selected regardless of weight.  Force u = 1.0 for
    every doc: with the clamp the Gumbel term is a shared constant, so
    selection degrades to pure argmax over log_weight — the top-weight
    (target-vocab) docs, not the lowest ids a NULL-key sort picks."""
    from feast_spark.operators import packing

    monkeypatch.setattr(
        packing, "_uniform01", lambda col, salt: F.lit(1.0)
    )
    raw, target = corpora
    kept = dsir_resample(
        raw, target, n_docs=10, n_max=N_MAX, n_buckets=N_BUCKETS
    )
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert len(ids) == 10
    assert all(100 <= i < 200 for i in ids), ids  # argmax, not id order


def test_degenerate_inputs_fail_loudly(spark, corpora):
    """Guard rails (r12 review findings): smoothing <= 0 would NULL
    one-sided log-ratios (Spark sum skips NULLs -> silently wrong
    weights); an empty/all-blank target would coalesce every weight to
    0.0 and ship a uniform sample labeled as distribution-matched."""
    from feast_spark.operators.dsir import dsir_log_weights as dlw

    raw, target = corpora
    with pytest.raises(ValueError, match="smoothing"):
        dlw(raw, target, smoothing=0.0)
    with pytest.raises(ValueError, match="n_max"):
        dlw(raw, target, n_max=0)
    blank_target = spark.createDataFrame(
        [(1, "   "), (2, "")], "doc_id BIGINT, text STRING"
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="no n-gram features"
    ):
        dlw(raw, blank_target, n_buckets=N_BUCKETS).collect()


def test_histogram_bounded_and_plan_python_free(spark, corpora):
    raw, target = corpora
    hist = ngram_bucket_histogram(raw, n_max=N_MAX, n_buckets=N_BUCKETS)
    assert hist.count() <= N_BUCKETS
    plan = (
        dsir_log_weights(raw, target, n_max=N_MAX, n_buckets=N_BUCKETS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_build_corpus_dsir_stage(spark, corpora):
    """The pipeline facade's optional DSIR stage: selection runs after
    dedup/decontamination and before splitting; the report carries the
    stage count; omitting dsir_target_n with a target frame is loud."""
    from feast_spark.pipelines.corpus import CorpusConfig, build_corpus

    # unique tail tokens: the fixture's periodic docs collapse under
    # the pipeline's exact-dedup stage before DSIR ever runs
    raw = spark.createDataFrame(
        [(i, _doc(_A, i) + f" uniq{i}", "web") for i in range(60)]
        + [(100 + i, _doc(_B, i) + f" uniq{i}", "web") for i in range(60)],
        "doc_id BIGINT, text STRING, source STRING",
    )
    _, target = corpora
    cfg = CorpusConfig(
        min_quality=0.0, min_tokens=0, near_dedup=False,
        dsir_target_n=40, dsir_n_buckets=N_BUCKETS, dsir_ngram_max=N_MAX,
    )
    out, stages = build_corpus(
        raw, config=cfg, report=True, dsir_target_df=target
    )
    assert stages["dsir_selected"] == 40
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert len(ids) == 40
    frac_b = sum(1 for i in ids if 100 <= i < 200) / len(ids)
    assert frac_b > 0.85  # the selected pool is ~target-distributed
    assert "split" in out.columns  # selection happened BEFORE the split

    with pytest.raises(ValueError, match="dsir_target_n"):
        build_corpus(
            raw, config=CorpusConfig(min_quality=0.0, min_tokens=0),
            dsir_target_df=target,
        )


def test_null_id_rows_are_dropped_not_collapsed(spark, corpora):
    """NULL-id raw rows must not merge into one pseudo-doc that could
    out-rank real docs (groupBy collapses null keys): they are dropped
    from the weights output (r17 review fix; downstream semi-joins
    could never select them anyway)."""
    raw, target = corpora
    with_nulls = raw.union(
        spark.createDataFrame(
            [(None, _doc(_B, 1)), (None, _doc(_B, 2))],
            raw.schema,
        )
    )
    w = dsir_log_weights(
        with_nulls, target, n_max=N_MAX, n_buckets=N_BUCKETS
    )
    got = {r["doc_id"]: r["log_weight"] for r in w.collect()}
    # the null rows' FEATURES still count toward the raw histogram
    # (they are real corpus text, same as before the fix), but no
    # null-key weight row survives
    assert None not in got
    assert set(got) == {r["doc_id"] for r in raw.collect()}
    assert got[999] == 0.0  # blank doc still indifferent
    kept = dsir_resample(
        with_nulls, target, n_docs=50, n_max=N_MAX, n_buckets=N_BUCKETS,
        seed="s1",
    )
    ids = [r["doc_id"] for r in kept.select("doc_id").collect()]
    assert len(ids) == 50 and None not in ids
