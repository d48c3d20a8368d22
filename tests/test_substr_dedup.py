"""Exact-substring dedup (winnowing-fingerprint ExactSubstr): the
detection guarantee, cut-mode correctness + boundary-slop bound,
byte-identity for untouched docs, short-doc guard, and plan hygiene."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.substr_dedup import (
    duplicate_substring_stats,
    strip_duplicate_substrings,
    with_substring_fingerprints,
)

K, W = 10, 10  # guarantee: any duplicated run >= K + W - 1 = 19 chars


def _rand_words(rng, n):
    return " ".join(
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), 5))
        for _ in range(n)
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    shared = _rand_words(rng, 15)  # ~89 chars, far above the guarantee
    rows = [
        Row(doc_id=1, text=_rand_words(rng, 8) + " " + shared + " " + _rand_words(rng, 8)),
        Row(doc_id=2, text=_rand_words(rng, 10) + " " + shared),
        Row(doc_id=3, text=shared + " " + _rand_words(rng, 12)),
        Row(doc_id=4, text=_rand_words(rng, 25)),  # fully unique
        Row(doc_id=5, text="tiny"),                # < K chars
        Row(doc_id=6, text="tiny"),                # exact dup of 5
    ]
    return spark.createDataFrame(rows), shared


def test_detection_guarantee_and_stats(spark, corpus):
    df, shared = corpus
    st = {
        r["doc_id"]: r
        for r in duplicate_substring_stats(df, k=K, window=W).collect()
    }
    assert st[1]["n_dup_fps"] > 0
    assert st[2]["n_dup_fps"] > 0
    assert st[3]["n_dup_fps"] > 0
    assert st[4]["n_dup_fps"] == 0 and st[4]["dup_frac"] == 0.0
    # whole-text fingerprints of the two identical tiny docs collide
    assert st[5]["n_dup_fps"] == 1 and st[6]["n_dup_fps"] == 1
    assert 0 < st[1]["dup_frac"] < 1


def test_strip_removes_shared_run_keeps_unique(spark, corpus):
    df, shared = corpus
    out = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_substrings(df, k=K, window=W).collect()
    }
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    slop = K + W - 2
    for d in (1, 2, 3):
        # the shared run is gone up to boundary slop
        assert shared not in out[d], d
        removed = len(orig[d]) - len(out[d])
        assert removed >= len(shared) - 2 * slop, (d, removed)
        # nothing outside the duplicated run is cut: the unique prefix
        # survives verbatim
        uniq_prefix = orig[d][: max(orig[d].find(shared) - slop, 0)]
        if uniq_prefix:
            assert out[d].startswith(uniq_prefix[: max(len(uniq_prefix) - 1, 1)]), d
    # fully-unique doc byte-identical
    assert out[4] == orig[4]
    # identical tiny docs: whole text is the duplicated span
    assert out[5] == "" and out[6] == ""


def test_strip_is_noop_without_duplication(spark):
    rng = np.random.default_rng(9)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=_rand_words(rng, 20), extra=i * 10) for i in range(6)]
    )
    out = strip_duplicate_substrings(df, k=K, window=W)
    got = sorted((r["doc_id"], r["text"], r["extra"]) for r in out.collect())
    want = sorted((r["doc_id"], r["text"], r["extra"]) for r in df.collect())
    assert got == want  # byte-identical, extra columns preserved


def test_min_dup_docs_threshold(spark, corpus):
    df, shared = corpus
    # the run appears in 3 docs: with min_dup_docs=4 nothing is cut
    out = strip_duplicate_substrings(df, k=K, window=W, min_dup_docs=4)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got == orig


def test_selection_density_and_determinism(spark, corpus):
    df, _ = corpus
    fps = with_substring_fingerprints(df, k=K, window=W)
    n1 = sorted(map(tuple, fps.collect()))
    n2 = sorted(map(tuple, with_substring_fingerprints(df, k=K, window=W).collect()))
    assert n1 == n2
    # winnowing density ~2/(w+1): selected fps are a small fraction of
    # positions (upper-bound sanity, not exact)
    total_chars = sum(len(r["text"]) for r in df.collect())
    assert len(n1) < total_chars * 0.5


def test_plan_no_python(spark, corpus):
    df, _ = corpus
    plan = (
        strip_duplicate_substrings(df, k=K, window=W)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_portable_mode_matches_duckdb_replay(spark, corpus):
    """Cross-engine differential: DuckDB replays the md5-portable
    winnowing selection + duplicate detection in SQL; the expected
    stripped text is spliced in plain Python from DuckDB's spans and
    must equal Spark's strip output byte-for-byte."""
    import duckdb

    df, _ = corpus
    rows = sorted((r["doc_id"], r["text"]) for r in df.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    q = f"""
WITH h AS (
  SELECT doc_id, text,
    CASE WHEN length(text) < {K}
      THEN [CAST(CONCAT('0x', substr(md5(text), 1, 8)) AS BIGINT)]
      ELSE list_transform(range(1, length(text) - {K} + 2),
           i -> CAST(CONCAT('0x', substr(md5(substr(text, i, {K})), 1, 8)) AS BIGINT))
    END AS hs
  FROM docs
), sel AS (
  SELECT doc_id, unnest(
    list_transform(range(1, greatest(len(hs) - {W}, 0) + 2),
      j -> {{'pos': j - 2 + list_position(hs[j:j+{W}-1], list_min(hs[j:j+{W}-1])),
            'fp': list_min(hs[j:j+{W}-1])}})) AS s
  FROM h
), fps AS (
  SELECT DISTINCT doc_id, s.pos AS pos, s.fp AS fp FROM sel
), dup AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT doc_id, list_sort(list(pos)) FROM fps JOIN dup USING (fp)
GROUP BY doc_id
"""
    spans_by_doc = dict(con.execute(q).fetchall())

    def splice(text, starts):
        merged = []
        for p in starts:
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + K)
            else:
                merged.append([p, p + K])
        out, cur = [], 0
        for s0, e0 in merged:
            out.append(text[cur:s0])
            cur = min(e0, len(text))
        out.append(text[cur:])
        return "".join(out)

    want = {
        did: splice(text, spans_by_doc.get(did, []))
        for did, text in rows
    }
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_substrings(
            df, k=K, window=W, portable=True
        ).collect()
    }
    assert got == want
    assert any(got[d] != dict(rows)[d] for d in got)  # something was cut
