"""Incremental minhash index: identity with the inline pipeline,
append==rebuild, crash-safe epoch commits."""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.docdedup import minhash_dedup_pairs
from feast_spark.operators.minhash_index import (
    build_minhash_index,
    dedup_against_index,
    minhash_index_append,
    minhash_index_stats,
)
from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED


def _pairs_set(rows):
    return {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in rows}


def _docs(spark):
    return load_table(spark, SF_MED, "documents").select("doc_id", "text")


def test_dedup_against_index_matches_full_recompute(spark, tmp_path):
    """index(A) + dedup_against_index(B) == minhash_dedup_pairs(A∪B)
    restricted to pairs touching B — the incremental path finds exactly
    the pairs the full recompute would, without re-signing A."""
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "mhidx")
    build_minhash_index(a, path, "doc_id", "text")
    got = _pairs_set(
        dedup_against_index(
            spark, path, b, threshold=0.5, max_bucket_size=None
        ).collect()
    )
    full = minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.5, max_bucket_size=None
    ).collect()
    b_ids = {r["doc_id"] for r in b.collect()}
    want = {
        t
        for t in _pairs_set(full)
        if t[0] in b_ids or t[1] in b_ids
    }
    assert got == want
    assert got  # non-vacuous: the sf0.01 corpus has near-dups across the split


def test_append_equals_rebuild(spark, tmp_path):
    """Querying after append(B) == querying an index built on (A∪B):
    the incremental path never diverges from a rebuild."""
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 3 == 1)
    b = docs.filter(F.col("doc_id") % 3 == 2)
    c = docs.filter(F.col("doc_id") % 3 == 0)
    inc, reb = str(tmp_path / "inc"), str(tmp_path / "reb")
    build_minhash_index(a, inc, "doc_id", "text")
    minhash_index_append(spark, inc, b)
    build_minhash_index(a.unionByName(b), reb, "doc_id", "text")
    got_inc = _pairs_set(
        dedup_against_index(spark, inc, c, threshold=0.5).collect()
    )
    got_reb = _pairs_set(
        dedup_against_index(spark, reb, c, threshold=0.5).collect()
    )
    assert got_inc == got_reb
    assert got_inc


def test_crashed_append_is_invisible(spark, tmp_path):
    """A staged-but-uncommitted epoch (crash between stage and flip)
    is never read, and the next append numbers past the orphan."""
    import os

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") < 300)
    path = str(tmp_path / "crash")
    build_minhash_index(a, path, "doc_id", "text")
    # simulate a crashed append: epoch dir exists, manifest not flipped
    orphan = os.path.join(path, "bands", "epoch=1")
    os.makedirs(orphan)
    docs.filter(F.col("doc_id") >= 300).limit(5).select(
        F.col("doc_id").alias("doc"),
        F.lit(0).alias("band"),
        F.lit(0).cast("long").alias("bucket"),
    ).write.mode("overwrite").parquet(orphan)
    baseline = _pairs_set(
        dedup_against_index(
            spark, path, docs.filter(F.col("doc_id").between(300, 330)),
            threshold=0.5,
        ).collect()
    )
    # committed epochs only: the orphan rows never appear
    stats = minhash_index_stats(spark, path).collect()
    assert {r["epoch"] for r in stats} == {0}
    # next append skips the orphan's number
    minhash_index_append(spark, path, docs.filter(F.col("doc_id") >= 400))
    stats2 = minhash_index_stats(spark, path).collect()
    assert {r["epoch"] for r in stats2} == {0, 2}
    after = _pairs_set(
        dedup_against_index(
            spark, path, docs.filter(F.col("doc_id").between(300, 330)),
            threshold=0.5,
        ).collect()
    )
    # the appended epoch only ADDS pairs against docs >= 400; the
    # orphan's fabricated band rows never surface
    assert after >= baseline
    assert all(t[0] >= 400 or t[1] >= 400 for t in after - baseline)


def test_build_validation_and_missing_index(spark, tmp_path):
    docs = _docs(spark).limit(10)
    with pytest.raises(ValueError, match="divide"):
        build_minhash_index(docs, str(tmp_path / "x"), bands=7)
    with pytest.raises(ValueError, match="method"):
        build_minhash_index(docs, str(tmp_path / "x"), method="nope")
    with pytest.raises(ValueError, match="no minhash index"):
        dedup_against_index(spark, str(tmp_path / "missing"), docs)


def test_bucket_cap_uses_combined_population(spark, tmp_path):
    """The cap counts corpus + new docs together — the population the
    full recompute would cap on — so a bucket that only overflows once
    the new slice lands is dropped on both paths."""
    rows = [(i, "common boiler plate text repeated verbatim") for i in range(8)]
    corpus = spark.createDataFrame(rows[:5], "doc_id INT, text STRING")
    fresh = spark.createDataFrame(rows[5:], "doc_id INT, text STRING")
    path = str(tmp_path / "cap")
    build_minhash_index(corpus, path, "doc_id", "text")
    capped = dedup_against_index(
        spark, path, fresh, threshold=0.5, max_bucket_size=7
    ).collect()
    assert capped == []  # combined bucket of 8 identical docs > cap
    uncapped = dedup_against_index(
        spark, path, fresh, threshold=0.5, max_bucket_size=None
    ).collect()
    assert _pairs_set(uncapped)  # pairs reappear without the cap


def test_compact_preserves_results_and_vacuum(spark, tmp_path):
    """Compaction merges all committed epochs into one with identical
    query results (no re-signing), and vacuum removes exactly the
    superseded + orphaned directories."""
    import json
    import os

    from feast_spark.operators.minhash_index import (
        minhash_index_compact,
        minhash_index_vacuum,
    )

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 3 == 1)
    b = docs.filter(F.col("doc_id") % 3 == 2)
    probe = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "cmp")
    build_minhash_index(a, path, "doc_id", "text")
    minhash_index_append(spark, path, b)
    before = _pairs_set(
        dedup_against_index(spark, path, probe, threshold=0.5).collect()
    )

    # orphan from a "crashed" compact attempt must not break numbering
    os.makedirs(f"{path}/bands/epoch=9")

    minhash_index_compact(spark, path)
    with open(f"{path}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["epochs"] == [10]  # one epoch, numbered past the orphan
    after = _pairs_set(
        dedup_against_index(spark, path, probe, threshold=0.5).collect()
    )
    assert after == before

    removed = minhash_index_vacuum(path)
    assert removed["bands"] == ["epoch=0", "epoch=1", "epoch=9"]
    assert removed["shingles"] == ["epoch=0", "epoch=1"]
    assert _pairs_set(
        dedup_against_index(spark, path, probe, threshold=0.5).collect()
    ) == before

    # idempotent no-op on a single-epoch index
    minhash_index_compact(spark, path)
    with open(f"{path}/_MANIFEST.json") as f:
        assert json.load(f)["epochs"] == [10]


def test_append_empty_and_blank_slices(spark, tmp_path):
    """Zero-row slices are a no-op (guarded on DERIVED band rows, same
    discipline as the BM25 postings guard).  Blank-text docs, by
    contrast, DO sign — the short-doc shingle guard gives every doc a
    whole-doc shingle, so identical empty docs cluster as duplicates
    exactly like the inline pipeline — and the index stays queryable."""
    import json

    docs = _docs(spark)
    path = str(tmp_path / "mh")
    build_minhash_index(docs, path, "doc_id", "text")
    with open(f"{path}/_MANIFEST.json") as f:
        before = json.load(f)["epochs"]

    empty = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    minhash_index_append(spark, path, empty)
    with open(f"{path}/_MANIFEST.json") as f:
        assert json.load(f)["epochs"] == before  # no zero-row epoch

    blank = spark.createDataFrame(
        [(10_001, ""), (10_002, "   ")], "doc_id BIGINT, text STRING"
    )
    minhash_index_append(spark, path, blank)
    with open(f"{path}/_MANIFEST.json") as f:
        after = json.load(f)["epochs"]
    assert len(after) == len(before) + 1
    # the two blank docs sign identically -> found as a dup pair
    probe = spark.createDataFrame(
        [(10_003, "")], "doc_id BIGINT, text STRING"
    )
    pairs = dedup_against_index(
        spark, path, probe, threshold=0.9, max_bucket_size=None
    ).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} >= {(10_001, 10_003), (10_002, 10_003)} or {
        (p["id_b"], p["id_a"]) for p in pairs
    } >= {(10_001, 10_003), (10_002, 10_003)}
