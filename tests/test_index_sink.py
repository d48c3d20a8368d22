"""Streaming index sinks: stream-folded indexes equal a batch build
over the same documents; replayed epochs are skipped exactly-once;
the watermark survives manual maintenance."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.sources.testdata import load_table
from tests.conftest import SF_MED

SCHEMA = "doc_id BIGINT, text STRING"


def _docs(spark, n=300):
    return (
        load_table(spark, SF_MED, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < n)
    )


def test_bm25_stream_fold_equals_batch_build(spark, tmp_path):
    """Two streamed micro-batches == one batch build over the union,
    score for score (the epoch-append identity through the sink)."""
    from feast_spark.operators.bm25 import bm25_index_topk, build_bm25_index
    from feast_spark.streaming.index_sink import bm25_index_sink

    docs = _docs(spark).collect()
    first, rest = docs[:150], docs[150:]

    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(first, SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )

    idx = str(tmp_path / "stream_idx")
    # the index must exist before the stream starts: seed with batch 1
    build_bm25_index(
        spark.createDataFrame(first, SCHEMA), idx, "doc_id", "text",
        n_term_buckets=8,
    )

    # deliver the second slice through a real readStream + foreachBatch
    spark.createDataFrame(rest, SCHEMA).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src / "b2"))
    sink = bm25_index_sink(spark, idx)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    ref = str(tmp_path / "batch_idx")
    build_bm25_index(
        spark.createDataFrame(docs, SCHEMA), ref, "doc_id", "text",
        n_term_buckets=8,
    )
    got = bm25_index_topk(spark, idx, ["spark", "merge"], k=10).collect()
    want = bm25_index_topk(spark, ref, ["spark", "merge"], k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    assert [r["bm25"] for r in got] == pytest.approx(
        [r["bm25"] for r in want], rel=1e-12
    )
    with open(f"{idx}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["stream_epoch"] == 0  # availableNow batch id
    assert len(m["epochs"]) == 2


@pytest.mark.nightly
def test_sink_replay_is_skipped_and_watermark_survives_compact(
    spark, tmp_path
):
    """Calling the sink twice with the same epoch id appends once
    (exactly-once under at-least-once delivery); a manual compact
    carries the watermark forward so a later replay is still skipped."""
    from feast_spark.operators.minhash_index import (
        build_minhash_index,
        minhash_index_compact,
        minhash_index_stats,
    )
    from feast_spark.streaming.index_sink import minhash_index_sink

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "mh")
    build_minhash_index(a, path, "doc_id", "text")
    sink = minhash_index_sink(spark, path)

    sink(b, 7)
    n_after = sum(
        r["n_docs"] for r in minhash_index_stats(spark, path).collect()
    )
    sink(b, 7)  # replay: must be a no-op
    assert (
        sum(r["n_docs"] for r in minhash_index_stats(spark, path).collect())
        == n_after
    )
    sink(b.limit(0), 8)  # empty epoch: no-op, no watermark bump needed

    minhash_index_compact(spark, path)
    with open(f"{path}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["stream_epoch"] == 7  # survived the manual compact
    sink(b, 7)  # replay after compact: still skipped
    assert (
        sum(r["n_docs"] for r in minhash_index_stats(spark, path).collect())
        == n_after
    )
    # a NEW epoch still lands
    extra = spark.createDataFrame(
        [Row(doc_id=10_001, text="entirely new streamed document body")],
        SCHEMA,
    )
    sink(extra, 9)
    assert (
        sum(r["n_docs"] for r in minhash_index_stats(spark, path).collect())
        == n_after + 1
    )


def test_ivf_sink_replay_skipped(spark, tmp_path):
    from feast_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_stats,
    )
    from feast_spark.streaming.index_sink import ivf_index_sink

    emb = load_table(spark, SF_MED, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    build_ivf_index(a, path, n_centroids=8)
    sink = ivf_index_sink(spark, path)
    sink(b, 3)
    total = ivf_index_stats(spark, path).collect()[0]["total_vectors"]
    assert total == emb.count()
    sink(b, 3)  # replay
    assert (
        ivf_index_stats(spark, path).collect()[0]["total_vectors"] == total
    )
    with open(f"{path}/_MANIFEST.json") as f:
        assert json.load(f)["stream_epoch"] == 3


def test_clear_stream_watermark(spark, tmp_path):
    """After clearing the watermark, a re-pointed stream's restarted
    epoch ids apply again."""
    from feast_spark.operators.minhash_index import (
        build_minhash_index,
        minhash_index_stats,
    )
    from feast_spark.streaming.index_sink import (
        clear_stream_watermark,
        minhash_index_sink,
    )

    docs = _docs(spark, 100)
    path = str(tmp_path / "mh")
    build_minhash_index(docs.filter(F.col("doc_id") < 50), path)
    sink = minhash_index_sink(spark, path)
    sink(docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 75)), 41)
    n1 = sum(r["n_docs"] for r in minhash_index_stats(spark, path).collect())
    late = docs.filter(F.col("doc_id") >= 75)
    sink(late, 0)  # fresh-checkpoint id without clearing: skipped
    assert (
        sum(r["n_docs"] for r in minhash_index_stats(spark, path).collect())
        == n1
    )
    clear_stream_watermark(path)
    sink(late, 0)  # now it lands
    assert (
        sum(r["n_docs"] for r in minhash_index_stats(spark, path).collect())
        == n1 + late.count()
    )
    with open(f"{path}/_MANIFEST.json") as f:
        assert json.load(f)["stream_epoch"] == 0


@pytest.mark.nightly
def test_rebuild_carries_stream_watermark(spark, tmp_path):
    """Rebuilding any of the three indexes over an existing path keeps
    the streaming watermark (and any other sidecar meta): a crash-replay
    straddling the rebuild must NOT re-append a micro-batch whose docs
    the rebuild corpus already contains."""
    from feast_spark.operators.bm25 import build_bm25_index
    from feast_spark.operators.minhash_index import (
        build_minhash_index,
        minhash_index_append,
    )
    from feast_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
    )

    docs = _docs(spark, 100)
    a = docs.filter(F.col("doc_id") < 50)
    b = docs.filter(F.col("doc_id") >= 50)

    # minhash: seed -> streamed append stamps the watermark -> rebuild
    mh = str(tmp_path / "mh")
    build_minhash_index(a, mh)
    minhash_index_append(spark, mh, b, meta={"stream_epoch": 7})
    build_minhash_index(docs, mh)
    with open(f"{mh}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["stream_epoch"] == 7  # survived the rebuild
    assert len(m["epochs"]) == 1  # but the epoch list WAS reset

    # bm25
    bm = str(tmp_path / "bm")
    build_bm25_index(a, bm, "doc_id", "text", n_term_buckets=8)
    from feast_spark.operators.bm25 import bm25_index_append

    bm25_index_append(spark, bm, b, meta={"stream_epoch": 3})
    build_bm25_index(docs, bm, "doc_id", "text", n_term_buckets=8)
    with open(f"{bm}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["stream_epoch"] == 3
    assert len(m["epochs"]) == 1

    # ivf
    emb = load_table(spark, SF_MED, "embeddings")
    ea = emb.filter(F.col("vec_id") % 2 == 0)
    eb = emb.filter(F.col("vec_id") % 2 == 1)
    iv = str(tmp_path / "iv")
    build_ivf_index(ea, iv, n_centroids=8)
    ivf_index_append(spark, iv, eb, meta={"stream_epoch": 11})
    build_ivf_index(emb, iv, n_centroids=8)
    with open(f"{iv}/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["stream_epoch"] == 11
    assert len(m["epochs"]) == 1


def test_rebuild_as_different_kind_fails_old_readers_loudly(spark, tmp_path):
    """carried_meta is an ALLOWLIST: rebuilding a path as a different
    index kind must not drag the old kind's structural keys into the
    new manifest — otherwise the old kind's readers would pass
    validation and silently read the stale pre-rebuild epochs."""
    import pytest

    from feast_spark.operators.bm25 import build_bm25_index
    from feast_spark.operators.minhash_index import (
        build_minhash_index,
        dedup_against_index,
        minhash_index_append,
    )

    docs = _docs(spark, 60)
    shifted = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    ).limit(10)
    path = str(tmp_path / "idx")
    build_minhash_index(docs, path)
    minhash_index_append(spark, path, shifted, meta={"stream_epoch": 5})
    build_bm25_index(docs, path, "doc_id", "text", n_term_buckets=8)
    with open(f"{path}/_MANIFEST.json") as f:
        m = json.load(f)
    assert "params" not in m  # minhash structural key NOT carried
    assert m["stream_epoch"] == 5  # the watermark IS carried
    with pytest.raises(ValueError, match="no minhash index"):
        dedup_against_index(spark, path, shifted)

    # the kind stamp catches the pairs whose REQUIRED KEYS overlap:
    # IVF requires only 'epochs', which every kind writes, so without
    # the stamp an IVF reader would silently read an IVFPQ rebuild's
    # stale vectors/ epochs
    from feast_spark.operators.pq_index import build_ivfpq_index
    from feast_spark.operators.similarity import build_ivf_index, ivf_index_topk

    emb = load_table(spark, SF_MED, "embeddings")
    vpath = str(tmp_path / "vec")
    build_ivf_index(emb, vpath, n_centroids=8, iters=2)
    build_ivfpq_index(emb, vpath, n_centroids=8, iters=2)
    with pytest.raises(ValueError, match="'ivfpq' index"):
        ivf_index_topk(spark, vpath, emb.filter("vec_id < 2")).collect()
