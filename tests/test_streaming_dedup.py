"""Streaming corpus dedup: exact first-seen-wins twin of batch
exact_dedup, and LSH near-dup marking against a broadcast batch index."""

from datetime import datetime, timedelta

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def ts(s):
    return datetime.fromisoformat(s)


def test_streaming_exact_dedup_first_seen_wins(spark, tmp_path):
    from feast_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "in"
    src.mkdir()
    emitted = []

    def write_batch(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    def run_stream():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
        out = streaming_exact_dedup(
            stream, "text", "ts", watermark=timedelta(hours=1)
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    t0 = ts("2024-01-01 10:00:00")
    write_batch(
        "b1",
        [
            Row(doc_id=1, text="Hello  World", ts=t0),
            Row(doc_id=2, text="hello world", ts=t0),  # dup after normalize
            Row(doc_id=3, text="fresh text", ts=t0),
        ],
    )
    run_stream()
    assert sorted(r["doc_id"] for r in emitted) == [1, 3]
    texts = {r["doc_id"]: r["text"] for r in emitted}
    assert texts[1] == "Hello  World"  # original text survives

    # batch 2 through the SAME checkpoint: state remembers fingerprints
    emitted.clear()
    write_batch(
        "b2",
        [
            Row(doc_id=4, text="HELLO\tWORLD ", ts=t0 + timedelta(minutes=5)),
            Row(doc_id=5, text="another new one", ts=t0 + timedelta(minutes=5)),
        ],
    )
    run_stream()
    assert sorted(r["doc_id"] for r in emitted) == [5]


def test_streaming_near_dup_marks_against_batch_index(spark, tmp_path):
    from feast_spark.streaming.dedup import (
        lsh_band_buckets,
        mark_near_dup_candidates,
    )

    corpus = spark.createDataFrame(
        [
            Row(doc_id=100, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=101, text="pack my box with five dozen liquor jugs"),
        ]
    )
    index = lsh_band_buckets(corpus, "doc_id", "text")

    src = tmp_path / "in"
    src.mkdir()
    t0 = ts("2024-01-01 10:00:00")
    spark.createDataFrame(
        [
            # identical to corpus doc 100 -> every band collides
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog", ts=t0),
            Row(doc_id=2, text="completely unrelated sentence about spark plans", ts=t0),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1"))

    # stateless per-micro-batch application: the marking runs INSIDE
    # foreachBatch (an in-plan streaming groupBy would hold one state
    # row per doc forever)
    emitted = []
    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: emitted.extend(
                mark_near_dup_candidates(df, index, "doc_id", "text").collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    marks = {r["doc_id"]: r["near_dup_candidate"] for r in emitted}
    assert marks[1] is True
    assert marks[2] is False


def test_lsh_band_buckets_match_batch_banding(spark):
    """Stream-side band keys must equal the batch fast path's keys for
    the same text (bucket identity agreement)."""
    from feast_spark.streaming.dedup import lsh_band_buckets

    df = spark.createDataFrame([Row(doc_id=1, text="a b c d e f g h")])
    a = {(r["band"], r["bucket"]) for r in lsh_band_buckets(df, "doc_id", "text").collect()}
    b = {(r["band"], r["bucket"]) for r in lsh_band_buckets(df, "doc_id", "text").collect()}
    assert a == b and len(a) == 8  # deterministic, one bucket per band


def test_bucketed_index_marks_identically_no_broadcast(spark, tmp_path):
    """The bucketed-table (shuffle-join) index path marks exactly like
    the broadcast path, and the index side of the join plan carries no
    Exchange (co-located bucketed scan) and no broadcast."""
    from feast_spark.sources.testdata import load_table
    from feast_spark.streaming.dedup import (
        lsh_band_buckets,
        mark_near_dup_candidates,
        publish_band_index,
        read_band_index,
    )
    from tests.conftest import SF_MED

    docs = load_table(spark, SF_MED, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1).limit(60)

    spark.sql("DROP TABLE IF EXISTS band_idx_test")
    publish_band_index(corpus, "band_idx_test", "doc_id", "text")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the shuffle-join path (at test scale AQE would broadcast
    # the tiny index; at corpus scale it cannot — this pins THAT plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = read_band_index(spark, "band_idx_test")
        via_table = mark_near_dup_candidates(
            incoming, idx, "doc_id", "text", broadcast_index=False
        )
        plan = via_table._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan
        # the bucketed index scan joins WITHOUT its own Exchange: the
        # same join against a plain parquet copy of the index needs one
        # more hash-partitioning Exchange
        plain = idx.sparkSession.createDataFrame(
            idx.collect(), idx.schema
        )
        plan_plain = mark_near_dup_candidates(
            incoming, plain, "doc_id", "text", broadcast_index=False
        )._jdf.queryExecution().executedPlan().toString()
        n_bucketed = plan.count("Exchange hashpartitioning")
        n_plain = plan_plain.count("Exchange hashpartitioning")
        assert n_bucketed == n_plain - 1, (n_bucketed, n_plain)
        got_table = {
            (r["doc_id"], r["near_dup_candidate"]) for r in via_table.collect()
        }
        broadcast_ref = lsh_band_buckets(corpus, "doc_id", "text")
        got_bcast = {
            (r["doc_id"], r["near_dup_candidate"])
            for r in mark_near_dup_candidates(
                incoming, broadcast_ref, "doc_id", "text", broadcast_index=True
            ).collect()
        }
        assert got_table == got_bcast
        assert any(hit for _, hit in got_table)  # non-vacuous
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS band_idx_test")


def test_mark_auto_dispatch(spark, tmp_path):
    """auto: tiny parquet-backed index -> broadcast; unknown-size
    in-memory frame -> shuffle path."""
    from feast_spark.streaming.dedup import mark_near_dup_candidates

    incoming = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id INT, text STRING"
    )
    tiny = spark.createDataFrame(
        [(0, 1)], "band INT, bucket LONG"
    )
    p = str(tmp_path / "tiny_idx")
    tiny.write.parquet(p)
    tiny_parquet = spark.read.parquet(p)
    plan_small = mark_near_dup_candidates(
        incoming, tiny_parquet, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small
    plan_mem = mark_near_dup_candidates(
        incoming, tiny, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_mem
