"""End-to-end streaming corpus pipeline identity:

    readStream -> quarantine -> near-dup dedup against the persisted
    minhash index -> exactly-once index append of the survivors ->
    static-dim enrichment -> sink

asserted row-for-row equal to the batch twin that processes the same
slices in the same order (quarantine -> dedup_against_index ->
minhash_index_append -> enrich per slice), including a
checkpoint-restart delivering a LATE slice and an idle re-run that
must not re-append or re-emit anything (the index sink's stream_epoch
watermark).  This composes the pieces the per-module suites pin in
isolation — the claim here is that the composition itself is
stream≡batch."""

import pytest

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from feast_spark.operators.expectations import quarantine, row_not_null
from feast_spark.operators.minhash_index import (
    build_minhash_index,
    dedup_against_index,
    minhash_index_append,
)
from feast_spark.streaming.index_sink import minhash_index_sink

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_CORPUS = [
    (i, f"corpus document number {i} about topic {i % 5} with words "
        f"alpha{i} beta{i} gamma{i} delta{i}", f"src{i % 3}")
    for i in range(20)
]

# slice 1: 100/101 duplicate corpus texts, 102 is quarantined (NULL
# text), 103-105 are fresh survivors
_B1 = [
    (100, _CORPUS[3][1], "src0"),
    (101, _CORPUS[7][1], "src1"),
    (102, None, "src2"),
    (103, "fresh streamed doc epsilon zeta eta theta one oh three", "src0"),
    (104, "another fresh doc iota kappa lambda mu one oh four", "src1"),
    (105, "third fresh doc nu xi omicron pi one oh five", "src2"),
]

# slice 2 (late, delivered after a restart): 200 duplicates a slice-1
# SURVIVOR (so the dedup must see stream-appended epochs, not just the
# seed corpus), 201 duplicates a corpus text, 202 quarantined, 203 fresh
_B2 = [
    (200, _B1[3][1], "src1"),
    (201, _CORPUS[11][1], "src2"),
    (202, None, "src0"),
    (203, "late fresh doc rho sigma tau upsilon two oh three", "src1"),
]

pytestmark = pytest.mark.nightly  # slow stream==batch end-to-end replays


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {"text_not_null": row_not_null("text")}


def _drop_ids(pairs):
    """Survivor policy shared by both twins: a new doc is dropped when
    it pairs with ANY lower id — corpus ids are all lower, and for
    new-vs-new pairs the earliest id survives (pairs carry id_a <
    id_b, so id_b is always the loser)."""
    return pairs.select(F.col("id_b").alias("doc_id")).distinct()


def _enrich(df, dim):
    return df.join(F.broadcast(dim), "source", "left").select(
        "doc_id", "text", "source", "reputation"
    )


def _process_slice(spark, index_path, slice_df, dim, append_fn):
    """One slice through the shared pipeline; returns (kept+enriched
    rows, quarantined ids).  ``append_fn(keep)`` is the only thing the
    stream and batch twins do differently."""
    good, bad = quarantine(slice_df, _rules())
    pairs = dedup_against_index(
        spark, index_path, good, threshold=0.9, max_bucket_size=None
    )
    keep = good.join(_drop_ids(pairs), "doc_id", "left_anti")
    append_fn(keep)
    return (
        _enrich(keep, dim).collect(),
        [r["doc_id"] for r in bad.collect()],
    )


def test_streaming_corpus_pipeline_equals_batch(spark, tmp_path):
    dim = spark.createDataFrame(
        [("src0", 1.0), ("src1", 2.0), ("src2", 3.0)],
        "source STRING, reputation DOUBLE",
    )
    corpus = spark.createDataFrame(_CORPUS, DOC_SCHEMA)

    # --- streaming twin ---
    stream_idx = str(tmp_path / "stream_idx")
    build_minhash_index(corpus, stream_idx, "doc_id", "text")
    sink = minhash_index_sink(spark, stream_idx)
    collected, dead = [], []

    def handler(batch_df, epoch_id):
        rows, bad_ids = _process_slice(
            spark, stream_idx, batch_df, dim,
            lambda keep: sink(keep, epoch_id),
        )
        collected.extend(rows)
        dead.extend(bad_ids)

    src = tmp_path / "in"
    src.mkdir()

    def write_slice(name, rows):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    def run_stream():
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(str(src) + "/*")
        q = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_slice("b1", _B1)
    run_stream()
    write_slice("b2", _B2)  # late slice, delivered via restart
    run_stream()
    n_rows_after_two = len(collected)
    with open(f"{stream_idx}/_MANIFEST.json") as f:
        epochs_after_two = json.load(f)["epochs"]
    run_stream()  # idle re-run: nothing new -> nothing appended/emitted
    assert len(collected) == n_rows_after_two
    with open(f"{stream_idx}/_MANIFEST.json") as f:
        assert json.load(f)["epochs"] == epochs_after_two

    # --- batch twin: same slices, same order, direct calls ---
    batch_idx = str(tmp_path / "batch_idx")
    build_minhash_index(corpus, batch_idx, "doc_id", "text")
    batch_rows, batch_dead = [], []
    for rows in (_B1, _B2):
        got, bad_ids = _process_slice(
            spark, batch_idx,
            spark.createDataFrame(rows, DOC_SCHEMA), dim,
            lambda keep: minhash_index_append(spark, batch_idx, keep),
        )
        batch_rows.extend(got)
        batch_dead.extend(bad_ids)

    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(map(tuple, collected), key=lambda t: t[0]) == sorted(
        map(tuple, batch_rows), key=lambda t: t[0]
    )
    assert sorted(dead) == sorted(batch_dead) == [102, 202]
    # the dup structure the pipeline enforced: copies of corpus and of
    # the slice-1 survivor are gone, fresh docs kept and enriched
    kept_ids = sorted(r["doc_id"] for r in collected)
    assert kept_ids == [103, 104, 105, 203]
    assert all(r["reputation"] is not None for r in collected)

    # final indexes answer identically: probing with copies of every
    # kept doc must find the same dup pairs in both
    probe = spark.createDataFrame(
        [(900 + i, t, s) for i, (_, t, s) in enumerate(_B1[3:] + _B2[3:])],
        DOC_SCHEMA,
    )
    p_stream = sorted(
        map(
            tuple,
            dedup_against_index(
                spark, stream_idx, probe, threshold=0.9, max_bucket_size=None
            ).collect(),
        )
    )
    p_batch = sorted(
        map(
            tuple,
            dedup_against_index(
                spark, batch_idx, probe, threshold=0.9, max_bucket_size=None
            ).collect(),
        )
    )
    assert p_stream == p_batch
    assert len(p_stream) >= 4  # every probe copy found its original
