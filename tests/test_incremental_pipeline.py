"""Incremental corpus pipeline: two availableNow streaming rounds feed
an accumulated deduped store; the store must equal the batch dedup of
all input (stream ≡ batch), and the md5-derived split/shard assignments
over the accumulated store must be APPEND-STABLE — a re-run after new
documents arrive never reassigns an existing document's split or shard
(the property that makes incremental corpus building safe: yesterday's
train doc can never silently become tomorrow's test doc)."""

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


def _assignments(df):
    """doc_id -> (split, shard, seq_id) over a deduped store, the
    downstream half of the corpus pipeline (split -> pack)."""
    from feast_spark.functions.split import hash_split
    from feast_spark.operators.packing import pack_sequences

    split = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    packed = pack_sequences(
        split, "doc_id", "n_tokens", 64, n_shards=8, group_cols=["split"]
    )
    return {
        r["doc_id"]: (r["split"], r["shard"], r["seq_id"])
        for r in packed.collect()
    }


def test_incremental_stream_equals_batch_and_assignments_stable(
    spark, tmp_path
):
    from feast_spark.functions.text import token_count
    from feast_spark.operators.docdedup import exact_dedup
    from feast_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "in"
    src.mkdir()
    store = str(tmp_path / "deduped_store")
    t0 = datetime.fromisoformat("2024-01-01 10:00:00")

    def write_files(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    def run_round():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
        out = streaming_exact_dedup(
            stream, "text", "ts", watermark=timedelta(hours=1)
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: df.withColumn(
                    "n_tokens", token_count(F.col("text")).cast("long")
                )
                .drop("__fp")
                .write.mode("append")
                .parquet(store)
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # round 1: 30 docs, one intra-batch duplicate (id 29 dups id 0; the
    # original sorts first so first-seen == min id, matching batch)
    docs1 = [
        Row(
            doc_id=i,
            text=f"document number {i} body " + "tok " * (i % 9),
            ts=t0,
        )
        for i in range(29)
    ] + [Row(doc_id=29, text="document number 0 body ", ts=t0)]
    write_files("b1", docs1)
    run_round()
    acc1 = spark.read.parquet(store)
    assign1 = _assignments(acc1)
    assert set(assign1) == set(range(29))  # dup 29 dropped

    # round 2: 20 new docs + cross-batch duplicates of round-1 texts
    docs2 = [
        Row(
            doc_id=100 + i,
            text=f"fresh round two doc {i} " + "tok " * (i % 7),
            ts=t0 + timedelta(minutes=10),
        )
        for i in range(20)
    ] + [
        Row(doc_id=200, text="document number 3 body tok tok tok ",
            ts=t0 + timedelta(minutes=10)),
        Row(doc_id=201, text="document number 7 body " + "tok " * 7,
            ts=t0 + timedelta(minutes=10)),
    ]
    write_files("b2", docs2)
    run_round()
    acc2 = spark.read.parquet(store)

    # stream ≡ batch: the accumulated store equals batch exact_dedup
    # over the union of both input batches
    all_in = spark.read.schema(SCHEMA).parquet(str(src) + "/*")
    batch = exact_dedup(all_in, "doc_id", "text")
    assert {(r["doc_id"], r["text"]) for r in acc2.select("doc_id", "text").collect()} == {
        (r["doc_id"], r["text"]) for r in batch.collect()
    }

    # append stability: every round-1 doc keeps its split AND shard
    assign2 = _assignments(acc2)
    assert set(assign1) <= set(assign2)
    moved = {
        d: (assign1[d][:2], assign2[d][:2])
        for d in assign1
        if assign1[d][:2] != assign2[d][:2]
    }
    assert not moved, moved

    # determinism: recomputing over the same store reproduces seq ids too
    assert _assignments(acc2) == assign2
