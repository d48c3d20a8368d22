"""The new corpus operators are stream-compatible where stateless:
chunking and LM scoring run unchanged inside Structured Streaming
micro-batches and agree row-for-row with their batch twins."""

from pyspark.sql import functions as F

from feast_spark.functions.lm import score_char_lm, train_char_lm
from feast_spark.operators.packing import chunk_documents

SCHEMA = "doc_id long, text string"

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "one two three"),
    (3, ""),
    (4, "the quick brown fox jumps over the lazy dog again and again"),
]


def _run_stream(spark, tmp_path, transform):
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(DOCS, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    name = f"mem_{abs(hash(str(tmp_path)))}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_chunk_documents_streaming_matches_batch(spark, tmp_path):
    def transform(df):
        return chunk_documents(df, "doc_id", "text", chunk_tokens=3, overlap=1)

    streamed = _run_stream(spark, tmp_path, transform)
    batch = chunk_documents(
        spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text",
        chunk_tokens=3, overlap=1,
    )
    key = lambda r: (r["doc_id"], r["chunk_id"], r["chunk_text"])  # noqa: E731
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, batch.collect())
    )


def test_lm_scoring_streaming_matches_batch(spark, tmp_path):
    """Train offline, score the stream: the per-doc aggregation makes
    LM scoring a foreachBatch op (each micro-batch is a closed set of
    docs), with the static model broadcast into every batch."""
    corpus = spark.createDataFrame(DOCS, SCHEMA)
    model = train_char_lm(corpus, "text", n=3, vocab_size=200)

    src = tmp_path / "src"
    src.mkdir()
    corpus.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    results = []

    def sink(batch_df, _batch_id):
        results.extend(
            score_char_lm(batch_df, "doc_id", "text", model, n=3).collect()
        )

    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(str(src) + "/*")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_lm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = score_char_lm(corpus, "doc_id", "text", model, n=3)
    got = {r["doc_id"]: r["lm_logprob"] for r in results}
    want = {r["doc_id"]: r["lm_logprob"] for r in batch.collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        if v is None:
            assert got[k] is None
        else:
            assert abs(got[k] - v) < 1e-9


def test_bpe_encode_streaming_matches_batch(spark, tmp_path):
    """A trained BPE model encodes identically inside a streaming
    micro-batch — the encode stage is a narrow map with a broadcast
    model, so it drops into readStream pipelines unchanged."""
    from feast_spark.functions.bpe import encode_bpe, train_bpe

    batch_df = spark.createDataFrame(DOCS, SCHEMA)
    model = train_bpe(batch_df, "text", num_merges=20)

    def transform(df):
        return encode_bpe(df, "text", model)

    streamed = _run_stream(spark, tmp_path, transform)
    batch = encode_bpe(batch_df, "text", model)
    key = lambda r: (r["doc_id"], tuple(r["tokens"]), tuple(r["token_ids"]))  # noqa: E731
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, batch.collect())
    )


def test_compression_stats_streaming_matches_batch(spark, tmp_path):
    from feast_spark.functions.text import with_compression_stats

    def transform(df):
        return with_compression_stats(df, "text")

    streamed = _run_stream(spark, tmp_path, transform)
    batch = with_compression_stats(spark.createDataFrame(DOCS, SCHEMA), "text")
    key = lambda r: (r["doc_id"], r["deflate_ratio"])  # noqa: E731
    assert sorted(map(key, streamed.collect()), key=str) == sorted(
        map(key, batch.collect()), key=str
    )
