"""The sketch and decayed-state tables as real Structured Streaming
sinks: readStream micro-batches folded through foreachBatch converge
to the batch-built state over the same rows."""

import pytest

from datetime import datetime, timedelta

from pyspark.sql import functions as F

SCHEMA = "user_id long, ts timestamp, value double"

ROWS = [
    (u, datetime(2024, 1, d, h), float(u * 10 + d))
    for u in range(1, 6)
    for d in (1, 5, 9, 14)
    for h in (3, 15)
]


pytestmark = pytest.mark.nightly  # slow stream==batch end-to-end replays


def _stream_through(spark, tmp_path, sink_fn):
    """Write the rows as several files, readStream them one file per
    trigger, and drain through foreachBatch (first batch written BEFORE
    the query starts — see the verify-skill streaming gotcha)."""
    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(ROWS, SCHEMA)
    for i, pred in enumerate(
        [F.col("user_id") <= 2, F.col("user_id") == 3, F.col("user_id") >= 4]
    ):
        df.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{i}")
        )
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
        .writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_sketch_table_as_stream_sink(spark, tmp_path):
    from feast_spark.operators.sketches import (
        SketchTable,
        build_distinct_sketches,
        estimate_distinct,
    )

    table = SketchTable(str(tmp_path / "sk"), "user_id", ["day"])

    def sink(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        table.update(
            batch_df.sparkSession, batch_df.withColumn("day", F.to_date("ts"))
        )

    _stream_through(spark, tmp_path, sink)

    batch = spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "day", F.to_date("ts")
    )
    want = estimate_distinct(
        build_distinct_sketches(batch, "user_id", ["day"])
    ).collect()[0]["n_distinct"]
    got = table.estimate(spark).collect()[0]["n_distinct"]
    assert got == want == 5


def test_decayed_table_as_stream_sink(spark, tmp_path):
    import pytest

    from feast_spark.operators.timeseries import (
        DecayedFeatureTable,
        decayed_agg,
    )

    hl = timedelta(days=7)
    table = DecayedFeatureTable(
        str(tmp_path / "dk"), ["user_id"], "ts", "value", hl
    )

    def sink(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        table.update(batch_df.sparkSession, batch_df)

    _stream_through(spark, tmp_path, sink)

    batch = spark.createDataFrame(ROWS, SCHEMA)
    final_at = batch.agg(F.max("ts")).collect()[0][0]
    want = {
        r["user_id"]: r["decayed_sum"]
        for r in decayed_agg(
            batch, ["user_id"], "ts", "value", hl, final_at
        ).collect()
    }
    # micro-batches arrived keyed by USER, not time — maximally
    # out-of-order folds — yet the state must still converge (each
    # batch's as_of differs, rebasing bridges them)
    got = {
        r["user_id"]: r["decayed_sum"]
        for r in table.features(spark, final_at).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9)
