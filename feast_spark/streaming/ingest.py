"""ST2 — stream-to-online ingestion with Structured Streaming.

The reference only *declares* stream sources (data_source.py:380-547) and
delegates execution to externally-launched Spark jobs
(docs/reference/feast-and-spark.md).  Here the capability is native:

    readStream -> parse payload -> watermark(ttl) -> foreachBatch:
        per-batch latest-per-key dedup -> online upsert

Semantics are identical to batch ``materialize`` (A1 + created_ts
tie-break + newest-wins upsert), so ingestion order does not matter and
the offline/online consistency contract holds for late or reordered
events — the same property the reference gets implicitly from
event-time + created_ts (SURVEY §2 ST2 row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from feast_spark.data_source import KafkaSource
from feast_spark.feature_view import FeatureView
from feast_spark.online.store import OnlineStore
from feast_spark.operators.dedup import latest_per_key


def parse_kafka_stream(raw: DataFrame, source: KafkaSource) -> DataFrame:
    """kafka key/value/timestamp -> payload columns.

    json payloads parse with from_json against the declared schema;
    avro would use pyspark.sql.avro.functions.from_avro (same shape) —
    the spark-avro package isn't bundled in this environment, so that
    branch raises until it is.
    """
    if source.message_format == "json":
        schema = StructType.fromJson(__import__("json").loads(source.schema_json))
        parsed = raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("j")
        ).select("j.*")
    elif source.message_format == "avro":
        raise NotImplementedError(
            "avro payloads need the spark-avro package (from_avro); "
            "declare message_format='json' in this environment"
        )
    else:
        raise ValueError(f"unsupported message_format {source.message_format!r}")
    return source.apply_field_mapping(parsed)


def stream_to_online(
    stream_df: DataFrame,
    store: OnlineStore,
    project: str,
    view: FeatureView,
    join_keys: list[str],
    ts_col: str,
    created_col: str | None = None,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Start the stream-materialization query.  Returns the
    StreamingQuery handle; call ``.awaitTermination()`` on it.

    Watermarking: the per-batch dedup + newest-wins upsert make the sink
    idempotent and order-insensitive, so a watermark is not needed for
    correctness — only to bound state if a stateful op is added upstream.
    """
    feature_cols = [f for f in view.feature_names]
    if view.ttl is not None:
        stream_df = stream_df.withWatermark(
            ts_col, f"{int(view.ttl.total_seconds())} seconds"
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        latest = latest_per_key(batch_df, join_keys, ts_col, created_col)
        store.online_write_batch(
            batch_df.sparkSession,
            project,
            view.name,
            latest,
            join_keys,
            ts_col,
            created_col,
            feature_cols,
        )

    writer = stream_df.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
