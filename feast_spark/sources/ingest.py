"""S5 — batch ingestion: CSV/JSON/parquet (or a DataFrame) into a
date-partitioned parquet source.

Mirrors Client.ingest (reference client.py:789-917 +
loaders/ingest.py:51-168: format sniffing, chunking, optional
date-partitioned upload).  Spark-native: the chunking loop disappears
(`df.write` is already distributed) and ``partitionBy(date_col)`` makes
Catalyst partition-prune later time-range scans — the reference's
date_partition_column optimization (data_source.py:294-306) for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.data_source import FileSource


def sniff_format(path: str) -> str:
    """Format sniffing by extension (ingest.py:123-168's logic without
    the pyarrow probe)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".csv", ".tsv"):
        return "csv"
    if ext in (".json", ".jsonl", ".ndjson"):
        return "json"
    if ext in (".parquet", ".pq"):
        return "parquet"
    raise ValueError(f"cannot sniff ingestion format of {path!r}")


def ingest(
    spark: SparkSession,
    data: DataFrame | str,
    dest: FileSource,
    mode: str = "append",
) -> None:
    """Read (if a path) and write to the destination FileSource's path,
    partitioned by its date_partition_column when declared.

    The partition column is derived from the event timestamp as a DATE —
    matching loaders/ingest.py:82-121's date-partitioned upload."""
    if isinstance(data, str):
        fmt = sniff_format(data)
        if fmt == "csv":
            df = (
                spark.read.option("header", "true")
                .option("inferSchema", "true")
                .csv(data)
            )
        elif fmt == "json":
            df = spark.read.json(data)
        else:
            df = spark.read.parquet(data)
    else:
        df = data

    # reverse field mapping: user-facing names -> physical source names
    if dest.field_mapping:
        reverse = {v: k for k, v in dest.field_mapping.items()}
        df = df.withColumnsRenamed(reverse)

    writer = df.write.mode(mode)
    if dest.date_partition_column:
        if dest.date_partition_column not in df.columns:
            if not dest.event_timestamp_column:
                raise ValueError(
                    "date_partition_column declared but neither it nor an "
                    "event_timestamp_column exists to derive it from"
                )
            df = df.withColumn(
                dest.date_partition_column,
                F.to_date(F.col(dest.event_timestamp_column)),
            )
            writer = df.write.mode(mode)
        writer = writer.partitionBy(dest.date_partition_column)
    writer.parquet(dest.path)
