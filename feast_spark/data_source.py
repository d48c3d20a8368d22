"""Physical source descriptors.

Mirrors the reference's DataSource hierarchy (sdk/python/feast/
data_source.py:221-547): the four universal knobs are
event_timestamp_column / created_timestamp_column / field_mapping /
date_partition_column.  On Spark, a batch source resolves to
``spark.read.<format>(path)`` or ``spark.sql(query)`` plus a rename map;
a stream source resolves to ``spark.readStream``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class DataSource:
    event_timestamp_column: str = ""
    created_timestamp_column: str = ""
    field_mapping: dict[str, str] = field(default_factory=dict)
    date_partition_column: str = ""

    def load(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    def apply_field_mapping(self, df: DataFrame) -> DataFrame:
        """P1 — forward rename of source columns (provider.py:251-260)."""
        if not self.field_mapping:
            return df
        return df.withColumnsRenamed(self.field_mapping)

    # -- serialization -------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "kind": type(self).__name__,
            "event_timestamp_column": self.event_timestamp_column,
            "created_timestamp_column": self.created_timestamp_column,
            "field_mapping": self.field_mapping,
            "date_partition_column": self.date_partition_column,
        }

    @staticmethod
    def from_dict(d: dict) -> "DataSource":
        kind = d.get("kind", "FileSource")
        cls = {
            "FileSource": FileSource,
            "SparkSqlSource": SparkSqlSource,
            "KafkaSource": KafkaSource,
            "KinesisSource": KinesisSource,
        }[kind]
        d = {k: v for k, v in d.items() if k != "kind"}
        return cls(**d)


@dataclass
class FileSource(DataSource):
    """S1 — file scan (reference FileSource, file.py:286-393).

    ``path`` may be a single file, a directory, or a glob; ``file_format``
    one of parquet/csv/json/orc.  At scale, write sources partitioned by
    ``date_partition_column`` so Catalyst partition-prunes time filters.

    A ``path`` that is a MANIFEST TABLE root (io/manifest.py —
    ``_MANIFEST.json`` with a ``current`` pointer, e.g. a versioned
    dataset committed by ``datasets.commit_dataset`` or an
    incrementally-maintained rollup) is detected at load time and
    resolved THROUGH the manifest: the scan reads one immutable
    committed snapshot, so a concurrent re-run's half-written version
    directory is structurally invisible, and a feature view can be fed
    by a pipeline that re-commits under it without torn reads.
    ``as_of`` (commit seq or tag name) pins the source to an archived
    snapshot — a feature view over "the corpus the June model trained
    on" — and requires parquet format (manifest tables are parquet)."""

    path: str = ""
    file_format: str = "parquet"
    as_of: "int | str | None" = None

    def _manifest_table(self, spark: SparkSession | None = None):
        """The ManifestedParquetTable at ``path``, or None when path is
        a plain file/dir/glob.  Local paths are probed with os.path
        (no Spark needed); a path carrying a URI scheme (``s3a://``,
        ``gs://``, ``hdfs://``, ``file://``...) is probed through the
        SAME Hadoop connectors Spark reads the data with (io/fs.py
        HadoopFS) — os.path can't see remote stores, and silently
        falling through to ``spark.read.parquet(root)`` would
        recursively scan EVERY retained ``v_*`` snapshot, serving
        duplicated rows across versions as feature data."""
        import os
        import posixpath

        if "*" in self.path:
            return None
        from feast_spark.io.manifest import MANIFEST, ManifestedParquetTable

        if "://" in self.path:
            if spark is None:
                return None
            from feast_spark.io.fs import HadoopFS

            fs = HadoopFS(spark)
            if not fs.exists(posixpath.join(self.path, MANIFEST)):
                return None
            return ManifestedParquetTable(self.path, fs=fs)
        if not os.path.isdir(self.path):
            return None
        if not os.path.exists(posixpath.join(self.path, MANIFEST)):
            return None
        return ManifestedParquetTable(self.path)

    def load(self, spark: SparkSession) -> DataFrame:
        t = self._manifest_table(spark)
        if t is not None:
            if self.file_format != "parquet":
                raise ValueError(
                    "manifest-table sources are parquet; got "
                    f"file_format={self.file_format!r}"
                )
            df = t.read(spark, as_of=self.as_of)
            if df is None:
                raise ValueError(f"no committed snapshot at {self.path}")
            return self.apply_field_mapping(df)
        if self.as_of is not None:
            raise ValueError(
                f"as_of={self.as_of!r} needs a manifest-table source "
                f"(io/manifest.py), but {self.path} is a plain "
                "file/dir/glob with no commit history"
            )
        reader = spark.read
        if self.file_format == "parquet":
            df = reader.parquet(self.path)
        elif self.file_format == "csv":
            df = reader.option("header", "true").option("inferSchema", "true").csv(self.path)
        elif self.file_format == "json":
            df = reader.json(self.path)
        elif self.file_format == "orc":
            df = reader.orc(self.path)
        else:
            raise ValueError(f"unsupported file format: {self.file_format}")
        return self.apply_field_mapping(df)

    def to_dict(self) -> dict:
        d = super().to_dict()
        d.update({"path": self.path, "file_format": self.file_format})
        if self.as_of is not None:
            d["as_of"] = self.as_of
        return d


@dataclass
class SparkSqlSource(DataSource):
    """S2 — table or arbitrary SQL subquery as a source
    (reference get_table_query_string, bigquery.py:794-799)."""

    table: str = ""
    query: str = ""

    def load(self, spark: SparkSession) -> DataFrame:
        if self.query:
            df = spark.sql(self.query)
        elif self.table:
            df = spark.table(self.table)
        else:
            raise ValueError("SparkSqlSource needs table or query")
        return self.apply_field_mapping(df)

    def to_dict(self) -> dict:
        d = super().to_dict()
        d.update({"table": self.table, "query": self.query})
        return d


@dataclass
class KafkaSource(DataSource):
    """S3 — declared Kafka stream source (data_source.py:380-462).

    ``message_format``: 'json' | 'avro' | 'proto'.  Resolves to
    ``spark.readStream.format("kafka")``; payload parsing happens in
    feast_spark.streaming.ingest.
    """

    bootstrap_servers: str = ""
    topic: str = ""
    message_format: str = "json"
    schema_json: str = ""  # JSON-serialized Spark schema for the payload

    def load_stream(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topic)
            .load()
        )

    def load(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError("KafkaSource is stream-only; use load_stream")

    def to_dict(self) -> dict:
        d = super().to_dict()
        d.update(
            {
                "bootstrap_servers": self.bootstrap_servers,
                "topic": self.topic,
                "message_format": self.message_format,
                "schema_json": self.schema_json,
            }
        )
        return d


@dataclass
class KinesisSource(DataSource):
    """S4 — declared Kinesis stream source (data_source.py:465-547)."""

    region: str = ""
    stream_name: str = ""
    record_format: str = "json"  # 'json' | 'avro' | 'proto'
    schema_json: str = ""  # payload schema, same contract as KafkaSource

    def load_stream(self, spark: SparkSession) -> DataFrame:
        """Requires a Kinesis connector on the classpath (spark-sql-
        kinesis / kinesis-asl — not bundled with Spark).  Payload
        parsing (streaming.ingest.parse_kinesis_stream) is connector-
        independent: every connector lands records in a ``data``
        binary column."""
        try:
            return (
                spark.readStream.format("kinesis")
                .option("streamName", self.stream_name)
                .option("region", self.region)
                .load()
            )
        except Exception as e:
            raise NotImplementedError(
                "no Kinesis connector on the classpath; provision "
                "spark-sql-kinesis or kinesis-asl"
            ) from e

    def load(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError("KinesisSource is stream-only; use load_stream")

    def to_dict(self) -> dict:
        d = super().to_dict()
        d.update(
            {
                "region": self.region,
                "stream_name": self.stream_name,
                "record_format": self.record_format,
                "schema_json": self.schema_json,
            }
        )
        return d
