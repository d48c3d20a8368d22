"""Loader for the driver's synthetic testdata (TESTDATA.md).

The ``events`` table carries parquet INT64 TIMESTAMP(NANOS) which Spark
rejects by default (PARQUET_TYPE_ILLEGAL).  We flip
``spark.sql.legacy.parquet.nanosAsLong`` and rebuild a microsecond
TimestampNTZ column with integer division (``div 1000`` — exact on
longs; a double round-trip would lose precision), matching DuckDB's
truncating CAST(ts_ns AS TIMESTAMP) so differential oracles line up.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _ns_timestamp_columns(path: str) -> list[str]:
    try:
        schema = pq.read_schema(_a_parquet_file(path))
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def _a_parquet_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return path


# (path, mtime_ns, size) -> (ns_cols, raw scan StructType).  Schema
# inference on a parquet read launches a footer-reading Spark job per
# call; the bench/driver contract rebuilds every DataFrame per run, so
# that job recurs on EVERY timed query.  The schema is metadata — memo
# it per file identity (mtime+size guards rewrites) and hand it to the
# reader, which then skips inference entirely.  StructType is plain
# Python, so the memo is session-independent.
_SCHEMA_MEMO: dict[tuple, tuple] = {}


def _memo_key(path: str) -> tuple | None:
    # full recursive (relpath, mtime_ns, size) identity — a single
    # representative file's stat would go stale when OTHER files under
    # the path change (appended part files with an evolved schema would
    # be silently projected to the memoized columns)
    from feast_spark.io.pread import _path_token

    token = _path_token(path)
    if token is None:
        return None
    return (os.path.abspath(path), token)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with ns-timestamp repair.

    Rebuilt columns are TIMESTAMP_NTZ wall-clock UTC (session tz pinned
    while converting) so results are timezone-independent and match the
    other tables, which Spark already reads as NTZ."""
    key = _memo_key(path)
    memo = _SCHEMA_MEMO.get(key) if key is not None else None
    if memo is not None:
        ns_cols, schema = memo
    else:
        ns_cols = _ns_timestamp_columns(path)
        schema = None
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            _SCHEMA_MEMO[key] = (ns_cols, df.schema)
    for c in ns_cols:
        df = df.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz")
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
