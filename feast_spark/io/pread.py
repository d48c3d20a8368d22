"""Memoized local parquet reads.

``spark.read.parquet(path)`` runs a footer-reading schema-inference
job on every call.  Snapshot/epoch paths in this package are immutable
once committed (writers always create a NEW directory), so the
inferred schema can be memoized per file identity and handed back to
the reader, which then skips the inference job.  The key includes the
first data file's (mtime_ns, size) so an overwritten path can never
serve a stale schema.

Only LOCAL paths are memoized — remote schemes (s3a:// etc.) skip the
memo (os.stat can't see them) and keep the plain read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_SCHEMA_MEMO: dict[tuple, object] = {}


def _a_parquet_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return path


def _memo_key(path: str) -> tuple | None:
    f = _a_parquet_file(path)
    try:
        st = os.stat(f)
    except OSError:
        return None
    return (os.path.abspath(path), st.st_mtime_ns, st.st_size)


def read_parquet_memo(
    spark: SparkSession, *paths: str, base_path: str | None = None
) -> DataFrame:
    """``spark.read.parquet`` with the inference job memoized away on
    repeat reads of unchanged local paths.

    Multi-path epoch reads key on the tuple of per-path identities;
    ``base_path`` (partition discovery root) is part of the key.  The
    memoized schema is the INFERRED one, so partition columns keep
    their discovered names/types/order and their values still parse
    from the directory names on the schema-provided path."""
    keys = tuple(_memo_key(p) for p in paths)
    key = None if any(k is None for k in keys) else (keys, base_path)
    schema = _SCHEMA_MEMO.get(key) if key is not None else None
    reader = spark.read
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    if schema is not None:
        return reader.schema(schema).parquet(*paths)
    df = reader.parquet(*paths)
    if key is not None:
        _SCHEMA_MEMO[key] = df.schema
    return df
