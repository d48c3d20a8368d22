"""Data-layout maintenance: compaction, clustering, and Z-order-lite
multi-column interleaving for scan pruning.

The reference writes feature tables as plain parquet/BigQuery and
leaves physical layout to the warehouse (file_source declarations,
data_source.py; BQ handles layout server-side).  On a data lake at
100 TB, layout IS the query planner's best lever: parquet row-group
min/max statistics prune I/O only if rows with nearby key values sit
in the same files.  This module provides the OPTIMIZE-shaped
maintenance pass (the public Delta/Iceberg pattern) as plain Spark:

- ``compact``: coalesce a small-files table into ``target_file_mb``
  outputs — pure repartition + write, fixing the streaming-ingest
  many-tiny-files problem (each micro-batch writes a file).
- ``cluster_by``: range-repartition on the cluster keys + sort within
  partitions before writing.  Each output file then covers a narrow
  key range, so min/max pruning skips whole files for point/range
  predicates on those keys.
- ``zorder_key``: interleave the bits of several normalized columns
  into one clustering key (Morton order) — clustering on it gives
  EVERY participating column partial locality, the standard
  multi-dimension pruning trade (public technique; Delta's OPTIMIZE
  ZORDER BY popularized it).
- ``layout_stats``: per-file min/max of the clustering columns read
  back from the written table — the observable that tests pin to
  prove files are disjoint (pruning-effective) instead of trusting
  the write path.

Everything is expressed as DataFrame ops (range partitioner + sort +
columnar write); no driver-side data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ZBITS = 16  # bits per dimension in the interleaved key


def zorder_key(cols: list[str], bits: int = _ZBITS) -> F.Column:
    """Morton-interleave ``cols`` into one long.

    Each column is rank-normalized into [0, 2^bits) via percent_rank
    over a global ordering?  No — a global rank would shuffle.  At
    maintenance time the cheap, shuffle-free normalization is hashing
    each value to ``bits`` bits (xxhash64 & mask): equal values land
    together (locality for equality predicates on every dimension)
    while the interleave spreads distinct values uniformly.  For
    RANGE predicates use ``cluster_by`` on the natural column order
    instead — hashing destroys range locality by design."""
    if not cols or bits * len(cols) > 63:
        raise ValueError(
            f"zorder needs 1..{63 // _ZBITS} columns at {bits} bits each"
        )
    dims = [
        F.xxhash64(F.col(c)).bitwiseAND(F.lit((1 << bits) - 1)) for c in cols
    ]
    key = F.lit(0).cast("long")
    # bit i of dim d goes to position i * ndims + d
    for i in range(bits):
        for d, dim in enumerate(dims):
            bit = F.shiftright(dim, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, i * len(dims) + d).cast("long")
            )
    return key


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 512,
) -> int:
    """Rewrite a many-small-files parquet table into ~target-sized
    files; returns the output file count.  Partition count derives
    from the table's on-disk bytes (cheap: filesystem metadata via the
    input_file listing, no data read)."""
    df = spark.read.parquet(path)
    # on-disk size via the file index (metadata only); the Hadoop
    # FileSystem API resolves any scheme the cluster does (s3a, gs,
    # hdfs, file), with a posix fallback for bare local paths
    files = [r["f"] for r in
             df.select(F.input_file_name().alias("f")).distinct().collect()]
    total = 0
    try:
        jvm = spark._jvm  # type: ignore[attr-defined]
        hconf = spark._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
        for f in files:
            jp = jvm.org.apache.hadoop.fs.Path(f)
            total += jp.getFileSystem(hconf).getFileStatus(jp).getLen()
    except Exception:
        import os
        from urllib.parse import urlparse

        total = 0
        for f in files:
            try:
                total += os.path.getsize(urlparse(f).path)
            except OSError:
                total = 0
                break
    n_parts = max(1, -(-total // (target_file_mb * 1024 * 1024))) if total else 1
    df.repartition(n_parts).write.mode("overwrite").parquet(out_path)
    return len(
        spark.read.parquet(out_path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )


def cluster_by(
    df: DataFrame,
    out_path: str,
    cols: list[str],
    n_files: int | None = None,
    zorder: bool = False,
) -> None:
    """Range-repartition on ``cols`` (or the interleaved z-key) and
    sort within partitions before writing — each output file covers a
    narrow, mostly-disjoint range of the leading cluster key, which is
    exactly what parquet min/max file skipping needs.

    RepartitionByRange samples the keys to build the range bounds (no
    full sort); the within-partition sort is spill-safe.  ``zorder``
    switches the clustering key to the Morton interleave for
    multi-column equality workloads."""
    if zorder:
        work = df.withColumn("__zkey", zorder_key(cols))
        keys = [F.col("__zkey")]
    else:
        work = df
        keys = [F.col(c) for c in cols]
    parted = (
        work.repartitionByRange(n_files, *keys)
        if n_files
        else work.repartitionByRange(*keys)
    )
    out = parted.sortWithinPartitions(*keys)
    if zorder:
        out = out.drop("__zkey")
    out.write.mode("overwrite").parquet(out_path)


def layout_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of ``cols`` — the pruning-effectiveness
    observable.  Disjoint [min, max] ranges across files mean a point
    predicate touches one file; tests assert this instead of trusting
    the writer."""
    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("file").agg(*aggs)


def overlap_fraction(stats, col: str) -> float:
    """Fraction of file pairs whose [min, max] ranges on ``col``
    overlap (0.0 = perfectly disjoint layout).  Driver-side over the
    per-FILE stats frame — one row per file, never per data row."""
    rows = stats.select(f"min_{col}", f"max_{col}").collect()
    spans = [(r[0], r[1]) for r in rows]
    n = len(spans)
    if n < 2:
        return 0.0
    overlaps = 0
    pairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            pairs += 1
            lo = max(spans[i][0], spans[j][0])
            hi = min(spans[i][1], spans[j][1])
            if lo <= hi:
                overlaps += 1
    return overlaps / pairs
