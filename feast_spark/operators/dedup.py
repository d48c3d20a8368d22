"""A1/A2 — latest-per-key dedup ("argmax by timestamp") and time-range pull.

Mirrors the reference's pull_latest_from_table_or_query
(infra/offline_stores/file.py:218-272, bigquery.py:60-96,
redshift.py:48-97): keep one newest row per entity key within a window,
ordering by event_ts DESC, created_ts DESC.

Window convention (SURVEY §7 "What's hard"): **half-open [start, end)**
for materialization (the pandas engine's choice, FO:259-262); retrieval
as-of windows are inclusive [t-ttl, t] (see asof_join.py).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_range_filter(
    df: DataFrame,
    ts_col: str,
    start: datetime | None = None,
    end: datetime | None = None,
) -> DataFrame:
    """P3 — event_ts in [start, end). Catalyst pushes this into the scan."""
    if start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.filter(F.col(ts_col) < F.lit(end))
    return df


def latest_per_key(
    df: DataFrame,
    join_keys: list[str],
    ts_col: str,
    created_col: str | None = None,
    start: datetime | None = None,
    end: datetime | None = None,
) -> DataFrame:
    """One newest row per key: ROW_NUMBER() OVER (PARTITION BY keys
    ORDER BY ts DESC[, created DESC]) = 1.

    Single shuffle on the keys; the time filter runs before the shuffle
    and is pushed into the parquet scan (min/max row-group skipping).
    """
    df = time_range_filter(df, ts_col, start, end)
    order = [F.col(ts_col).desc()]
    if created_col:
        order.append(F.col(created_col).desc())
    w = Window.partitionBy(*join_keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
