"""Sessionization — event streams into per-key activity sessions.

A session = a maximal run of events for one key where consecutive events
are no more than ``gap`` apart.  The classic training-data / behavioral
feature op the reference lacks (its streaming story stops at declared
sources, SURVEY §2 ST1/ST2).

Batch formulation is gaps-and-islands, fully window-function native:

    brk  = (ts - lag(ts) > gap)              -- session boundary flags
    sess = running_sum(brk)                  -- island id per key
    groupBy(key, sess).agg(min/max/count)    -- one row per session

Scale shape: ONE shuffle on the key (both windows and the final agg
share the ``key`` partitioning — Catalyst reuses the exchange), no
self-joins, no Python.  Skewed keys are bounded by per-key event counts,
not the corpus, and AQE handles residual skew in the agg.

The streaming twin (``feast_spark.streaming.stateful.sessionize_stream``)
keeps (start, end, count) per open session in GroupState and emits on
gap timeout — same output schema, so batch backfill and live streams
can feed one sessions table.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: timedelta,
    session_col: str = "session_id",
) -> DataFrame:
    """One row per (key, session): session ordinal (0-based per key),
    session_start, session_end, n_events.

    Ties on ``ts`` never open a new session (0 <= 0 is within any gap).
    """
    gap_s = int(gap.total_seconds())
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    # interval arithmetic works for TIMESTAMP and TIMESTAMP_NTZ alike
    # (a long cast would reject NTZ)
    brk = (
        F.when(
            F.col(ts_col)
            > F.lag(F.col(ts_col)).over(w)
            + F.expr(f"INTERVAL {gap_s} SECONDS"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__brk")
    )
    run = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_sess = df.select(*key_cols, F.col(ts_col), brk).withColumn(
        session_col, F.sum("__brk").over(run).cast("long")
    )
    return (
        with_sess.groupBy(*key_cols, session_col)
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
