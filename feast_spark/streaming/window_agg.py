"""Watermarked streaming window aggregation — the Structured-Streaming
twin of ``operators.window_agg.tumbling_window_agg``.

The reference declares stream sources but has no stream execution
(SURVEY §2 ST1/ST2; docs/reference/feast-and-spark.md delegates to
external Spark jobs). Here the rollup that a batch backfill computes is
the SAME declarative agg run incrementally:

    readStream -> withWatermark(ts, delay) -> groupBy(keys, window(ts))

In append output mode a (keys, window) row is emitted exactly once,
when the watermark passes window_end — i.e. the window has CLOSED and
late events within the allowed delay have been folded in. Events later
than the watermark are dropped by Spark's state store, which is the
streaming analog of the batch operator's determinism: both emit one
final row per (keys, window).

Scale: state is O(open windows x keys), bounded by the watermark delay;
partial aggregation runs map-side per micro-batch, so the state-store
shuffle carries (key, window, partial-agg) rows, never raw events.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_spark.operators.window_agg import _agg_cols

__all__ = ["streaming_tumbling_agg"]


def streaming_tumbling_agg(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window: timedelta,
    aggs: dict[str, tuple[str, str]],
    watermark: timedelta = timedelta(seconds=0),
    emit_ts_col: str = "event_ts",
) -> DataFrame:
    """Streaming one-row-per-(keys, window) rollup.

    Same ``aggs`` spec and output schema as the batch
    ``tumbling_window_agg`` (window_start + ``emit_ts_col`` =
    window_end), so a stream and its batch backfill produce
    byte-identical feature rows for closed windows — pinned by
    ``tests/test_streaming_window_agg.py``.

    ``watermark`` is the max accepted event-time lateness; with the
    default 0 a window closes as soon as any later event arrives.
    """
    secs = int(window.total_seconds())
    win = F.window(F.col(ts_col), f"{secs} seconds")
    return (
        stream_df.withWatermark(ts_col, f"{int(watermark.total_seconds())} seconds")
        .groupBy(*key_cols, win.alias("__w"))
        .agg(*_agg_cols(aggs))
        .withColumn("window_start", F.col("__w.start"))
        .withColumn(emit_ts_col, F.col("__w.end"))
        .drop("__w")
    )
