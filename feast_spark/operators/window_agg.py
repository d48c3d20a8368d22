"""Windowed aggregate rollups — derive feature values from raw events.

The reference engine only *moves* precomputed feature values through
time (SURVEY §2 "Aggregations — not present"); computing them is left to
upstream pipelines.  Here rollups are first-class, so a raw event stream
becomes a feature view in one declarative step:

* ``tumbling_window_agg`` — aligned fixed windows (hourly/daily stats
  per key).  groupBy(key, window(ts)) => hash agg with map-side partial
  combine; ONE shuffle of (key, window, partial-aggs), never raw events.
  The windowed row stamped with ``event_ts = window_end`` is directly
  consumable by the point-in-time join ("stats as of the last closed
  hour"), matching how later Feast versions define stream aggregations.

* ``rolling_window_agg`` — per-event trailing windows (value of "sum of
  the last 7 days" AT each event): RANGE BETWEEN frame over the key
  partition; one shuffle, sort within partition, no self-join.

At 100 TB: both are single-shuffle; the tumbling agg's shuffle volume is
O(distinct (key, window)), so a year of hourly windows per key is ~9k
rows per key regardless of event count.  Skewed keys are handled by AQE
(partial aggregation already collapsed the map side).

Structured-Streaming twin: the same groupBy(window(ts), key) agg with
``withWatermark`` runs incrementally; semantics here are the batch
backfill of that stream.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def _agg_cols(aggs: dict[str, tuple[str, str]]) -> list[Column]:
    cols = []
    for out_name, (fn, col) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(
                f"unsupported agg {fn!r}; one of {sorted(_AGG_FNS)}"
            )
        cols.append(_AGG_FNS[fn](col).alias(out_name))
    return cols


def tumbling_window_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window: timedelta,
    aggs: dict[str, tuple[str, str]],
    emit_ts_col: str = "event_ts",
) -> DataFrame:
    """One row per (keys, window) with the requested aggregates.

    ``aggs``: {output_name: (fn, input_col)} with fn in
    sum/avg/min/max/count.  Output carries window_start plus
    ``emit_ts_col`` = window_end — the timestamp at which the closed
    window's stats become observable, i.e. the event_ts for a
    PIT-joinable feature view (no training-serving leakage: a window is
    only visible at/after its end).
    """
    secs = int(window.total_seconds())
    win = F.window(F.col(ts_col), f"{secs} seconds")
    return (
        df.groupBy(*key_cols, win.alias("__w"))
        .agg(*_agg_cols(aggs))
        .withColumn("window_start", F.col("__w.start"))
        .withColumn(emit_ts_col, F.col("__w.end"))
        .drop("__w")
    )


def rolling_window_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    lookback: timedelta,
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Trailing-window aggregates AT each event row: for every input row,
    aggregate over the key's rows with ts in [row.ts - lookback, row.ts]
    (inclusive — the same bounds as the PIT join's ttl, SURVEY §2.1).

    RANGE frame over unix microseconds; ties on ts are all included (a
    RANGE frame, not ROWS, so equal timestamps aggregate together
    deterministically)."""
    secs = int(lookback.total_seconds())
    order = F.col(ts_col).cast("timestamp").cast("double")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order)
        .rangeBetween(-secs, 0)
    )
    out = df
    for out_name, (fn, col) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(
                f"unsupported agg {fn!r}; one of {sorted(_AGG_FNS)}"
            )
        out = out.withColumn(out_name, _AGG_FNS[fn](col).over(w))
    return out


def with_lag_features(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    lags: list[int] = (1,),
    deltas: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key lag/delta features: for each value column ``v`` and lag
    ``k``, add ``v_lag{k}`` (the value k events earlier in time order)
    and — with ``deltas`` — ``v_delta{k}`` (current minus lagged;
    NULL while fewer than k prior events exist, matching SQL LAG).
    The bread-and-butter temporal features (previous transaction
    amount, change since last login) the rollup family doesn't cover.

    One shuffle + one sort (a single window partition over the keys,
    shared by every lag/col — Catalyst collapses the LAG expressions
    into one Window node), bounded O(max_lag) state per key during the
    sort.  Determinism under ts ties needs ``tiebreak_col`` (same
    stance as ``timeseries.sliding_windows``)."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df
    for v in value_cols:
        for k in lags:
            if k <= 0:
                raise ValueError(f"lags must be positive, got {k}")
            lagged = F.lag(F.col(v), k).over(w)
            out = out.withColumn(f"{v}_lag{k}", lagged)
            if deltas:
                out = out.withColumn(
                    f"{v}_delta{k}", F.col(v) - F.col(f"{v}_lag{k}")
                )
    return out


def with_rolling_zscore(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window: timedelta,
    out_col: str | None = None,
    min_periods: int = 2,
) -> DataFrame:
    """Per-key rolling z-score: how anomalous is this value against
    the key's own trailing ``window`` (current row included) —
    ``(value - rolling_mean) / rolling_std`` with sample std.  Rows
    with fewer than ``min_periods`` events in the window, or zero
    variance, get NULL (no anomaly verdict is honest there).  The
    anomaly-feature staple (fraud spikes, sensor drift) as ONE RANGE
    frame — same single-shuffle cost argument as
    ``rolling_window_agg``, state bounded by the window span."""
    out_col = out_col or f"{value_col}_zscore"
    # cast to DOUBLE (fractional seconds), matching rolling_window_agg:
    # a long cast truncates to whole seconds, letting events up to ~1s
    # outside [ts - window, ts] into the frame
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).cast("timestamp").cast("double"))
        .rangeBetween(-int(window.total_seconds()), 0)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(F.col(value_col)).over(w)
    n = F.count(value_col).over(w)
    return df.withColumn(
        out_col,
        F.when(
            (n >= min_periods) & (std > 0),
            (F.col(value_col) - mean) / std,
        ),
    )
