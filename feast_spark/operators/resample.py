"""Time-series resampling onto a fixed grid with gap filling — the
regularization step every ML time-series pipeline runs before lag/
rolling features (pandas ``resample().agg().ffill()``, TimescaleDB
``time_bucket_gapfill``; public semantics, re-expressed Spark-first).

Irregular events become one row per (key, bucket) on a dense,
half-open ``[bucket, bucket + interval)`` grid:

1. floor each event's timestamp onto its bucket (pure projection —
   epoch-seconds integer arithmetic, codegen, engine-portable);
2. aggregate per (key, bucket) — ONE shuffle on the output grain,
   partials combined map-side;
3. explode each key's dense bucket sequence (``sequence(first, last,
   interval)`` per key by default, or the caller's explicit
   ``start``/``end`` bounds) and left-join the aggregates on — grid
   rows are O(keys x buckets), the OUTPUT size, not the event count;
4. optional gap fill: ``ffill`` carries the last observed value
   forward per key (``last(ignorenulls)`` over an unbounded-preceding
   frame — one window sort on the already-output-sized grid),
   ``zero`` coalesces to 0, ``None`` leaves gaps NULL.

Scale shape: events are touched exactly once (step 2's aggregate);
everything after operates on the aggregated grid.  A key with a
billion events and a thousand buckets costs the aggregate shuffle plus
a thousand grid rows.  Hot keys are the aggregate's problem (AQE skew
split), never a join explosion — the grid join is 1:1 on (key,
bucket).  The whole pipeline is built-in expressions; zero Python on
executors.

Reference parity: Feast materializes features FROM such regular grids
but has no operator to produce them; training-pipeline extension
(SURVEY §2.6), upstream of ``window_agg.with_lag_features`` /
``rolling_window_agg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["resample"]

_AGGS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    interval_seconds: int,
    aggs: dict[str, tuple[str, str]],
    start=None,
    end=None,
    fill: str | None = None,
) -> DataFrame:
    """Resample events onto a dense ``interval_seconds`` grid.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, avg, min, max, count, last}; ``last`` takes the latest value
    in the bucket by event time (ties by the value itself, for
    determinism).  Buckets are half-open ``[b, b + interval)``,
    labeled by their start timestamp in column ``bucket_ts``.

    Grid bounds: per key ``[floor(first_event), floor(last_event)]``
    by default — explicit ``start``/``end`` (datetimes; end exclusive)
    give every key the SAME grid, which is what a training matrix
    usually wants (keys absent in a bucket get NULL/0/carried rows).

    ``fill``: None -> gaps stay NULL; ``"zero"`` -> 0 (count/sum
    semantics); ``"ffill"`` -> carry the key's last observed value
    forward (leading gaps stay NULL); ``"interp"`` -> linear
    interpolation between the surrounding observed buckets (output
    cast to double; leading gaps stay NULL, trailing gaps carry the
    last value — pandas ``interpolate(limit_direction='forward')``
    semantics).  POINT-IN-TIME CAVEAT: ``interp`` reads the NEXT
    observation, i.e. the future — fine for offline curves and
    backtests' ground truth, but training features joined as-of must
    use ``ffill`` (or None) to stay leakage-free.  Null input
    timestamps are dropped (no bucket to land in)."""
    if interval_seconds <= 0:
        raise ValueError(
            f"interval_seconds must be positive, got {interval_seconds}"
        )
    if fill not in (None, "zero", "ffill", "interp"):
        raise ValueError(
            f"fill must be None, 'zero', 'ffill' or 'interp', got {fill!r}"
        )
    if not aggs:
        raise ValueError("aggs must name at least one output column")
    reserved = {"bucket_ts", "__b"}
    for out, (col, fn) in aggs.items():
        if fn not in _AGGS and fn != "last":
            raise ValueError(
                f"unknown agg fn {fn!r} for {out!r}; "
                f"expected one of {sorted(_AGGS) + ['last']}"
            )
        if out in reserved or out in key_cols:
            raise ValueError(f"output column {out!r} collides")

    step = F.lit(interval_seconds)
    # floor (not truncate-toward-zero) so pre-epoch timestamps bucket
    # correctly too; integer-seconds arithmetic mirrors any SQL engine
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
    ).alias("__b")
    in_cols = sorted({c for c, _ in aggs.values()} - set(key_cols))
    ev = df.filter(F.col(ts_col).isNotNull()).select(
        *key_cols, bucket, F.col(ts_col).alias("__ts"), *in_cols
    )

    agg_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "last":
            agg_exprs.append(
                F.max_by(
                    F.col(col), F.struct(F.col("__ts"), F.col(col))
                ).alias(out)
            )
        else:
            agg_exprs.append(_AGGS[fn](F.col(col)).alias(out))
    per_bucket = ev.groupBy(*key_cols, "__b").agg(*agg_exprs)

    if start is not None and end is not None:
        from datetime import date as _date
        from datetime import datetime as _datetime

        # only datetime-typed bounds compare reliably driver-side;
        # strings ('2024-9-01') would compare lexicographically and
        # falsely reject chronologically valid ranges — Spark's cast
        # is the authority for those
        if (
            isinstance(start, (_date, _datetime))
            and isinstance(end, (_date, _datetime))
            and start >= end
        ):
            raise ValueError(
                f"end ({end!r}) must be after start ({start!r})"
            )
        lo = F.unix_timestamp(F.lit(start).cast("timestamp"))
        hi = F.unix_timestamp(F.lit(end).cast("timestamp"))
        lo = F.floor(lo / step).cast("long") * step
        # end exclusive: last bucket is the one strictly below end
        hi = F.floor((hi - 1) / step).cast("long") * step
        bounds = per_bucket.groupBy(*key_cols).agg(
            lo.alias("__lo"), hi.alias("__hi")
        )
    elif start is None and end is None:
        bounds = per_bucket.groupBy(*key_cols).agg(
            F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
        )
    else:
        raise ValueError("pass both start and end, or neither")

    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), step)
        ).alias("__b"),
    )
    out_df = grid.join(per_bucket, [*key_cols, "__b"], "left")

    if fill == "zero":
        out_df = out_df.select(
            *key_cols,
            "__b",
            *[F.coalesce(o, F.lit(0)).alias(o) for o in aggs],
        )
    elif fill == "ffill":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out_df = out_df.select(
            *key_cols,
            "__b",
            *[F.last(o, ignorenulls=True).over(w).alias(o) for o in aggs],
        )
    elif fill == "interp":
        # one Exchange+Sort; the backward frame reuses the sorted rows
        wp = (
            Window.partitionBy(*key_cols)
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*key_cols)
            .orderBy("__b")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )

        def _interp(o: str):
            v = F.col(o).cast("double")
            b = F.col("__b").cast("double")
            ob = F.when(F.col(o).isNotNull(), F.col("__b")).cast("double")
            pv = F.last(v, ignorenulls=True).over(wp)
            pb = F.last(ob, ignorenulls=True).over(wp)
            nv = F.first(v, ignorenulls=True).over(wf)
            nb = F.first(ob, ignorenulls=True).over(wf)
            return (
                F.when(v.isNotNull(), v)
                .when(
                    pv.isNotNull() & nv.isNotNull(),
                    pv + (nv - pv) * (b - pb) / (nb - pb),
                )
                .when(pv.isNotNull(), pv)  # trailing gap: carry last
                .alias(o)  # leading gap stays NULL
            )

        out_df = out_df.select(*key_cols, "__b", *[_interp(o) for o in aggs])
    return out_df.select(
        *key_cols,
        F.timestamp_seconds(F.col("__b")).alias("bucket_ts"),
        *aggs,
    )
