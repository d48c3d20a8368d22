"""Deterministic dataset splitting for training pipelines.

``hash_split`` assigns every row a stable split label (train/val/test)
from an md5 of its id — no sampling state, no shuffle, reproducible
across engines and runs, stable under repartitioning and incremental
arrival of new rows (a row's split never changes when the corpus
grows, unlike fraction-based ``randomSplit``).

Scale: a narrow projection (md5 + substring + mod) inside whole-stage
codegen; the split can be used as a partition column on write so each
split lands in its own directory (`partitionBy("split")`).

The reference has no splitting surface; this generalizes the
deterministic-hash idiom its online store uses for entity keys
(infra/online_stores/helpers.py:50-66) to corpus partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_split",
    "group_split",
    "sample_per_group",
    "time_series_splits",
]


def hash_bucket(id_col: Column, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from md5(salt || id).

    Uses the first 8 hex chars (32 bits) of the md5 — engine-portable
    (DuckDB computes the identical value, which the driver oracle
    relies on)."""
    hex8 = F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8)
    return F.conv(hex8, 16, 10).cast("long") % n_buckets


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Label each row with a split name, proportions from ``weights``
    (e.g. {"train": 0.8, "val": 0.1, "test": 0.1}; must sum to ~1).

    Buckets are carved from [0, 100) in the dict's insertion order, so
    the assignment is fully deterministic given (id, salt, weights)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col), 100, salt=salt)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, w in weights.items():
        acc += w * 100
        bounds.append((name, int(round(acc))))
    if bounds[-1][1] != 100:
        raise ValueError(f"weights carve {bounds[-1][1]}/100 buckets, not 100")
    expr: Column = F.lit(bounds[-1][0])
    for name, upper in reversed(bounds[:-1]):
        expr = F.when(bucket < F.lit(upper), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified sample: up to ``n`` rows per group,
    chosen by md5(salt || id) order (ties broken by id) — the balanced
    mini-corpus primitive (e.g. equal docs per language), reproducible
    across runs and engines.

    One shuffle (hash on group_cols) + per-partition sort; rows beyond
    rank n are dropped before any downstream stage. For groups far
    larger than n at extreme scale, pre-filter with hash_bucket to cut
    the sorted volume (bucket < ceil(n * safety / group_size * 100))
    before ranking."""
    from pyspark.sql import Window

    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n)
        .drop("__rank")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Whole-GROUP splitting: every row receives the split of its group
    id (domain, author, near-dup component label, ...), so related rows
    can never straddle train and test — the cross-split leakage guard
    that per-row splitting cannot give (two near-duplicate documents
    hash-split independently land in different splits ~2 p (1-p) of
    the time, silently leaking eval text into train).

    Same narrow md5 projection as :func:`hash_split`, keyed by the
    group column; proportions hold over GROUPS, and over rows only as
    far as group sizes are balanced (the honest trade — weight by
    rows-per-group upstream if that matters).

    The leakage-safe composition with the dedup machinery:

        pairs  = minhash_dedup_pairs(docs, "doc_id", "text")
        labels = connected_components(pairs)          # (node, component)
        docs   = (docs.join(labels, docs.doc_id == labels.node, "left")
                      .withColumn("grp", F.coalesce("component", "doc_id"))
                      .drop("node", "component"))
        split  = group_split(docs, "grp", weights)    # clusters intact
    """
    return hash_split(df, group_col, weights, out_col=out_col, salt=salt)


def time_series_splits(
    df: DataFrame,
    ts_col: str,
    n_folds: int,
    gap_seconds: int = 0,
    start=None,
    end=None,
) -> list[tuple[DataFrame, DataFrame]]:
    """Expanding-window time-series cross-validation folds — the
    leakage-safe CV for temporal data (sklearn ``TimeSeriesSplit``
    semantics, plus a purge gap; public method — the gap removes
    rows whose labels/windows could straddle the boundary, the
    "purging" of de Prado's walk-forward CV).

    The time range [t_min, t_max] (or explicit ``start``/``end``) is
    cut into ``n_folds + 1`` equal spans.  Fold i (0-based):

        train_i = rows in [start,                    boundary_i)
        test_i  = rows in [boundary_i + gap_seconds, boundary_{i+1})

    so train always PRECEDES test, later folds train on strictly more
    history, and no test row is within ``gap_seconds`` of any train
    row (label-window leakage guard).

    Returns ``n_folds`` lazy (train, test) pairs — plain timestamp
    filters over ``df``, so each materialization is one pruned scan
    (min/max stats and time-partitioned layouts skip files outside the
    fold; nothing is shuffled or copied here).  Bounds come from one
    tiny min/max aggregate when not given.  Equal TIME spans, not
    equal row counts — the honest choice for walk-forward evaluation
    (row-balanced folds would let volume spikes bend the boundaries
    toward the spike)."""
    if n_folds < 1:
        raise ValueError(f"n_folds must be >= 1, got {n_folds}")
    if gap_seconds < 0:
        raise ValueError(f"gap_seconds must be >= 0, got {gap_seconds}")
    if (start is None) != (end is None):
        raise ValueError("pass both start and end, or neither")
    from datetime import date as _date
    from datetime import datetime as _datetime

    if (
        start is not None
        and isinstance(start, (_date, _datetime))
        and isinstance(end, (_date, _datetime))
    ):
        # mirror resample's driver-side guard: reversed explicit bounds
        # would otherwise silently yield empty/degenerate folds.  String
        # bounds stay unchecked here (parsed executor-side by the CAST),
        # and so do bound pairs Python cannot order (date vs datetime,
        # naive vs aware) — Spark's timestamp cast handles those.
        try:
            reversed_bounds = start >= end
        except TypeError:
            reversed_bounds = False
        if reversed_bounds:
            raise ValueError(f"end ({end!r}) must be after start ({start!r})")
    if start is None:
        row = df.agg(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).collect()[0]
        start, end = row["lo"], row["hi"]
        if start is None:
            raise ValueError("cannot split an empty frame without bounds")
    lo = F.unix_timestamp(F.lit(start).cast("timestamp"))
    hi = F.unix_timestamp(F.lit(end).cast("timestamp"))
    ts = F.unix_timestamp(F.col(ts_col))
    span = (hi - lo) / (n_folds + 1)
    folds = []
    for i in range(1, n_folds + 1):
        b = lo + span * i
        nxt = lo + span * (i + 1) if i < n_folds else hi + 1
        train = df.filter(ts.isNotNull() & (ts >= lo) & (ts < b))
        test = df.filter(
            ts.isNotNull() & (ts >= b + gap_seconds) & (ts < nxt)
        )
        folds.append((train, test))
    return folds
