"""Feature drift detection between two snapshots of a feature.

The monitoring half of a feature platform: "has this feature's
distribution moved since the model was trained?"  The reference
(Feast v0.11) stops at serving; training pipelines at 100 TB need the
drift check to run WITHOUT shipping raw values anywhere — so both
layers here work on the mergeable histogram-sketch tables of
``operators/sketches.py`` (O(groups x bins) longs, raw values never
cross the wire):

* ``histogram_drift(ref_hist, cur_hist, grain_cols)`` — join two
  already-built histogram tables and compute, per grain, in one pass
  of pure JVM array expressions (zip_with / aggregate — zero Python):

  - ``psi``  — Population Stability Index, the industry screen
    (sum (p-q) * ln(p/q), proportions floored at ``eps``; the usual
    rule of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted)
  - ``js_div`` — Jensen-Shannon divergence (symmetric, bounded by
    ln 2, defined even for disjoint supports — PSI's eps-sensitivity
    fixed)
  - ``tvd``  — total variation distance, 0.5 * L1 (the fraction of
    mass that moved)
  - ``ks``   — Kolmogorov-Smirnov statistic, max |CDF_p - CDF_q|
    over bin edges (exact for the binned distributions)

* ``feature_drift(ref, cur, val_col, ...)`` — convenience: build both
  histograms (one aggregate per side) and compare.  At scale, build
  the reference histogram ONCE at training time, persist it
  (``SketchTable``), and compare each day's sketch against it — the
  daily check then reads KBs of sketch rows, not the events table.

* ``categorical_drift(ref, cur, cat_col, ...)`` — same statistics
  over category proportions (full-outer join of two per-category
  count aggregates; shuffle O(distinct categories)).  NULL categories
  are counted as a real category (encoded "__null__") since a
  null-rate change is drift too.

Because histograms are exact longs over fixed [lo, hi) bins, every
statistic here is bit-reproducible in any engine — the pytest suite
pins PSI/JS/TVD/KS against a DuckDB width_bucket oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_spark.operators.sketches import build_histogram_sketches

__all__ = ["histogram_drift", "feature_drift", "categorical_drift"]


def _tot(col):
    return F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double"))


def _props(col, tot, eps):
    """Proportion array with an eps floor (PSI convention: empty bins
    get a tiny mass so ln(p/q) stays finite)."""
    return F.transform(
        col, lambda c: F.greatest(c.cast("double") / tot, F.lit(eps))
    )


def _stats(p_col, q_col, eps):
    """(psi, js_div, tvd, ks) column expressions over two proportion
    arrays.  p/q are eps-floored for psi; js uses the raw proportions
    (its 0-terms are well-defined) recovered via (x - eps -> 0 is NOT
    applied — the floor's effect on js/tvd/ks is O(eps * bins), far
    below reporting precision)."""
    psi = F.aggregate(
        F.zip_with(
            p_col,
            q_col,
            lambda p, q: (p - q) * F.log(p / q),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # JS: 0.5*sum p*ln(p/m) + 0.5*sum q*ln(q/m), m = (p+q)/2
    js = F.aggregate(
        F.zip_with(
            p_col,
            q_col,
            lambda p, q: 0.5 * p * F.log(2.0 * p / (p + q))
            + 0.5 * q * F.log(2.0 * q / (p + q)),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    tvd = 0.5 * F.aggregate(
        F.zip_with(p_col, q_col, lambda p, q: F.abs(p - q)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # KS: max |running-sum difference|; one fold carrying (cdf_diff, max)
    ks = F.aggregate(
        F.zip_with(p_col, q_col, lambda p, q: p - q),
        F.struct(F.lit(0.0).alias("cdf"), F.lit(0.0).alias("mx")),
        lambda acc, d: F.struct(
            (acc["cdf"] + d).alias("cdf"),
            F.greatest(acc["mx"], F.abs(acc["cdf"] + d)).alias("mx"),
        ),
        lambda acc: acc["mx"],
    )
    return psi, js, tvd, ks


def histogram_drift(
    ref_hist: DataFrame,
    cur_hist: DataFrame,
    grain_cols: list[str] | None = None,
    counts_col: str = "bin_counts",
    eps: float = 1e-6,
    round_digits: int | None = 6,
) -> DataFrame:
    """Per-grain drift statistics between two histogram-sketch tables
    (``build_histogram_sketches`` outputs with IDENTICAL lo/hi/n_bins —
    mixing binnings would compare apples to oranges; the caller owns
    that contract, same as ``merge_histogram_tables``).

    Plan: inner join on the grain (grains present on one side only are
    dropped — there is no distribution to compare), then one projection
    of array folds.  Shuffle is O(groups) sketch rows; at 100 TB the
    raw data was already reduced at sketch-build time."""
    grain_cols = grain_cols or []
    r = ref_hist.select(*grain_cols, F.col(counts_col).alias("__rc"))
    c = cur_hist.select(*grain_cols, F.col(counts_col).alias("__cc"))
    joined = (
        r.join(c, grain_cols) if grain_cols else r.crossJoin(c)
    )
    p = _props(F.col("__rc"), _tot(F.col("__rc")), eps)
    q = _props(F.col("__cc"), _tot(F.col("__cc")), eps)
    joined = joined.withColumn("__p", p).withColumn("__q", q)
    psi, js, tvd, ks = _stats(F.col("__p"), F.col("__q"), eps)
    if round_digits is not None:
        rnd = lambda x: F.round(x, round_digits)  # noqa: E731
    else:
        rnd = lambda x: x  # noqa: E731
    return joined.select(
        *grain_cols,
        _tot(F.col("__rc")).cast("long").alias("ref_n"),
        _tot(F.col("__cc")).cast("long").alias("cur_n"),
        rnd(psi).alias("psi"),
        rnd(js).alias("js_div"),
        rnd(tvd).alias("tvd"),
        rnd(ks).alias("ks"),
    )


def feature_drift(
    ref: DataFrame,
    cur: DataFrame,
    val_col: str,
    lo: float,
    hi: float,
    grain_cols: list[str] | None = None,
    n_bins: int = 64,
    eps: float = 1e-6,
    round_digits: int | None = 6,
) -> DataFrame:
    """One-call drift check over raw frames: histogram each side (one
    aggregate per side, raw values reduced map-side) and compare.
    For repeated daily checks, persist the reference histogram once
    (``SketchTable``) and call ``histogram_drift`` directly."""
    grain_cols = grain_cols or []
    rh = build_histogram_sketches(ref, val_col, grain_cols, lo, hi, n_bins)
    ch = build_histogram_sketches(cur, val_col, grain_cols, lo, hi, n_bins)
    return histogram_drift(
        rh, ch, grain_cols, eps=eps, round_digits=round_digits
    )


def categorical_drift(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
    grain_cols: list[str] | None = None,
    eps: float = 1e-6,
    round_digits: int | None = 6,
    null_label: str = "__null__",
) -> DataFrame:
    """Drift statistics over a categorical feature's distribution:
    per-(grain, category) counts on each side, full-outer joined so a
    category that appeared or vanished still contributes, then the
    same psi/js/tvd folds over the aligned proportion pairs (ks is
    omitted — categories have no canonical order, so a CDF statistic
    is not defined).

    Shuffle: O(groups x distinct categories) count rows per side.
    High-cardinality id-like columns do not belong here (every id is
    its own category); hash them into buckets first if you must."""
    grain_cols = grain_cols or []
    key = F.coalesce(F.col(cat_col).cast("string"), F.lit(null_label))

    def counts(df, out):
        return (
            df.select(*grain_cols, key.alias("__cat"))
            .groupBy(*grain_cols, "__cat")
            .agg(F.count(F.lit(1)).alias(out))
        )

    r = counts(ref, "__rc")
    c = counts(cur, "__cc")
    both = r.join(c, [*grain_cols, "__cat"], "full_outer").select(
        *grain_cols,
        "__cat",
        F.coalesce("__rc", F.lit(0)).alias("__rc"),
        F.coalesce("__cc", F.lit(0)).alias("__cc"),
    )
    gw = both.groupBy(*grain_cols) if grain_cols else both.groupBy()
    tot = gw.agg(
        F.sum("__rc").alias("__rn"),
        F.sum("__cc").alias("__cn"),
        F.collect_list(F.struct("__rc", "__cc")).alias("__pairs"),
    )
    p = F.transform(
        "__pairs",
        lambda s: F.greatest(
            s["__rc"].cast("double") / F.col("__rn"), F.lit(eps)
        ),
    )
    q = F.transform(
        "__pairs",
        lambda s: F.greatest(
            s["__cc"].cast("double") / F.col("__cn"), F.lit(eps)
        ),
    )
    tot = tot.withColumn("__p", p).withColumn("__q", q)
    psi, js, tvd, _ = _stats(F.col("__p"), F.col("__q"), eps)
    if round_digits is not None:
        rnd = lambda x: F.round(x, round_digits)  # noqa: E731
    else:
        rnd = lambda x: x  # noqa: E731
    return tot.select(
        *grain_cols,
        F.col("__rn").alias("ref_n"),
        F.col("__cn").alias("cur_n"),
        F.size("__pairs").alias("n_categories"),
        rnd(psi).alias("psi"),
        rnd(js).alias("js_div"),
        rnd(tvd).alias("tvd"),
    )
