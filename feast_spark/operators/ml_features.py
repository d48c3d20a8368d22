"""ML feature-engineering and evaluation primitives — the supervised
companions to the rollup/window feature family:

* :func:`leave_one_out_encode` — target (mean) encoding of a
  categorical column with the leakage fix: each row's own target is
  excluded from its category mean, so the encoding of a training row
  never contains its own label (the classic target-leak that makes
  offline metrics lie).  Optional additive smoothing toward the global
  prior stabilizes rare categories.
* :func:`quantile_bins` — equal-frequency discretization: bin
  boundaries from (exact or approx) percentiles, assignment as a pure
  narrow expression against the broadcast boundary array.
* :func:`auc_score` — exact ROC AUC via the Mann-Whitney rank-sum
  identity with proper tie handling (average ranks), computed in
  aggregates over O(distinct scores) rows — no per-row sort collect,
  no threshold sweep.  The evaluation loop for
  ``functions.quality_model`` classifiers at corpus scale.

All three are built-in column expressions / aggregates (no Python on
executors) and are differentially tested against DuckDB / numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "leave_one_out_encode",
    "quantile_bins",
    "auc_score",
    "winsorize",
]


def leave_one_out_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str | None = None,
    smoothing: float = 0.0,
) -> DataFrame:
    """Add ``out_col`` = mean of ``target_col`` over the row's
    category EXCLUDING the row itself:

        loo = (sum_cat - y + smoothing * prior) / (cnt_cat - 1 + smoothing)

    where ``prior`` is the global target mean.  With ``smoothing=0`` a
    singleton category yields NULL (0/0 — there is nothing to encode
    it with); any positive smoothing pulls singletons to the prior.

    Plan: one groupBy(cat) aggregate (map-side combined, shuffle
    O(categories)) joined back on the category — encoder tables are
    category-sized, so AQE turns the join into a broadcast in practice
    — plus a broadcast one-row global aggregate.  No window sort over
    the full data."""
    out_col = out_col or f"{cat_col}_loo"
    stats = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("__sum"),
        F.count(target_col).alias("__cnt"),
    )
    prior = df.agg(F.avg(target_col).alias("__prior"))
    denom = F.col("__cnt") - 1 + F.lit(smoothing)
    num = (
        F.col("__sum")
        - F.col(target_col)
        + F.lit(smoothing) * F.col("__prior")
    )
    # NULL-target (inference/unlabeled) rows have no own label to leave
    # out: they get the plain smoothed category mean over the LABELED
    # rows — not NULL — so scoring rows keep their encoding.  A
    # category with zero labeled rows still yields NULL (sum() over
    # nothing is NULL: there is no signal to encode with).
    denom_all = F.col("__cnt") + F.lit(smoothing)
    num_all = F.col("__sum") + F.lit(smoothing) * F.col("__prior")
    loo = F.when(
        F.col(target_col).isNull(),
        F.when(denom_all > 0, num_all / denom_all),
    ).otherwise(F.when(denom > 0, num / denom))
    # LEFT join: rows with a NULL category must survive (an equi-join
    # never matches NULL keys) — they get a NULL encoding, same as an
    # unsmoothed singleton
    return (
        df.join(stats, cat_col, "left")
        .crossJoin(F.broadcast(prior))
        .withColumn(out_col, loo)
        .drop("__sum", "__cnt", "__prior")
    )


def _qcol(name: str):
    """Column reference that treats the WHOLE name literally — F.col
    parses dots as struct access, so `my col.v` style names need
    backtick quoting (with embedded backticks doubled)."""
    return F.col("`" + name.replace("`", "``") + "`")


def _percentiles(col: str, qs: list[float], exact: bool, rel_error: float):
    """Percentile-boundary aggregate as proper column expressions (so
    column names needing backticks — spaces, dots — work like in every
    other operator)."""
    arr = F.array(*[F.lit(q) for q in qs])
    if exact:
        return F.percentile(_qcol(col), arr)
    return F.percentile_approx(_qcol(col), arr, F.lit(int(1 / rel_error)))


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    out_col: str | None = None,
    exact: bool = True,
    rel_error: float = 0.001,
) -> DataFrame:
    """Add ``out_col`` = equal-frequency bin index (0..n_bins-1) of
    ``col``; NULLs stay NULL.  Boundaries are the 1/n..(n-1)/n
    percentiles — exact (a full aggregate; fine to a few hundred
    million rows) or ``percentile_approx`` (the GK-sketch mergeable
    aggregate — the 100 TB path, deterministic for a given dataset).
    The n_bins-1 boundaries come to the driver (bounded) and the
    assignment is a pure narrow expression: count of boundaries at or
    below the value."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    out_col = out_col or f"{col}_bin"
    qs = [i / n_bins for i in range(1, n_bins)]
    row = df.agg(
        _percentiles(col, qs, exact, rel_error).alias("__bs")
    ).collect()[0]["__bs"]
    if row is None:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    bounds = [float(b) for b in row]
    return df.withColumn(
        out_col,
        F.when(
            _qcol(col).isNotNull(),
            F.size(
                F.filter(
                    F.array(*[F.lit(b) for b in bounds]),
                    lambda b: b < _qcol(col),
                )
            ),
        ),
    )


def auc_score(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact ROC AUC (one row: ``auc``, ``n_pos``, ``n_neg``) via the
    Mann-Whitney identity with average ranks for ties:

        AUC = (sum of positives' avg ranks - n_pos*(n_pos+1)/2)
              / (n_pos * n_neg)

    NULL labels/scores are excluded; degenerate inputs (no positives
    or no negatives) yield NULL auc.  ``label_col`` may be boolean or
    numeric 0/1.

    Plan: groupBy(score) aggregate (shuffle O(distinct scores), raw
    rows combined map-side), one window cumsum over those distinct
    scores, one final aggregate — a billion scored docs with float
    scores reduce to their distinct-value table before anything is
    sorted."""
    rows = df.select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("double").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    per_score = rows.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__npos"),
    )
    w = Window.orderBy("__s")
    ranked = per_score.withColumn(
        "__cum", F.sum("__n").over(w)
    ).withColumn(
        # average rank of this score's block: ranks (cum-n+1)..cum
        "__avg_rank",
        F.col("__cum") - (F.col("__n") - 1) / 2.0,
    )
    return ranked.agg(
        F.sum("__npos").alias("n_pos"),
        (F.sum("__n") - F.sum("__npos")).alias("n_neg"),
        F.sum(F.col("__npos") * F.col("__avg_rank")).alias("__rank_sum"),
    ).select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (
                F.col("__rank_sum")
                - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
            )
            / (F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
    )


def winsorize(
    df: DataFrame,
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
    exact: bool = True,
    rel_error: float = 0.001,
) -> DataFrame:
    """Clamp ``col`` to its [lower, upper] percentile bounds — the
    standard outlier-tail hygiene before scaling/encoding.  Same
    boundary machinery as :func:`quantile_bins` (exact percentile or
    the mergeable GK sketch for the 100 TB path; two driver doubles,
    then a pure narrow ``least``/``greatest``).  NULLs pass through."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(
            f"need 0 <= lower < upper <= 1, got ({lower}, {upper})"
        )
    out_col = out_col or f"{col}_wins"
    row = df.agg(
        _percentiles(col, [lower, upper], exact, rel_error).alias("__bs")
    ).collect()[0]["__bs"]
    if row is None:
        return df.withColumn(out_col, _qcol(col))
    lo, hi = float(row[0]), float(row[1])
    return df.withColumn(
        out_col, F.least(F.greatest(_qcol(col), F.lit(lo)), F.lit(hi))
    )
