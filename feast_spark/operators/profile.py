"""One-pass table profiling: per-column null counts, distinct counts,
and min/max — the "what is in this corpus" primitive a training-data
pipeline runs before and after every transform.

Shape: ONE wide aggregate over the table (count/min/max are classic
partial-agg; each COUNT(DISTINCT) becomes its own Expand branch of the
same two-phase agg), then the single result row is unpivoted
driver-free via explode(array(struct...)). No per-column scan loop —
the table is read once regardless of how many columns are profiled.

At 100 TB: count/sum/min/max combine map-side so the shuffle is O(1)
rows per partition; COUNT(DISTINCT) shuffles the distinct value sets.
For ultra-high-cardinality columns pass ``approx=True`` to swap in
approx_count_distinct (HLL sketch, mergeable map-side, no second
phase) — same output schema.

Reference parity note: the reference (feast v0.11) has no profiling
surface; its closest concept is schema/type inference at apply time
(sdk/python/feast/inference.py:12-119). This operator generalizes that
to value-level statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

__all__ = ["profile_table", "psi_drift"]


def _null_of(dtype: str) -> Column:
    return F.lit(None).cast(dtype)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one pass.

    Returns one row per profiled column:
    ``column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str`` — numeric min/max for numeric columns, lexical min/max
    for strings, both NULL otherwise (timestamps/arrays still get
    null/distinct counts).
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in schema]
    if unknown:
        raise ValueError(f"profile_table: columns not in schema: {unknown}")

    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        dt = schema[c]
        is_num = isinstance(dt, NumericType)
        is_str = isinstance(dt, StringType)
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(distinct(c).cast("long").alias(f"{c}__distinct"))
        aggs.append(
            (F.min(c).cast("double") if is_num else _null_of("double")).alias(
                f"{c}__min_num"
            )
        )
        aggs.append(
            (F.max(c).cast("double") if is_num else _null_of("double")).alias(
                f"{c}__max_num"
            )
        )
        aggs.append(
            (F.min(c) if is_str else _null_of("string")).alias(f"{c}__min_str")
        )
        aggs.append(
            (F.max(c) if is_str else _null_of("string")).alias(f"{c}__max_str")
        )

    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min_num").alias("min_num"),
            F.col(f"{c}__max_num").alias("max_num"),
            F.col(f"{c}__min_str").alias("min_str"),
            F.col(f"{c}__max_str").alias("max_str"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def psi_drift(
    reference: DataFrame,
    current: DataFrame,
    columns: list[str],
    n_buckets: int = 10,
    epsilon: float = 1e-6,
    relative_error: float = 0.001,
) -> DataFrame:
    """Population Stability Index per numeric column between a
    reference table (e.g. training-time feature distribution) and a
    current one (serving-time) — the standard drift monitor
    (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action).

    The reference (feast v0.11) has no data-quality surface; this
    completes the store with the monitor production deployments bolt
    on.  Shape:

    - bucket edges = approx quantiles of the REFERENCE side (one pass,
      Greenwald-Khanna sketch, mergeable map-side);
    - each side then aggregates bucket counts in ONE wide pass over
      all columns (a CASE cascade per column — codegen'd, no Python);
    - PSI folds over the (n_buckets)-row-per-column count frame.

    Output: (column, psi, n_ref, n_cur) — one row per column."""
    if not columns:
        raise ValueError("columns list is empty")
    # quantile edges from the reference distribution
    probs = [i / n_buckets for i in range(1, n_buckets)]
    edges_per_col = {
        c: qs
        for c, qs in zip(
            columns,
            reference.approxQuantile(columns, probs, relative_error),
        )
    }

    def bucket_expr(c: str) -> Column:
        edges = edges_per_col[c]
        expr = F.lit(len(edges))  # top bucket
        for i in range(len(edges) - 1, -1, -1):
            expr = F.when(F.col(c) <= F.lit(edges[i]), F.lit(i)).otherwise(expr)
        return F.when(F.col(c).isNull(), F.lit(-1)).otherwise(expr)

    def counts(df: DataFrame, side: str) -> DataFrame:
        bucketed = df.select(
            *[bucket_expr(c).alias(f"__b_{c}") for c in columns]
        )
        # one wide agg: per column, a map bucket -> count via the
        # explode-of-structs unpivot used by profile_table
        aggs = []
        for c in columns:
            aggs.extend(
                F.sum(F.when(F.col(f"__b_{c}") == b, 1).otherwise(0)).alias(
                    f"__{c}__{b}"
                )
                for b in range(-1, n_buckets)
            )
        one = bucketed.agg(*aggs)
        structs = [
            F.struct(
                F.lit(c).alias("column"),
                F.lit(b).alias("bucket"),
                F.col(f"__{c}__{b}").alias(side),
            )
            for c in columns
            for b in range(-1, n_buckets)
        ]
        return one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")

    ref_counts = counts(reference, "n_ref")
    cur_counts = counts(current, "n_cur")
    joined = ref_counts.join(cur_counts, ["column", "bucket"])
    tot = Window.partitionBy("column")
    pa = (F.col("n_ref") + epsilon) / (F.sum("n_ref").over(tot) + epsilon)
    pb = (F.col("n_cur") + epsilon) / (F.sum("n_cur").over(tot) + epsilon)
    per_bucket = (pa - pb) * (F.log(pa) - F.log(pb))
    return (
        joined.withColumn("__psi", per_bucket)
        .groupBy("column")
        .agg(
            F.sum("__psi").alias("psi"),
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
        )
    )
