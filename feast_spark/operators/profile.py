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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

__all__ = ["profile_table"]


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
