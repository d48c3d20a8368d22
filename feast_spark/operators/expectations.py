"""Single-pass declarative data validation (the data-quality gate a
feature pipeline runs before materialize/training — the capability the
reference ecosystem later grew as "data quality monitoring"; the
public Great-Expectations vocabulary, re-expressed Spark-first).

Every expectation compiles to AGGREGATE EXPRESSIONS over one
``df.agg(...)`` — the whole suite is ONE job, one scan, no shuffle
beyond the final partial-combine aggregate, however many checks run.
At 100 TB that is the difference between a validation pass and N
validation passes: adding an expectation costs one more column in the
same aggregate, not another scan.

    report = validate(df, [
        row_count_between(1_000, None),
        not_null("user_id"),
        unique("event_id"),
        values_between("value", 0.0, 1e6, max_violation_frac=0.001),
        values_in_set("event_type", ["view", "click", "purchase"]),
        freshness("ts", timedelta(hours=6), now=datetime.utcnow()),
    ])
    assert report.passed, report.failures

``unique`` uses COUNT(DISTINCT) exactly by default — the one
expensive check (expand-based distinct inside the agg); pass
``approx=True`` to swap in the HLL sketch at high cardinality (the
same trade documented for frequent_lines / profile_table).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Expectation",
    "ValidationReport",
    "row_count_between",
    "not_null",
    "unique",
    "values_between",
    "values_in_set",
    "matches_regex",
    "freshness",
    "validate",
    "row_not_null",
    "row_between",
    "row_in_set",
    "row_matches",
    "with_violations",
    "quarantine",
]


@dataclass(frozen=True)
class Expectation:
    """One check: named aggregate expressions + a verdict over their
    collected values.  ``aggs`` maps slot-name -> Column aggregate;
    ``verdict(observed) -> (passed, detail)``."""

    name: str
    aggs: dict[str, Column]
    verdict: Callable[[dict[str, Any]], tuple[bool, str]]


@dataclass(frozen=True)
class ValidationReport:
    results: list[tuple[str, bool, str]] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return all(ok for _, ok, _ in self.results)

    @property
    def failures(self) -> list[tuple[str, str]]:
        return [(n, d) for n, ok, d in self.results if not ok]


def row_count_between(lo: int | None, hi: int | None) -> Expectation:
    def verdict(o):
        n = o["n"]
        ok = (lo is None or n >= lo) and (hi is None or n <= hi)
        return ok, f"rows={n} expected [{lo}, {hi}]"

    return Expectation(
        f"row_count_between({lo}, {hi})",
        {"n": F.count(F.lit(1))},
        verdict,
    )


def not_null(col: str, max_null_frac: float = 0.0) -> Expectation:
    def verdict(o):
        frac = (o["nulls"] / o["n"]) if o["n"] else 0.0
        return frac <= max_null_frac, (
            f"null_frac({col})={frac:.6f} max={max_null_frac}"
        )

    return Expectation(
        f"not_null({col})",
        {
            "n": F.count(F.lit(1)),
            "nulls": F.sum(F.col(col).isNull().cast("long")),
        },
        verdict,
    )


def unique(col: str, approx: bool = False, approx_rsd: float = 0.02) -> Expectation:
    distinct = (
        F.approx_count_distinct(col, approx_rsd)
        if approx
        else F.count_distinct(F.col(col))
    )

    def verdict(o):
        nn, nd = o["nonnull"], o["distinct"]
        if approx:
            # HLL is ±rsd: only flag a miss beyond the error band
            ok = nd >= nn * (1 - 2 * approx_rsd)
        else:
            ok = nd == nn
        return ok, f"distinct({col})={nd} non-null rows={nn}"

    return Expectation(
        f"unique({col})",
        {"nonnull": F.count(F.col(col)), "distinct": distinct},
        verdict,
    )


def values_between(
    col: str,
    lo: float | None,
    hi: float | None,
    max_violation_frac: float = 0.0,
) -> Expectation:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)

    def verdict(o):
        frac = (o["bad"] / o["n"]) if o["n"] else 0.0
        return frac <= max_violation_frac, (
            f"out_of_range_frac({col})={frac:.6f} "
            f"range=[{lo}, {hi}] max={max_violation_frac}"
        )

    return Expectation(
        f"values_between({col}, {lo}, {hi})",
        {
            "n": F.count(F.col(col)),
            "bad": F.sum(F.coalesce(cond.cast("long"), F.lit(0))),
        },
        verdict,
    )


def values_in_set(
    col: str, allowed: list, max_violation_frac: float = 0.0
) -> Expectation:
    bad = (~F.col(col).isin(list(allowed))).cast("long")

    def verdict(o):
        frac = (o["bad"] / o["n"]) if o["n"] else 0.0
        return frac <= max_violation_frac, (
            f"not_in_set_frac({col})={frac:.6f} max={max_violation_frac}"
        )

    return Expectation(
        f"values_in_set({col})",
        {
            "n": F.count(F.col(col)),
            "bad": F.sum(F.coalesce(bad, F.lit(0))),
        },
        verdict,
    )


def matches_regex(
    col: str, pattern: str, max_violation_frac: float = 0.0
) -> Expectation:
    bad = (~F.col(col).rlike(pattern)).cast("long")

    def verdict(o):
        frac = (o["bad"] / o["n"]) if o["n"] else 0.0
        return frac <= max_violation_frac, (
            f"regex_miss_frac({col})={frac:.6f} max={max_violation_frac}"
        )

    return Expectation(
        f"matches_regex({col})",
        {
            "n": F.count(F.col(col)),
            "bad": F.sum(F.coalesce(bad, F.lit(0))),
        },
        verdict,
    )


def freshness(
    ts_col: str, max_age: timedelta, now: datetime | None = None
) -> Expectation:
    """Newest event no older than ``max_age``.  ``now`` must be passed
    explicitly for a deterministic verdict (tests, backfills); None
    reads the cluster clock at collect time."""

    def verdict(o):
        latest = o["latest"]
        if latest is None:
            return False, f"freshness({ts_col}): table empty"
        ref = now or datetime.utcnow()
        age = ref - latest
        return age <= max_age, (
            f"age({ts_col})={age} max={max_age} (latest={latest})"
        )

    return Expectation(
        f"freshness({ts_col})", {"latest": F.max(ts_col)}, verdict
    )


def validate(
    df: DataFrame, expectations: list[Expectation]
) -> ValidationReport:
    """Run the whole suite in ONE aggregate job and return the report.
    Slot names are namespaced per expectation so suites can repeat
    checks over the same columns."""
    aggs = []
    for i, e in enumerate(expectations):
        for slot, col in e.aggs.items():
            aggs.append(col.alias(f"__e{i}__{slot}"))
    if not aggs:
        return ValidationReport([])
    row = df.agg(*aggs).head().asDict()
    results = []
    for i, e in enumerate(expectations):
        observed = {
            slot: row[f"__e{i}__{slot}"] for slot in e.aggs
        }
        ok, detail = e.verdict(observed)
        results.append((e.name, ok, detail))
    return ValidationReport(results)


# ---------------------------------------------------------------------------
# Row-level rules and quarantine
# ---------------------------------------------------------------------------
#
# validate() answers "is this TABLE acceptable"; a pipeline also needs
# "which ROWS are acceptable" — ship the good rows, quarantine the bad
# ones with a reason, never fail the whole batch on a few poison rows
# (the public dead-letter pattern).  A rule is a boolean Column; a row
# PASSES a rule only when it evaluates TRUE — NULL counts as a
# violation (a range check over a NULL value is not satisfied).  The
# violation tagging is ONE projection (when-chain into array_compact),
# codegen, zero shuffle.


def row_not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def row_between(col: str, lo, hi) -> Column:
    """lo <= col <= hi; either bound may be None for half-open."""
    c = F.lit(True)
    if lo is not None:
        c = c & (F.col(col) >= F.lit(lo))
    if hi is not None:
        c = c & (F.col(col) <= F.lit(hi))
    return c


def row_in_set(col: str, allowed: list) -> Column:
    return F.col(col).isin(allowed)


def row_matches(col: str, pattern: str) -> Column:
    return F.col(col).rlike(pattern)


def with_violations(
    df: DataFrame,
    rules: dict[str, Column],
    out_col: str = "violations",
) -> DataFrame:
    """Annotate every row with ``array<string>`` of failed rule names
    (empty array = clean row).  One narrow projection — at 100 TB this
    rides the ingest scan for free; write the annotated table once and
    split downstream rather than re-scanning per verdict."""
    if not rules:
        raise ValueError("rules must name at least one check")
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")
    tags = [
        F.when(~F.coalesce(rule, F.lit(False)), F.lit(name))
        for name, rule in rules.items()
    ]
    return df.withColumn(out_col, F.array_compact(F.array(*tags)))


def quarantine(
    df: DataFrame,
    rules: dict[str, Column],
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): rows passing EVERY rule, and rows failing any —
    the bad side annotated with its ``violations`` array.  Both sides
    derive from one :func:`with_violations` plan; persist or write the
    annotated frame first if you will materialize both (two actions on
    the lazy plan would otherwise scan the source twice)."""
    tagged = with_violations(df, rules)
    good = tagged.filter(F.size("violations") == 0).drop("violations")
    bad = tagged.filter(F.size("violations") > 0)
    return good, bad
