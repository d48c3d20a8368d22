"""Physical-plan inspection utilities.

The scale contract of every operator in this package is a plan shape —
"one Exchange", "broadcast join, no SortMergeJoin", "filters reach the
parquet scan" — and those contracts are pinned by tests/test_plans.py
and recorded in PLANS.md.  These helpers are the shared vocabulary for
both: a formatted explain string plus counters over its node list, so
a plan assertion reads as a property ("exactly one shuffle") instead
of a regex scattered per test.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_formatted",
    "executed_plan",
    "plan_nodes",
    "count_exchanges",
    "has_node",
]


def _explain_stdout(df: DataFrame, mode: str) -> str:
    """Capture the public ``df.explain(mode)`` print output — works on
    any PySpark release, whatever the JVM-side entry points look like."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def explain_formatted(df: DataFrame) -> str:
    """The `.explain("formatted")` text of the final (pre-AQE) plan.

    Primary path uses JVM internals (string straight back, no stdout
    games); falls back to capturing the public ``df.explain`` print if
    a Spark upgrade moves them, so plan-pinned tests degrade
    gracefully instead of erroring on an AttributeError."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:
        return _explain_stdout(df, "formatted")


def executed_plan(df: DataFrame) -> str:
    """The executed SparkPlan tree (post-preparation, pre-execution).
    Falls back to the formatted explain text (same node vocabulary,
    coarser detail) if the internal accessor moves."""
    try:
        return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    except Exception:
        return _explain_stdout(df, "formatted")


def plan_nodes(plan: str) -> list[str]:
    """Node names from a formatted explain's detail section, in plan
    order — e.g. ['Scan', 'Exchange', 'Sort', 'Window', ...]."""
    return re.findall(r"^\(\d+\) (\w+)", plan, flags=re.M)


def count_exchanges(plan: str, include_broadcast: bool = False) -> int:
    """Shuffle Exchanges in a formatted plan (broadcast exchanges are
    data movement too, but not a repartitioning — excluded unless
    asked for)."""
    lines = re.findall(r"^\(\d+\) \w*Exchange\b.*$", plan, flags=re.M)
    if include_broadcast:
        return len(lines)
    return sum(1 for line in lines if "broadcast" not in line.lower())


def has_node(plan: str, name: str) -> bool:
    return name in plan_nodes(plan)
