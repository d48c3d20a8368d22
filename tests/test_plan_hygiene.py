"""Repo-wide plan hygiene: every driver query must compile to a plan
with no row-at-a-time Python (BatchEvalPython) and no unbounded
CartesianProduct — the two ways a correct sf0.01 query dies at 100 TB.

Plan-only (no execution), so the whole inventory checks in seconds.
"""

import __spark_entry__ as entry_mod
from tests.conftest import SF_MED


def test_no_python_udfs_or_cartesian_in_any_query(spark):
    bad = {}
    for name, fn in entry_mod.queries().items():
        plan = fn(spark, SF_MED)._jdf.queryExecution().executedPlan().toString()
        problems = [
            marker
            for marker in ("BatchEvalPython", "CartesianProduct")
            if marker in plan
        ]
        if problems:
            bad[name] = problems
    assert not bad, f"queries with scale-hostile plans: {bad}"


def test_contamination_gate_broadcasts_eval_side(spark):
    """The contamination gate's scale contract: the (small) eval
    shingle frame broadcasts, so the 100 TB train corpus probes the
    hash map partition-locally and never shuffles its shingles."""
    plan = (
        entry_mod.q_contamination(spark, SF_MED)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
