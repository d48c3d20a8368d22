"""Repo-wide plan hygiene: every driver query must compile to a plan
with no row-at-a-time Python (BatchEvalPython) and no unbounded
CartesianProduct — the two ways a correct sf0.01 query dies at 100 TB.

Plan-only (no execution), so the whole inventory checks in seconds.
"""

import __spark_entry__ as entry_mod
from tests.conftest import SF_MED, SF_SMALL


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


def test_pit_join_dataset_gate_survives_interleaved_calls(spark):
    """A DataFrame returned by an EARLIER q_pit_join_dataset call must
    stay evaluable after a later call in the same process: each call
    commits its snapshots into its own numbered subdir and reclaims
    only siblings older than the newest prior one (r16 — the shared
    per-PID dir used to be wiped on entry, yanking the prior call's
    parquet files mid-read)."""
    d1 = entry_mod.q_pit_join_dataset(spark, SF_SMALL)
    n1 = d1.count()
    d2 = entry_mod.q_pit_join_dataset(spark, SF_SMALL)
    assert d2.count() == n1
    # the older DataFrame's files were NOT reclaimed by the newer call
    assert d1.count() == n1


def test_contaminated_spans_semi_joins_before_freq(spark):
    """The audit variant's scale contract (r16): the max_shingle_freq
    aggregate's input is the train stream ALREADY semi-joined against
    the broadcast eval shingles — between the partial frequency
    aggregate and the train scan there is a LeftSemi broadcast probe
    and NO hash-partitioning exchange, so the train corpus never
    shuffles (the only exchanges in the whole audit carry hit rows,
    bounded by the eval set)."""
    from feast_spark.operators.contamination import contaminated_spans

    train = spark.createDataFrame(
        [("t1", "x y z a b c"), ("t2", "x y z p q r")],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [("e1", "x y z a b c")], "doc_id string, text string"
    )
    plan = (
        contaminated_spans(
            train, ev, "doc_id", "doc_id", "text", n=3, max_shingle_freq=10
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    # the partial half of the __freq count aggregate
    freq_idx = next(
        i for i, l in enumerate(lines) if "partial_count" in l
    )
    semi_idx = next(
        i for i in range(freq_idx, len(lines)) if "LeftSemi" in lines[i]
    )
    between = lines[freq_idx + 1 : semi_idx]
    assert not any("Exchange hashpartitioning" in l for l in between), (
        "train shingles shuffled before the eval probe:\n" + plan
    )
