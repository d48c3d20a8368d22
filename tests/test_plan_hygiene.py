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


def test_widened_shingle_explode_keeps_scan_side_cheap(spark, tmp_path):
    """Pin of the r16 InferFiltersFromGenerate discovery: a plain
    F.explode over a computed shingle array lets Catalyst infer a
    ``size(shingles) > 0`` filter WITH THE WHOLE SHINGLE EXPRESSION
    INLINED, and predicate pushdown then sinks it below the
    widen_parallelism exchange — running the full CPU pass a second
    time, serialized on the scan's single input partition (measured 6x
    wall at sf0.1).  ``explode_computed`` (explode_outer + isNotNull
    on the generated column) is exempt from the rule; this asserts no
    hash expression ever appears below the widening exchange."""
    from feast_spark.functions.text import explode_computed
    from feast_spark.operators.docdedup import (
        widen_parallelism,
        with_hashed_shingles,
    )

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)

    q = explode_computed(
        with_hashed_shingles(widen_parallelism(df), "text", 3),
        ["doc_id"],
        "shingles",
        "__sh",
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan, plan
    scan_side = plan.split("RoundRobinPartitioning", 1)[1]
    assert "xxhash64" not in scan_side, (
        "shingle expression pushed below the widening exchange:\n" + plan
    )
