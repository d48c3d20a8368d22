"""PageRank: numpy power-iteration differential (same formula, same
init, same iteration count), invariants, and edge cases."""

import numpy as np
import pytest

from feast_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, damping, iters):
    """Dense reference: uniform init, dangling mass redistributed
    uniformly — the exact update pagerank() implements."""
    deg = np.zeros(n)
    for s, _ in edge_list:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edge_list:
            contrib[d] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return r


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (4, 0),
    # 5 is dangling (in-links only); 6 -> 5 chain
    (6, 5), (0, 5),
]


def test_pagerank_matches_numpy_power_iteration(spark):
    n = 7
    edges = spark.createDataFrame(EDGES, "src INT, dst INT")
    for damping, iters in ((0.85, 10), (0.5, 5)):
        got = {
            r["node"]: r["rank"]
            for r in pagerank(
                edges, damping=damping, max_iter=iters, tol=None
            ).collect()
        }
        want = _numpy_pagerank(n, EDGES, damping, iters)
        assert set(got) == set(range(n))
        for i in range(n):
            assert got[i] == pytest.approx(want[i], rel=1e-9), i
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


@pytest.mark.nightly
def test_pagerank_converges_and_duplicate_edges_count_once(spark):
    edges = spark.createDataFrame(
        EDGES + EDGES[:3], "src INT, dst INT"  # duplicates
    )
    conv = {
        r["node"]: r["rank"]
        for r in pagerank(edges, max_iter=100, tol=1e-10).collect()
    }
    # duplicates must not change the result vs the distinct edge set
    distinct = {
        r["node"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(EDGES, "src INT, dst INT"),
            max_iter=100,
            tol=1e-10,
        ).collect()
    }
    assert conv == pytest.approx(distinct)
    # converged ranking: the 0<->2 cycle holds the most mass
    ranked = sorted(conv, key=conv.get, reverse=True)
    assert set(ranked[:2]) == {0, 2}
    assert sum(conv.values()) == pytest.approx(1.0, abs=1e-8)


@pytest.mark.nightly
def test_pagerank_star_graph_orders_hub_first(spark):
    star = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src INT, dst INT"
    )
    got = {
        r["node"]: r["rank"] for r in pagerank(star, max_iter=30).collect()
    }
    assert got[0] == max(got.values())
    leaves = [got[i] for i in range(1, 6)]
    assert all(v == pytest.approx(leaves[0]) for v in leaves)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-8)


def test_pagerank_validation_and_empty(spark):
    edges = spark.createDataFrame([(0, 1)], "src INT, dst INT")
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.0)
    with pytest.raises(ValueError, match="max_iter"):
        pagerank(edges, max_iter=0)
    empty = spark.createDataFrame([], "src INT, dst INT")
    assert pagerank(empty).count() == 0


def test_pagerank_null_endpoints_dropped(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (None, 0), (1, None)], "src INT, dst INT"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, max_iter=20).collect()}
    assert set(got) == {0, 1}
    assert got[0] == pytest.approx(got[1])


def test_weighted_pagerank_matches_numpy(spark):
    """Edge weights split outgoing mass proportionally; the numpy
    differential uses the same weighted update."""
    wedges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 0, 5.0)]
    edges = spark.createDataFrame(wedges, "src INT, dst INT, w DOUBLE")
    damping, iters, n = 0.85, 8, 4
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, damping=damping, max_iter=iters, tol=None, weight="w"
        ).collect()
    }
    wsum = {}
    for s, _, w in wedges:
        wsum[s] = wsum.get(s, 0.0) + w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d, w in wedges:
            contrib[d] += r[s] * w / wsum[s]
        dangling = sum(r[i] for i in range(n) if i not in wsum)
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    for i in range(n):
        assert got[i] == pytest.approx(r[i], rel=1e-9), i
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # weight=None on the same (distinct-edge) graph differs: 0's mass
    # splits 50/50 instead of 75/25
    unw = {
        r_["node"]: r_["rank"]
        for r_ in pagerank(edges, max_iter=iters, tol=None).collect()
    }
    assert unw[1] != pytest.approx(got[1])


@pytest.mark.nightly
def test_personalized_pagerank_concentrates_on_seeds(spark):
    """Teleport restricted to a seed set: restart + dangling mass land
    on seeds, ranks still sum to 1, and seed-side nodes outrank the
    global variant's."""
    edges = spark.createDataFrame(EDGES, "src INT, dst INT")
    seeds = spark.createDataFrame([(4,)], "node INT")
    ppr = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, max_iter=60, tol=1e-12, personalize=seeds
        ).collect()
    }
    glob = {
        r["node"]: r["rank"]
        for r in pagerank(edges, max_iter=60, tol=1e-12).collect()
    }
    assert sum(ppr.values()) == pytest.approx(1.0, abs=1e-8)
    assert ppr[4] > glob[4]  # the seed holds restart mass
    # a node unreachable from the seed keeps only flow-through mass
    assert ppr[6] < glob[6]
    # numpy differential with the personalized teleport vector
    n, damping, iters = 7, 0.85, 12
    t = np.zeros(n)
    t[4] = 1.0
    deg = np.zeros(n)
    for s, _ in EDGES:
        deg[s] += 1
    r = t.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in EDGES:
            contrib[d] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = ((1 - damping) + damping * dangling) * t + damping * contrib
    got = {
        row["node"]: row["rank"]
        for row in pagerank(
            edges, max_iter=iters, tol=None, personalize=seeds
        ).collect()
    }
    for i in range(n):
        assert got[i] == pytest.approx(r[i], rel=1e-9), i

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no graph nodes"):
        pagerank(
            edges,
            personalize=spark.createDataFrame([(99,)], "node INT"),
        )


def test_weighted_pagerank_keeps_zero_weight_nodes(spark):
    """A node connected only by zero/NULL-weight edges stays in the
    graph as a dangling node (it holds teleport mass) instead of
    vanishing from the output."""
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 0.0), (2, 3, None)],
        "src INT, dst INT, w DOUBLE",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, max_iter=10, weight="w").collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[2] > 0 and got[3] > 0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-8)


@pytest.mark.nightly
def test_pagerank_prepartitioned_identity(spark):
    """prepartition=True changes the physical plan only: same update
    math, so ranks agree to FP summation order (the contribution sums
    accumulate in a different partition order — last-ulp noise, far
    below any reporting precision)."""

    def ranks_of(**kw):
        edges = spark.createDataFrame(EDGES, "src INT, dst INT")
        return {
            r["node"]: r["rank"]
            for r in pagerank(edges, max_iter=7, tol=None, **kw).collect()
        }

    base, pre = ranks_of(), ranks_of(prepartition=True)
    assert set(base) == set(pre)
    for node in base:
        assert pre[node] == pytest.approx(base[node], rel=1e-12), node
    # weighted + personalized combination too
    wedges = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 0, 5.0)],
        "src INT, dst INT, w DOUBLE",
    )
    seeds = spark.createDataFrame([(0,), (3,)], "node INT")

    def wranks_of(**kw):
        return {
            r["node"]: r["rank"]
            for r in pagerank(
                wedges, max_iter=5, tol=None, weight="w",
                personalize=seeds, **kw,
            ).collect()
        }

    base, pre = wranks_of(), wranks_of(prepartition=True)
    assert set(base) == set(pre)
    for node in base:
        assert pre[node] == pytest.approx(base[node], rel=1e-12), node


def test_prepartitioned_edges_join_reuses_partitioning(spark):
    """The mechanism prepartition=True relies on, pinned at the plan
    level: a repartition(src).persist() edge table joined on src does
    NOT get re-exchanged (only the small rank-side frame does), while
    localCheckpoint FORGETS the partitioning and re-exchanges O(edges)
    every iteration.  Broadcast disabled so the join shape is the
    at-scale shuffle join, not a small-data broadcast."""
    import re

    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = (
            spark.range(10_000)
            .select(
                (F.col("id") % 97).alias("src"),
                (F.col("id") % 101).alias("dst"),
                F.lit(1.0).alias("__w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
        )
        out = spark.range(97).select(
            F.col("id").alias("src"), (F.col("id") * 0.001).alias("__share")
        )

        def join_exchanges(edge_frame):
            j = (
                edge_frame.join(out, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("__share") * F.col("__w")).alias("__in"))
            )
            j.count()
            plan = j._jdf.queryExecution().executedPlan().toString()
            # count only the JOIN-LEVEL exchanges: the cached relation
            # embeds its own (one-time, already-executed) plan as a
            # DEEPER-INDENTED subtree under the InMemoryRelation line —
            # drop that subtree, keep the join's other branches
            lines, keep, skip_deeper_than = plan.splitlines(), [], None
            for ln in lines:
                indent = len(ln) - len(ln.lstrip(" :+-"))
                if skip_deeper_than is not None:
                    if indent > skip_deeper_than:
                        continue
                    skip_deeper_than = None
                if "InMemoryRelation" in ln:
                    skip_deeper_than = indent
                    continue
                keep.append(ln)
            return len(
                re.findall(
                    r"Exchange hashpartitioning[^\n]*ENSURE_REQUIREMENTS",
                    "\n".join(keep),
                )
            )

        pre = e.repartition(F.col("src")).persist()
        pre.count()
        try:
            n_pre = join_exchanges(pre)
        finally:
            pre.unpersist()
        ckpt = e.localCheckpoint(eager=True)
        n_ckpt = join_exchanges(ckpt)
        # checkpoint forgets partitioning, so its plan pays exactly one
        # more exchange — the O(edges) one the persisted layout avoids
        # (absolute counts vary with how AQE prints reused stages, the
        # DELTA is the pinned claim)
        assert n_ckpt == n_pre + 1, (n_pre, n_ckpt)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
