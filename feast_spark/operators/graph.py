"""Link-graph scoring: PageRank over an edge table — the web-crawl
quality-propagation pass of a training-data pipeline (crawl curation
weights documents by the link graph; Common Crawl publishes exactly
such per-host rank tables).

Spark-first shape (the published MapReduce/Pregel formulation, e.g.
Page et al. 1999 and the GraphX reference implementation — re-expressed
as DataFrame joins, no RDDs, no Python on executors):

* ranks and out-degrees are O(nodes) frames keyed by node id;
* one iteration = one equi-join of edges against ranks on src
  (shuffle O(edges), the dominant cost), one sum aggregate on dst
  (map-side combined), and one tiny aggregate for the dangling mass —
  the damping update is a projection;
* every iteration ends in ``localCheckpoint`` to truncate lineage
  (components.py discipline — an iterative DataFrame loop otherwise
  compounds the plan and recompiles its whole history each round);
* convergence is checked on the L1 delta, one extra aggregate over the
  O(nodes) rank frame per iteration — nothing edge-sized is collected.

Dangling nodes (no out-links) donate their rank mass uniformly, the
standard stochastic-matrix fix, so ranks always sum to 1 (pinned by
tests; the numpy power-iteration differential matches iteration for
iteration).

At 100 TB the edge table dominates: pre-partition it by ``src`` once
(``repartition(src)`` or a bucketed write) and every iteration's join
reuses that partitioning on one side; the rank frame is O(nodes) and
shuffles cheaply.  Skewed in-degree (everyone links to the hub) is
absorbed by the map-side combine on dst — the hot key receives
per-partition partial sums, not raw contributions.

Reference has no counterpart (Feast has no graph ops); training-data
pipeline extension (SURVEY §2.6), sibling of
``components.connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]  # personalization/weights via parameters


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    weight: str | None = None,
    personalize: DataFrame | None = None,
    prepartition: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list -> (node, rank), ranks
    summing to 1.  Parallel edges count once (with ``weight``, their
    weights are summed); self-loops count as ordinary edges (a node
    may link itself).  Stops after ``max_iter`` iterations or when the
    L1 rank change drops below ``tol`` (pass ``tol=None`` to always
    run exactly ``max_iter`` — the mode the fixed-iteration numpy
    differential pins).

    ``weight`` names a non-negative edge-weight column: each node
    splits its outgoing mass proportionally to weight instead of
    uniformly (click-count-weighted link graphs); zero-total-weight
    nodes are dangling.  ``personalize`` is a one-column node frame —
    the teleport set: restart mass lands uniformly on those seeds
    instead of all nodes (personalized PageRank, the related-content /
    topic-sensitive variant; seeds are broadcast-sized).  Dangling
    mass follows the same teleport distribution, so ranks still sum
    to 1.

    ``prepartition=True`` pays ONE extra O(edges) shuffle up front —
    the deduped edge table is hash-partitioned on ``src`` and cached
    (``persist`` keeps the partitioning visible to the planner;
    ``localCheckpoint`` erases it) — and in exchange every iteration's
    edges-vs-ranks join stops exchanging the edge table: only the
    O(nodes) rank side moves (plan-pinned in tests).  Net win whenever
    max_iter > 1; the cache spills to disk under pressure
    (MEMORY_AND_DISK), so prefer it at scale unless executor storage
    is the binding constraint.  Results agree to FP summation order
    (last-ulp; the contribution sums accumulate in a different
    partition order) — pinned at rel 1e-12."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    declared = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("__w")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .localCheckpoint(eager=True)
    )
    # nodes derive from the DECLARED edge list: an endpoint whose only
    # edges carry zero/NULL weight still exists in the graph — it just
    # sends no mass (dangling), per the docstring's contract
    nodes = (
        declared.select(F.col("src").alias("node"))
        .unionByName(declared.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        declared.filter(F.col("__w") > 0)
        .groupBy("src", "dst")
        # weighted: parallel edges sum; unweighted: duplicates count once
        .agg(
            (F.sum("__w") if weight is not None else F.lit(1.0)).alias(
                "__w"
            )
        )
    )
    cached_e = None
    if prepartition:
        # repartition + persist, NOT localCheckpoint: the checkpoint's
        # LogicalRDD forgets outputPartitioning, so every iteration's
        # join would re-exchange O(edges); InMemoryRelation keeps it
        cached_e = e.repartition(F.col("src")).persist()
        cached_e.count()  # materialize once, like the eager checkpoint
        e = cached_e
    else:
        e = e.localCheckpoint(eager=True)
    try:
        return _pagerank_loop(e, nodes, damping, max_iter, tol, personalize)
    finally:
        if cached_e is not None:
            # the returned ranks frame is checkpointed every iteration,
            # so it no longer references the cached edge table
            cached_e.unpersist()


def _pagerank_loop(
    e: DataFrame,
    nodes: DataFrame,
    damping: float,
    max_iter: int,
    tol: float | None,
    personalize: DataFrame | None,
) -> DataFrame:
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = (
        e.groupBy("src")
        .agg(F.sum("__w").alias("__deg"))
        .localCheckpoint(eager=True)
    )
    if personalize is not None:
        seed_col = personalize.columns[0]
        seeds = (
            personalize.select(F.col(seed_col).alias("node"))
            .distinct()
            .join(nodes, "node", "semi")
            .localCheckpoint(eager=True)
        )
        n_seeds = seeds.count()
        if n_seeds == 0:
            raise ValueError("personalize contains no graph nodes")
        # teleport vector: 1/|seeds| on seeds, 0 elsewhere
        teleport = nodes.join(
            seeds.withColumn("__t", F.lit(1.0 / n_seeds)), "node", "left"
        ).select("node", F.coalesce("__t", F.lit(0.0)).alias("__t"))
    else:
        teleport = nodes.withColumn("__t", F.lit(1.0 / n))
    teleport = teleport.localCheckpoint(eager=True)
    # init = teleport vector (uniform 1/n when not personalized)
    ranks = teleport.select(
        "node", F.col("__t").alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        # per-node outgoing mass; nodes without out-links are dangling
        # checkpointed: the dangling aggregate and the contribs join
        # both consume it, so the ranks-vs-deg join runs once per
        # iteration, not twice
        out = (
            ranks.join(deg, ranks["node"] == deg["src"], "left")
            .select(
                "node",
                "rank",
                (F.col("rank") / F.col("__deg")).alias("__share"),
            )
            .localCheckpoint(eager=True)
        )
        dangling = (
            out.filter(F.col("__share").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0))
            )
        ).collect()[0][0]
        contribs = (
            e.join(
                out.select(F.col("node").alias("src"), "__share"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("__share") * F.col("__w")).alias("__in"))
        )
        # restart + dangling mass follow the teleport distribution
        # (uniform unless personalized)
        base_scale = (1.0 - damping) + damping * dangling
        new_ranks = (
            teleport.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base_scale) * F.col("__t")
                    + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = (
                new_ranks.join(
                    ranks.withColumnRenamed("rank", "__old"), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks
