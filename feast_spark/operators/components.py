"""Connected components over near-dup pair graphs, and the dup-group
resolution built on it.

The pair generators (``docdedup.minhash_dedup_pairs`` / ``simhash_pairs``
/ ``jaccard_pairs``) emit *edges*; an actual dedup pass needs *groups*:
a transitive near-dup cluster must keep exactly one representative even
when A~B and B~C but A!~C.  That closure is connected components.

Algorithm: the alternating **large-star / small-star** method of
Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC'14) — the published shuffle-native CC algorithm:

* large-star: every node points its *larger* neighbors at the minimum
  of its neighborhood (incl. itself);
* small-star: every node points its *smaller-or-equal* neighbors (and
  itself) at that minimum.

Each round is two hash aggregations + a join — **no neighbor-list
``collect_list``** (a hot node's neighborhood never materializes in one
aggregation buffer, unlike naive label propagation via
``groupBy(...).agg(collect_set)``), and convergence is O(log^2 n)
rounds on adversarial graphs, O(1)-ish on the clique-like clusters LSH
emits.  Every round ends in ``localCheckpoint`` to truncate lineage —
an iterative DataFrame loop otherwise compounds the plan and recompiles
the whole history each round.

At 100 TB: each round shuffles the *current* edge set, which contracts
monotonically toward one edge per non-root node (star graphs), so later
rounds are cheap; the convergence check rides the same job via a
``count`` on the checkpointed frame (no extra scan of anything
corpus-sized — the edge frame is O(near-dup docs), not O(corpus)).

Reference has no counterpart (dedup is outside Feast's scope); this
extends the training-data pipeline per the build plan (SURVEY §7
phase 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_undirected(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """(u, v) with u < v, self-loops dropped, duplicates merged."""
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    return (
        pairs.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node, attach strictly-larger neighbors to the min of
    its neighborhood (including itself).  Eliminates long chains fast.
    Two shuffles: the min aggregate and the (broadcast-eligible,
    key-aligned) join back onto the directed edge list."""
    # directed both ways: every node sees its full neighborhood
    bidir = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bidir.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node, attach smaller-or-equal neighbors AND itself to
    the minimum of those — flattens each star to depth 1."""
    # direct every edge from its larger endpoint: u > v after this
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    attach_neighbors = (
        directed.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    attach_self = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        attach_neighbors.union(attach_self)
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
    )


def _driver_components(
    rows: list, node_col: str, component_col: str, spark, node_type
) -> DataFrame:
    """Union-find over a collected edge list: same labels as the
    distributed fixed point (component = min reachable id)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min: the smaller id stays root, so every root
            # IS its component's minimum
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    nodes = {n for e in rows for n in e}
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(node_col, node_type),
            T.StructField(component_col, node_type),
        ]
    )
    from feast_spark.io.localframe import local_df

    # local_df: LocalRelation — downstream joins against the labels
    # frame stay JVM-side instead of spinning a pickled-RDD Python
    # stage per evaluation (guide §4)
    return local_df(
        spark, [(n, find(n)) for n in sorted(nodes)], schema
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    component_col: str = "component",
    max_iter: int = 50,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Per-node component labels: ``(node, component)`` where
    ``component`` is the minimum node id reachable from ``node``.
    Nodes that appear in ``pairs`` only — isolated corpus docs are not
    the graph's problem (callers left-join and coalesce to self).

    Edge sets at or below ``driver_threshold`` (after dedup) resolve
    on the driver with union-find — near-dup graphs of clean corpora
    are tiny, and a handful of driver microseconds beats several
    Spark rounds of fixed scheduling cost.  The bound is explicit and
    memory-safe (fixed-width ids; 100k edges ≈ a few MB), the same
    bounded-collect pattern as IVF centroid training.  Pass 0 to force
    the distributed path.

    Above the threshold: iterate large-star/small-star until the edge
    set is a fixed point (converged = small-star output equals its
    input, checked via count + checksum on the checkpointed frame),
    then read the labels straight off the final star edges.
    """
    edges_plan = _canonical_undirected(pairs, src, dst)
    if driver_threshold > 0:
        # ONE job for the (common) small-graph case: a limit-bounded
        # collect both sizes the edge set and fetches it — the former
        # checkpoint+count+collect spent three serial jobs to learn
        # the same thing.  Overflow falls through to the distributed
        # path, paying one bounded partial evaluation.
        sample = edges_plan.limit(driver_threshold + 1).collect()
        if len(sample) <= driver_threshold:
            node_type = edges_plan.schema["u"].dataType
            return _driver_components(
                [(r["u"], r["v"]) for r in sample],
                node_col,
                component_col,
                pairs.sparkSession,
                node_type,
            )
    edges = edges_plan.localCheckpoint(eager=True)
    nodes = edges.select("u").union(edges.select("v")).distinct() \
        .withColumnRenamed("u", node_col)

    def _sig(df: DataFrame) -> tuple:
        # XOR-fold of per-edge hashes: order-insensitive, overflow-free
        # (ANSI mode), sound as a set signature because edges are
        # distinct by construction.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = _sig(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sig = _sig(edges)
        if new_sig == sig:
            break
        sig = new_sig

    # fixed point is a forest of depth-1 stars rooted at each
    # component's min; in canonical (least, greatest) form every edge
    # is (root, member), so u carries the label.
    labels = edges.select(
        F.col("v").alias(node_col), F.col("u").alias(component_col)
    )
    return (
        nodes.join(labels, node_col, "left")
        .select(
            F.col(node_col),
            F.coalesce(F.col(component_col), F.col(node_col)).alias(component_col),
        )
    )


def resolve_dup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    keep_by: str | None = None,
) -> DataFrame:
    """Deduplicate ``df`` against a near-dup pair graph: transitively
    close the pairs into components and keep ONE representative per
    component.  Rows never mentioned in ``pairs`` survive untouched.

    Representative choice: with ``keep_by=None`` the component-minimum
    id (cheapest — the label IS the survivor, no second look at the
    data); with ``keep_by=<column>`` the row with the highest value of
    that column wins (ties break on the lower id) — the keep-the-best-
    quality variant of a production dedup pass.  Either way the choice
    is deterministic.

    The final filter is a left-anti join against the non-representative
    id set.  No forced broadcast: on clean corpora the loser set is
    tiny and AQE broadcasts it; on crawl-scale near-dup-heavy corpora
    it can be a third of all ids, where a shuffled anti-join is the
    correct plan — the ids are fixed-width either way.  The
    ``keep_by`` ranking shuffles only the labeled near-dup rows
    (O(docs in components), not O(corpus))."""
    from pyspark.sql.window import Window

    cc = connected_components(pairs, src=src, dst=dst)
    if keep_by is None:
        losers = cc.filter(F.col("node") != F.col("component")) \
            .select(F.col("node").alias(id_col))
    else:
        labeled = df.select(
            F.col(id_col).alias("node"), F.col(keep_by).alias("__kb")
        ).join(cc, "node")
        w = Window.partitionBy("component").orderBy(
            F.col("__kb").desc_nulls_last(), F.col("node").asc()
        )
        losers = (
            labeled.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .select(F.col("node").alias(id_col))
        )
    return df.join(losers, id_col, "left_anti")


def component_stats(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-component size + representative — the audit view of a dedup
    pass (how big are the dup clusters, what survives)."""
    cc = connected_components(pairs, src=src, dst=dst)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .withColumnRenamed("component", "representative")
    )
