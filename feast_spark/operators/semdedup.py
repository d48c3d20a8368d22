"""SemDeDup-style semantic deduplication over embedding columns.

The public method (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"; no
reference-repo counterpart): cluster the corpus' embeddings with
k-means, then look for near-duplicate pairs ONLY within each cluster
— semantically identical documents (paraphrases, templated rewrites,
boilerplate variants) land in the same cluster, so the quadratic
pair search shrinks from O(n^2) to sum over clusters of O(|c|^2)
with |c| ~ n/k.  Survivors keep one representative per transitive
group (reusing the large-star/small-star connected-components
resolution — the same machinery as MinHash dedup).

Spark shape, stage by stage:

1. **Fit** — `similarity.ivf_train_centroids`: k-means on a
   deterministic hash-ordered SAMPLE (k * sample_per_centroid rows),
   so training cost is independent of corpus size.
2. **Assign** — `similarity.nearest_centroid`: argmin-L2 over the
   broadcast centroid literals, a single codegen expression; the
   corpus streams through one narrow scan, no Python, no shuffle.
3. **Pair** — the LSH-bucket pipeline with cells as buckets: shuffle
   ONLY (id, cell) — corpus vectors never enter an exchange — then
   collect each cluster's id array and expand (id_a < id_b) pairs
   inside the aggregation output (no self-join anywhere; the count
   window enforcing `max_cluster_size` shares the cell partitioning
   with the groupBy).  Candidate pairs then fetch their two vectors
   via candidates-only semi-joins for the exact cosine verify — at
   scale candidates are <<1% of the corpus, so verify cost ~vanishes
   (the same argument as minhash_dedup_pairs' verify stage).
   `max_cluster_size` drops degenerate mega-clusters (near-constant
   embedding regions — zero vectors, collapsed encoders — would
   otherwise cost |c|^2).
4. **Resolve** — `components.resolve_dup_groups` keeps the min-id
   (or best-``keep_by``) representative per group.

Known recall trade-off (inherent to the method, documented in the
paper): a near-dup pair straddling a cluster boundary is missed;
recall is controlled by ``n_clusters`` (fewer, fatter clusters =
higher recall, more pair work).  For exact ground truth on small
corpora use `similarity.exact_cosine_pairs`.

**The scaling discipline that makes or breaks this operator** (caught
empirically by the r7 scale curve, SCALE.md): per-cell pair expansion
is C(|c|, 2) BEFORE the threshold filters anything, so cluster
POPULATION — not cluster count — is the complexity knob.  A fixed
``n_clusters`` while the corpus grows 10x grows |c| 10x and pair work
100x (measured: tail exponent 1.98, 209 s at 20k vectors).  Scale
``n_clusters`` with the corpus so mean |c| stays at
``target_cluster_size`` (the paper's own regime — they cluster to
fixed-size cells): the default ``n_clusters=None`` does exactly that
from a cheap count, and the same curve then measures ~linear.
``max_cluster_size`` remains the backstop against individual
degenerate cells, not a substitute for scaling k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feast_spark.functions.text import sql_ident
from feast_spark.operators.components import resolve_dup_groups
from feast_spark.operators.similarity import ivf_train_centroids

__all__ = ["semantic_dedup_pairs", "semantic_dedup", "semdedup_against_index"]


def with_cluster_id(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "__cell",
) -> DataFrame:
    """Nearest-centroid assignment, size-adaptive (expression tree on
    small inputs, Arrow-vectorized at corpus scale — bit-identical
    either way, see ``similarity.assign_nearest_centroid``).  Both
    builders cast elements to double themselves, so the raw column
    goes straight in."""
    from feast_spark.operators.similarity import assign_nearest_centroid

    return assign_nearest_centroid(
        df, sql_ident(vec_col), centroids, out_col
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    threshold: float = 0.95,
    iters: int = 2,
    max_cluster_size: int | None = 10_000,
    centroids: list[list[float]] | None = None,
    target_cluster_size: int = 1_024,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine >= threshold, searched
    within k-means clusters only.  Pass ``centroids`` to reuse a
    trained quantizer across corpora snapshots (stable cluster ids =
    stable dedup decisions as the corpus grows).

    ``n_clusters=None`` (default) picks ``max(8, n /
    target_cluster_size)`` from one cheap count, holding mean cell
    population — and therefore per-cell C(|c|, 2) pair work — CONSTANT
    as the corpus grows (the module docstring's scaling discipline; a
    fixed k measured quadratic on the r7 scale curve)."""
    from feast_spark.operators.docdedup import _bucket_pairs, _persist

    if centroids is None and n_clusters is None:
        n_clusters = max(8, int(df.count()) // target_cluster_size)
    cents = (
        centroids
        if centroids is not None
        else ivf_train_centroids(
            df, id_col=id_col, vec_col=vec_col, n_centroids=n_clusters,
            iters=iters,
        )
    )
    # ONE corpus pass: assign (narrow) then shuffle ONLY (id, cell) —
    # vectors never enter an exchange.  Cluster cap and the
    # collect_list share the same __cell partitioning (the window's
    # exchange is reused by the groupBy, same shape as the LSH bucket
    # cap), and pair expansion happens inside the aggregation output —
    # no self-join.  The r7-initial formulation self-joined the
    # assigned frame on __cell and scanned + assigned the corpus
    # TWICE (visible as two FileScans in the plan); this shape is the
    # minhash bucket pipeline's, with cells as buckets.
    from feast_spark.operators.docdedup import widen_parallelism

    # nearest-centroid assignment is the corpus-wide CPU pass and runs
    # at the scan's partitioning: widen a small-file scan first (no-op
    # whenever the input already has >= cores files, i.e. at scale)
    assigned = with_cluster_id(
        widen_parallelism(
            df.select(F.col(id_col).alias("__sid"), F.col(vec_col).alias("__v"))
        ),
        "__v",
        cents,
    ).select("__sid", "__cell")
    if max_cluster_size is not None:
        w = Window.partitionBy("__cell")
        assigned = (
            assigned.withColumn("__csz", F.count(F.lit(1)).over(w))
            .filter(F.col("__csz") <= max_cluster_size)
            .drop("__csz")
        )
    grouped = assigned.groupBy("__cell").agg(
        F.collect_list("__sid").alias("docs")
    )
    cands = _persist(_bucket_pairs(grouped.filter(F.size("docs") > 1)))
    return _verify_pairs_cosine(df, cands, id_col, vec_col, threshold)


def _verify_pairs_cosine(
    df: DataFrame,
    cands: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-cosine verify of candidate (id_a, id_b) pairs against the
    corpus, touching candidate ids only: one (persisted) broadcast
    semi-join narrows the corpus to candidate vectors, then the pair
    frame fetches both sides from that narrowed frame.  The semi-joined
    frame is persisted because BOTH joins read it — unpersisted, the
    corpus semi-join ran twice (once per side).  The cosine projection
    is one ``selectExpr`` (SQL-text twin of ``similarity.cosine`` —
    identical casts and fold order)."""
    from feast_spark.operators.docdedup import _persist
    from feast_spark.operators.similarity import cosine_sql

    # no distinct on the build side: a left semi join keeps probe-side
    # set semantics whatever the build side's duplication, so the
    # distinct's exchange+aggregate AQE round bought nothing
    cand_ids = cands.selectExpr(
        f"explode(array(id_a, id_b)) AS {sql_ident(id_col)}"
    )
    vecs = _persist(df.select(id_col, vec_col).join(cand_ids, id_col, "semi"))
    from feast_spark.operators.similarity import _sql_double

    # BOTH sides fetch from the SAME persisted frame with an identical
    # plan (alias, not rename/re-projection): the broadcast builds
    # canonicalize equal and Spark plans the second as a
    # ReusedExchange — one broadcast job instead of two.  The pure
    # projection after the joins restores the __va/__vb names the
    # cosine SQL twin expects.
    # the probe side is aliased too: a caller whose id_col/vec_col is
    # literally "id_a"/"id_b" would otherwise make the unqualified
    # probe reference ambiguous against the build side's columns
    pc = cands.alias("__spc")
    va, vb = vecs.alias("__sva"), vecs.alias("__svb")
    qid, qvec = sql_ident(id_col), sql_ident(vec_col)
    return (
        pc.join(va, F.col("__spc.id_a") == F.expr(f"__sva.{qid}"))
        .join(vb, F.col("__spc.id_b") == F.expr(f"__svb.{qid}"))
        .select(
            F.col("__spc.id_a").alias("id_a"),
            F.col("__spc.id_b").alias("id_b"),
            F.expr(f"__sva.{qvec}").alias("__va"),
            F.expr(f"__svb.{qvec}").alias("__vb"),
        )
        .selectExpr(
            "id_a",
            "id_b",
            f"round({cosine_sql('__va', '__vb')}, 6) AS cos",
        )
        .filter(f"cos >= {_sql_double(threshold)}")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    threshold: float = 0.95,
    iters: int = 2,
    max_cluster_size: int | None = 10_000,
    centroids: list[list[float]] | None = None,
    keep_by: str | None = None,
    target_cluster_size: int = 1_024,
) -> DataFrame:
    """Drop all but one representative of every semantic-duplicate
    group: pairs -> transitive closure -> keep min id (or the max
    ``keep_by`` value) per component.  Returns the surviving rows of
    ``df`` with their original columns."""
    pairs = semantic_dedup_pairs(
        df, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters,
        threshold=threshold, iters=iters, max_cluster_size=max_cluster_size,
        centroids=centroids, target_cluster_size=target_cluster_size,
    )
    return resolve_dup_groups(df, pairs, id_col, keep_by=keep_by)


def semdedup_against_index(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_cluster_size: int | None = 10_000,
    as_of: int | str | None = None,
) -> DataFrame:
    """Incremental semantic dedup: (id_a, id_b, cos) pairs with
    cosine >= threshold touching at least one NEW vector, searched
    within the cells of a PERSISTED IVF index (``build_ivf_index``) —
    new-vs-corpus and new-vs-new, never corpus-vs-corpus (those were
    resolved when their epochs landed).  The semantic sibling of
    ``minhash_index.dedup_against_index``: the corpus is never
    re-embedded or re-clustered; the index quantizer is frozen, so
    incremental decisions equal ``semantic_dedup_pairs`` over
    (corpus ∪ new) with the same centroids restricted to new-side
    pairs (identity pinned by tests).

    Plan: assign the new batch to cells (narrow, broadcast centroids),
    collect its distinct cell ids driver-side (bounded by the
    quantizer size — tiny), and read ONLY those cells' directories
    from the committed epochs (static partition pruning).  Pair
    expansion happens inside the capped combined-population cells (the
    cap sees corpus + new together, the same population a full
    recompute would cap on); the exact-cosine verify touches candidate
    ids only.  Per-slice cost is O(new vectors + touched-cell
    corpus vectors), independent of corpus size.

    New ids must be disjoint from the index's (append contract);
    the normal flow is dedup -> drop -> ``ivf_index_append`` the
    survivors.  ``as_of=commit_seq`` checks the new slice against the
    corpus AS OF that archived commit (quantizer generation and epoch
    list both historical — io/epochs.py manifest history), e.g. to
    reproduce a past ingestion run's dedup decisions exactly."""
    from feast_spark.operators.docdedup import _bucket_pairs, _persist
    from feast_spark.operators.similarity import (
        _ivf_load_centroids,
        _ivf_manifest,
        _ivf_vectors,
    )
    from feast_spark.io.fs import LocalFS

    manifest = _ivf_manifest(path, LocalFS(), as_of=as_of)
    cents = _ivf_load_centroids(spark, path, manifest=manifest)
    from feast_spark.operators.docdedup import widen_parallelism

    from feast_spark.operators.similarity import assign_nearest_centroid

    new_assigned = assign_nearest_centroid(
        widen_parallelism(
            new_df.select(
                F.col(id_col).alias("__sid"), F.col(vec_col).alias("__v")
            )
        ),
        "__v",
        cents,
        "__cell",
    )
    touched = sorted(
        r["__cell"]
        for r in new_assigned.select("__cell").distinct().collect()
    )
    idx = (
        _ivf_vectors(spark, path, manifest=manifest)
        .filter(F.col("cell").isin(touched))
        .select(
            F.col("id").alias("__sid"),
            F.col("vec").alias("__v"),
            F.col("cell").alias("__cell"),
        )
    )
    combined = idx.unionByName(new_assigned)
    if max_cluster_size is not None:
        w = Window.partitionBy("__cell")
        combined = (
            combined.withColumn("__csz", F.count(F.lit(1)).over(w))
            .filter(F.col("__csz") <= max_cluster_size)
            .drop("__csz")
        )
    vecs = _persist(combined)
    grouped = vecs.groupBy("__cell").agg(
        F.collect_list("__sid").alias("docs")
    )
    # no .distinct(): each vector lives in exactly one cell, so
    # _bucket_pairs emits every pair once (unlike multi-band minhash)
    pairs = _bucket_pairs(grouped.filter(F.size("docs") > 1))
    # "touches at least one NEW id" in ONE pass over the pair frame:
    # two left joins against the distinct new-id set and an OR filter.
    # The old spelling ran the whole (unpersisted) pair pipeline twice
    # — once per semi-join leg — then paid a distinct exchange to
    # merge the legs; _bucket_pairs emits each pair exactly once and
    # the joins are multiplicity-preserving (build side distinct), so
    # the result set is identical with no distinct at all.
    new_ids = new_df.select(F.col(id_col).alias("__nid")).distinct()
    na, nb = new_ids.alias("__dna"), new_ids.alias("__dnb")
    cands = _persist(
        pairs.join(na, pairs["id_a"] == F.col("__dna.__nid"), "left")
        .join(nb, pairs["id_b"] == F.col("__dnb.__nid"), "left")
        .filter(
            F.col("__dna.__nid").isNotNull()
            | F.col("__dnb.__nid").isNotNull()
        )
        .select("id_a", "id_b")
    )
    from feast_spark.operators.similarity import _sql_double, cosine_sql

    # identical build subtrees (alias, not re-projection) so the second
    # broadcast is a ReusedExchange — see _verify_pairs_cosine
    va, vb = vecs.alias("__iva"), vecs.alias("__ivb")
    return (
        cands.join(va, F.col("id_a") == F.col("__iva.__sid"))
        .join(vb, F.col("id_b") == F.col("__ivb.__sid"))
        .select(
            "id_a", "id_b",
            F.col("__iva.__v").alias("__va"),
            F.col("__ivb.__v").alias("__vb"),
        )
        .selectExpr(
            "id_a",
            "id_b",
            f"round({cosine_sql('__va', '__vb')}, 6) AS cos",
        )
        .filter(f"cos >= {_sql_double(threshold)}")
    )
