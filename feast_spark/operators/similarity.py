"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus; the corpus streams through one pass, the
  only shuffle is the per-query top-k aggregation.  Dot products run
  JVM-side via zip_with/aggregate (no Python in the loop).
* random-hyperplane LSH buckets — the scale path: P sign-bits per vector
  from deterministic pseudo-random hyperplanes; near neighbors collide
  in buckets, turning ANN into an equi-join.  Recall is tunable with
  (planes, tables).

At 100 TB the corpus side never materializes: both paths are a single
scan + narrow ops; candidate verification touches only bucket-collided
pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i in DOUBLE, left-to-right (bit-stable across engines that
    fold sequentially — DuckDB's list kernels do, which the oracle relies
    on)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cos) with deterministic ranking
    (cos desc — rounded if round_digits — then neighbor_id asc), self
    excluded.  ``queries`` must be small (it is broadcast)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    cos = cosine(F.col("__qvec"), F.col("__cvec"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("__rn").alias("rank"))
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

def _hyperplane_component(plane: int, dim: int) -> Column:
    """Deterministic ±1 pseudo-random hyperplane component from a
    Weyl-sequence-style integer mix — reproducible across sessions with
    no stored model."""
    mixed = (plane * 1_000_003 + dim * 7_919 + 12_345) * 2_654_435_761
    return F.lit(1.0) if (mixed >> 16) & 1 else F.lit(-1.0)


def with_lsh_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 16,
    out_col: str = "lsh_sig",
) -> DataFrame:
    """P sign-bits packed into a long: bit p = sign(v · h_p)."""
    bits = []
    for p in range(planes):
        s = None
        for d in range(dims):
            term = F.element_at(F.col(vec_col), d + 1).cast(
                "double"
            ) * _hyperplane_component(p, d)
            s = term if s is None else s + term
        bits.append(
            F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return df.withColumn(out_col, sig)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 12,
    k: int = 10,
    probe_hamming: int = 2,
) -> DataFrame:
    """ANN: candidates = corpus vectors whose signature is within
    ``probe_hamming`` bits of the query signature (multi-probe), then
    exact cosine re-rank of candidates only."""
    c = with_lsh_signature(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")),
        "__cvec",
        dims,
        planes,
        "__csig",
    )
    q = with_lsh_signature(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")),
        "__qvec",
        dims,
        planes,
        "__qsig",
    )
    cand = c.crossJoin(F.broadcast(q)).filter(
        (F.col("neighbor_id") != F.col("query_id"))
        & (
            F.bit_count(F.col("__csig").bitwiseXOR(F.col("__qsig")))
            <= probe_hamming
        )
    )
    cos = F.round(cosine(F.col("__qvec"), F.col("__cvec")), 4)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("__rn").alias("rank"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dims: int = 64,
    planes: int = 12,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket on the exact
    signature (equi-join — no cross join), verify candidates with exact
    cosine >= threshold."""
    sig = with_lsh_signature(
        df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("vec")),
        "vec",
        dims,
        planes,
        "sig",
    )
    a = sig.select(F.col("doc").alias("id_a"), F.col("vec").alias("va"), F.col("sig"))
    b = sig.select(F.col("doc").alias("id_b"), F.col("vec").alias("vb"), F.col("sig"))
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
    )
