"""Product quantization (PQ) for embedding search at memory scale.

IVF (``operators/similarity.py``) prunes which vectors to score;
PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
public method) shrinks what a stored vector costs: split d dims into M
subspaces, k-means each subspace to K centroids, store each vector as
M uint8 code indices — d*4 bytes become M bytes (e.g. 64-dim float =
256 B -> 8 B at M=8, 32x).  Search uses asymmetric distance (ADC): per
query, precompute an (M, K) table of subspace distances, then a
candidate's distance is M table lookups — no float vector ever loaded.

Spark split of the algorithm:

- **train** (driver-bounded): deterministic hash-ordered sample of
  ``k_codes * sample_per_code`` vectors -> numpy Lloyd iterations per
  subspace on the driver.  Sample size is independent of corpus scale,
  identical in spirit to ``ivf_train_centroids``.
- **encode** (distributed): codebooks broadcast (M*K*d/M floats, a few
  hundred KB); encoding is a vectorized Arrow-batched map — argmin
  over each subspace via one einsum per batch.  No shuffle.
- **search** (distributed): queries + codebooks broadcast; each corpus
  partition streams its codes once, computes ADC scores against all
  queries vectorized, and emits only its local top-k per query.  The
  single shuffle carries candidates (partitions x queries x k rows),
  never the corpus.  A final per-query min_by aggregation yields the
  global top-k.

Numpy in the loop is deliberate here: a 256-entry codebook argmin is
not expressible as a sane Catalyst expression tree (M*K vector
literals), and the Arrow-batched einsum is the fastest local kernel
available — this is the documented "built-ins genuinely can't express
it" case.
"""

from __future__ import annotations

import numpy as np
import pandas  # noqa: F401 — resolves pandas_udf type hints at def time
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T



def _as_matrix(rows) -> np.ndarray:
    return np.array([list(map(float, r)) for r in rows], dtype=np.float64)


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m_subspaces: int = 8,
    k_codes: int = 256,
    iters: int = 10,
    sample_per_code: int = 32,
) -> list[list[list[float]]]:
    """Train PQ codebooks: returns ``m_subspaces`` codebooks of
    ``<=k_codes`` centroids each (nested plain lists — tiny, broadcast-
    friendly, JSON-serializable for a registry).

    The corpus contributes only a bounded deterministic sample
    (hash-ordered, so retraining is reproducible); Lloyd runs on the
    driver in numpy — k_codes*sample_per_code rows regardless of
    corpus size."""
    n_sample = k_codes * sample_per_code
    rows = (
        df.select(F.col(vec_col).alias("__v"), F.col(id_col).alias("__id"))
        .where(F.size("__v") > 0)
        .orderBy(F.xxhash64(F.col("__id")))
        .limit(n_sample)
        .collect()
    )
    X = _as_matrix([r["__v"] for r in rows])
    n, d = X.shape
    if d % m_subspaces:
        raise ValueError(f"dim {d} not divisible by m_subspaces {m_subspaces}")
    sub = d // m_subspaces
    books: list[list[list[float]]] = []
    for m in range(m_subspaces):
        Xm = X[:, m * sub : (m + 1) * sub]
        k = min(k_codes, len(np.unique(Xm, axis=0)))
        # deterministic init: first k distinct rows in sample order
        _, first_idx = np.unique(Xm, axis=0, return_index=True)
        cents = Xm[np.sort(first_idx)[:k]].copy()
        for _ in range(iters):
            # assign: (n, k) distances via the expanded dot identity
            d2 = (
                (Xm**2).sum(1)[:, None]
                - 2 * Xm @ cents.T
                + (cents**2).sum(1)[None, :]
            )
            assign = d2.argmin(1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = Xm[mask].mean(0)
        books.append([[float(x) for x in c] for c in cents])
    return books


def md5_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    k_codes: int = 16,
) -> list[list[list[float]]]:
    """Engine-portable PQ codebooks (the PQ sibling of
    ``similarity.md5_centroids``): the ``k_codes`` vectors whose
    md5(CAST(id AS STRING)) sorts first are sliced per subspace, and
    the rank-j vector's m-th slice becomes code j of codebook m.  No
    float arithmetic in the selection, so any engine with md5 derives
    the identical codebooks — the driver oracle re-derives them in SQL
    and value-checks the full encode/probe/ADC pipeline cross-engine.
    ``pq_train`` (sampled Lloyd per subspace) remains the quality
    path; this is the reproducibility path.  Duplicate subvectors are
    kept (encode's argmin tie-breaks to the LOWEST code index on both
    engines, so duplicates are inert).  Bounded driver-side collect
    (k_codes rows).

    Row eligibility is deliberately UNFILTERED, exactly like
    ``md5_centroids`` and the oracle's md5-ranked selection: all three
    must pick the identical row set or the 'portable' models diverge.
    The corpus contract (fixed-dimension, non-null vectors — what
    every operator in this family already assumes) is the caller's."""
    rows = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy(F.md5(F.col("__id").cast("string")))
        .limit(k_codes)
        .collect()
    )
    X = _as_matrix([r["__v"] for r in rows])
    d = X.shape[1]
    if d % m_subspaces:
        raise ValueError(f"dim {d} not divisible by m_subspaces {m_subspaces}")
    sub = d // m_subspaces
    return [
        [[float(x) for x in row[m * sub : (m + 1) * sub]] for row in X]
        for m in range(m_subspaces)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """df + ``out_col`` array<int> of length M — the 32x-smaller stored
    representation.  Vectorized per Arrow batch: one einsum-shaped
    argmin per subspace; codebooks ride along as a broadcast closure.

    Implemented as a SCALAR pandas_udf over the vector column alone
    (guide §4: pass only the columns the function needs) — the former
    ``mapInPandas`` shipped every row column INTO Python and the whole
    row (float vectors included) back OUT through Arrow per batch; the
    projection form sends one array column each way and leaves the rest
    of the row JVM-side, so downstream column pruning works too."""
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    m_subspaces = len(books)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: "pandas.Series") -> "pandas.Series":
        import pandas as pd

        mat = np.array(
            [
                v if v is not None and len(v) else [0.0] * (sub * m_subspaces)
                for v in vecs
            ],
            dtype=np.float64,
        )
        codes = np.empty((len(mat), m_subspaces), dtype=np.int64)
        for m, cents in enumerate(books):
            Xm = mat[:, m * sub : (m + 1) * sub]
            d2 = (
                (Xm**2).sum(1)[:, None]
                - 2 * Xm @ cents.T
                + (cents**2).sum(1)[None, :]
            )
            codes[:, m] = d2.argmin(1)
        return pd.Series(
            [
                None if (v is None or not len(v)) else [int(c) for c in row]
                for v, row in zip(vecs, codes)
            ]
        )

    return df.withColumn(out_col, encode(F.col(vec_col)))


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    probe_sets: dict | None = None,
    cell_col: str = "cell",
    query_rows: list | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, neighbor_id, adc_dist).

    Per partition: build each query's (M, K) distance table once, score
    every local code row with M lookups (one fancy-index per subspace,
    vectorized across the batch), keep the local top-k.  Globally: one
    aggregation merges partition candidates.  The corpus-side shuffle
    volume is O(partitions * queries * k), independent of corpus rows.

    ``probe_sets`` (optional, used by :func:`ivfpq_topk`): a
    ``{query_id: iterable[cell]}`` map.  When given, ``codes_df`` must
    carry ``cell_col``; rows outside a query's own probe set are masked
    to +inf INSIDE the kernel BEFORE the partition-local top-k, so each
    query's k candidates come exclusively from its probed cells — an
    exact-k guarantee even under cell skew, with no over-fetch.

    ``query_rows`` (optional): pre-collected ``(query_id, vec)`` pairs
    — pass them when the caller already collected the queries (the
    persisted-index probe does) so the query plan is evaluated exactly
    once per call; ``queries`` still supplies the output id type."""
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    m_subspaces = len(books)
    if query_rows is None:
        collected = queries.select(
            F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
        ).collect()
        query_rows = [(r["qid"], r["qv"]) for r in collected]
    q_ids = [qid for qid, _ in query_rows]
    if not q_ids:
        # empty query batch -> empty top-k (the old code tripped over
        # a shape-(0,) matrix with a bare IndexError before the dim
        # guard could fire)
        from feast_spark.io.localframe import local_df

        return local_df(
            codes_df.sparkSession,
            [],
            T.StructType(
                [
                    T.StructField(
                        "query_id", queries.schema[query_id_col].dataType
                    ),
                    T.StructField(
                        "neighbor_id", codes_df.schema[id_col].dataType
                    ),
                    T.StructField("adc_dist", T.DoubleType()),
                ]
            ),
        )
    Q = _as_matrix([qv for _, qv in query_rows])
    if Q.shape[1] != sub * m_subspaces:
        raise ValueError("query dim does not match codebooks")
    # (n_queries, M, K) ADC tables, built once on the driver and shipped
    # in the task closure (small: Q * M * K doubles)
    tables = np.stack(
        [
            (Q[:, m * sub : (m + 1) * sub] ** 2).sum(1)[:, None]
            - 2 * Q[:, m * sub : (m + 1) * sub] @ books[m].T
            + (books[m] ** 2).sum(1)[None, :]
            for m in range(m_subspaces)
        ],
        axis=1,
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id_col].dataType),
            T.StructField("neighbor_id", codes_df.schema[id_col].dataType),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )
    # per-query probe cells as sorted arrays, built once and shipped in
    # the closure (queries are broadcast-few by contract)
    probe_arrays = (
        {qid: np.array(sorted(cells)) for qid, cells in probe_sets.items()}
        if probe_sets is not None
        else None
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            valid = pdf[pdf[codes_col].notna()]
            if not len(valid):
                continue
            C = np.array([list(c) for c in valid[codes_col]], dtype=np.int64)
            ids = valid[id_col].to_numpy()
            # dist[q, row] = sum_m tables[q, m, C[row, m]]
            dist = np.zeros((len(q_ids), len(C)))
            for m in range(m_subspaces):
                dist += tables[:, m, :][:, C[:, m]]
            if probe_arrays is not None:
                cells = valid[cell_col].to_numpy()
                empty = np.array([], dtype=np.int64)
                for qi, qid in enumerate(q_ids):
                    allowed = np.isin(cells, probe_arrays.get(qid, empty))
                    dist[qi, ~allowed] = np.inf
            top = min(k, dist.shape[1])
            idx = np.argpartition(dist, top - 1, axis=1)[:, :top]
            rows = {"query_id": [], "neighbor_id": [], "adc_dist": []}
            for qi, qid in enumerate(q_ids):
                for j in idx[qi]:
                    if not np.isfinite(dist[qi, j]):
                        continue  # masked off-probe row: never a candidate
                    rows["query_id"].append(qid)
                    rows["neighbor_id"].append(ids[j])
                    rows["adc_dist"].append(float(dist[qi, j]))
            yield pd.DataFrame(rows)

    in_cols = [id_col, codes_col] + ([cell_col] if probe_arrays is not None else [])
    candidates = codes_df.select(*in_cols).mapInPandas(run, out_schema)
    ranked = candidates.groupBy("query_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct("adc_dist", "neighbor_id"))
            ),
            1,
            k,
        ).alias("__top")
    )
    return ranked.select(
        "query_id", F.explode("__top").alias("__t")
    ).select(
        "query_id",
        F.col("__t.neighbor_id").alias("neighbor_id"),
        F.col("__t.adc_dist").alias("adc_dist"),
    )


def pq_topk_reranked(
    corpus: DataFrame,
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    vec_col: str = "embedding",
    k: int = 10,
    candidates_per_query: int = 50,
) -> DataFrame:
    """The full two-stage ANN: PQ ADC recall stage (cheap, codes only)
    -> exact cosine re-rank of the candidate set (precise, touches
    only ``candidates_per_query`` float vectors per query).

    Output matches ``similarity.cosine_topk``'s shape: (query_id,
    neighbor_id, cos), ranked by exact cosine.  The corpus float
    vectors are read ONLY for candidate ids via a broadcast semi-join
    — at 100 TB the re-rank fetch is k*queries rows, not a scan.

    The queries frame is evaluated ONCE: the same collected rows feed
    the ADC stage's driver-built distance tables and, as a
    LocalRelation, the re-rank's broadcast side — the former plan
    scanned the (possibly corpus-backed) queries frame twice per
    call."""
    from feast_spark.io.localframe import local_df
    from feast_spark.operators.similarity import cosine

    collected = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    query_rows = [(r["qid"], r["qv"]) for r in collected]
    cand = pq_topk(
        codes_df,
        queries,
        codebooks,
        id_col=id_col,
        codes_col=codes_col,
        query_id_col=id_col,
        query_vec_col=vec_col,
        k=candidates_per_query,
        query_rows=query_rows,
    ).select("query_id", "neighbor_id")
    fetched = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).join(F.broadcast(cand), on="neighbor_id")
    q = local_df(
        queries.sparkSession,
        query_rows,
        T.StructType(
            [
                T.StructField(
                    "query_id", queries.schema[id_col].dataType
                ),
                T.StructField("__qvec", queries.schema[vec_col].dataType),
            ]
        ),
    )
    scored = fetched.join(F.broadcast(q), on="query_id").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("cos"),
    )
    ranked = scored.groupBy("query_id").agg(
        F.slice(
            F.reverse(
                F.array_sort(F.collect_list(F.struct("cos", "neighbor_id")))
            ),
            1,
            k,
        ).alias("__top")
    )
    return ranked.select("query_id", F.explode("__top").alias("__t")).select(
        "query_id",
        F.col("__t.neighbor_id").alias("neighbor_id"),
        F.col("__t.cos").alias("cos"),
    )


def ivfpq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    cell_col: str = "cell",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """IVF + PQ composed — the FAISS-IVFPQ shape as relational ops:
    the coarse quantizer prunes WHICH rows get scored (only rows in a
    query's ``n_probe`` nearest cells), PQ-ADC decides HOW CHEAPLY
    each survivor is scored (M table lookups, no float vectors).

    ``codes_df`` must carry both a ``cell_col`` (from
    ``similarity.assign_nearest`` over the same centroids) and PQ
    codes (from :func:`pq_encode`).  The probed-cell filter is an
    isin over the union of all queries' probe sets (queries are few
    and broadcast by contract), so the corpus scan drops
    ~(1 - n_probe/n_cells) of rows BEFORE any ADC arithmetic; the ADC
    kernel then masks each query's off-probe rows to +inf BEFORE its
    partition-local top-k, so every query gets exactly k candidates
    from its own probe set (when its probed cells hold >= k rows) —
    identical to plain ``pq_topk`` restricted to those cells, even
    under cell skew.  No over-fetch, no post-hoc filter join.

    The queries frame is evaluated ONCE: a single collect feeds both
    the driver-side probe (``probe_cells_py``, pinned bit-identical to
    the expression probe) and the ADC tables via ``query_rows`` — the
    former plan ran a probe job over the queries frame and then
    re-evaluated it inside ``pq_topk``'s collect (two evaluations per
    call, and a nondeterministic frame could pair probe sets from one
    snapshot with ADC tables from another)."""
    from feast_spark.operators.similarity import probe_cells_py

    collected = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    query_rows = [(r["qid"], r["qv"]) for r in collected]
    q_probe = {
        qid: probe_cells_py(qv, centroids, n_probe)
        for qid, qv in query_rows
    }
    all_cells = sorted({c for cells in q_probe.values() for c in cells})
    pruned = codes_df.where(F.col(cell_col).isin(all_cells))

    return pq_topk(
        pruned.select(id_col, codes_col, cell_col),
        queries,
        codebooks,
        id_col=id_col,
        codes_col=codes_col,
        query_id_col=id_col,
        query_vec_col=vec_col,
        k=k,
        probe_sets=q_probe,
        cell_col=cell_col,
        query_rows=query_rows,
    )


def save_codebooks(codebooks: list[list[list[float]]], path: str) -> None:
    """Persist PQ codebooks as JSON (registry-friendly, diffable)."""
    import json

    with open(path, "w") as f:
        json.dump(codebooks, f)


def load_codebooks(path: str) -> list[list[list[float]]]:
    import json

    with open(path) as f:
        return [
            [[float(x) for x in c] for c in book] for book in json.load(f)
        ]
