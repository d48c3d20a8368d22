"""Empirical scale curve for the headline operators.

sf0.1 proves correctness; this harness measures how wall-time actually
GROWS with data volume — the one claim `SCALE.md`'s plan audits cannot
settle on their own.  It generates deterministic synthetic corpora
whose *shape* is held constant while row counts scale (same
events-per-user, same dup-cluster rate and size distribution, same
vocab/shingle skew, same embedding cluster structure), runs the top
headline operators at 1x / 3x / 10x of the sf0.1 volume, and fits the
scaling exponent alpha in  t(s) ~ t(1) * s**alpha  by least squares
over log-log points.  alpha ~ 1.0 means linear scaling (what every
SCALE.md entry promises); alpha >> 1 exposes superlinear blowups
(in-bucket pair expansion, window-state growth, per-group Arrow
overhead) that a single scale factor cannot.

Shape constancy is what makes the exponent meaningful: scaling events
by adding USERS (not events-per-user) keeps per-key group sizes fixed,
scaling documents by adding dup CLUSTERS (not growing them) keeps the
candidate-pair count per bucket fixed — i.e. the 10x corpus is "more
of the same corpus", exactly how a crawl grows.

Usage:
    python tools/scale_curve.py                   # full 1x/3x/10x run
    SPARK_GRAFT_SCALES=1,3 python tools/scale_curve.py
    SPARK_GRAFT_SCALE_RUNS=1 python tools/scale_curve.py

Writes datasets under .scaledata/ (gitignored), prints one JSON line,
and the measured table is recorded in SCALE.md ("Measured scale
curve").
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42

# sf0.1 reference shape (TESTDATA.md): 100k events over 1500 users,
# 5k docs (~50 words each, ~0.2 near-dup rate), 2k x 64-dim embeddings
# in 10 clusters.  1x below == that volume.
BASE_EVENTS = 100_000
BASE_USERS = 1_500
BASE_DOCS = 5_000
BASE_VECS = 2_000
EMB_DIM = 64

_VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "join", "table", "row", "shuffle",
    "merge", "stream", "state", "cache", "disk", "plan", "stage", "task",
    "node", "skew", "limit", "range", "index", "block", "page", "byte",
]


def _zipf_weights(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def gen_events(out_dir: str, scale: float, seed: int = SEED) -> None:
    """Events grow by adding users; events-per-user stays ~66 like
    sf0.1, so per-key group sizes (the sessionize window state, the
    as-of per-key run length) are scale-invariant."""
    rng = np.random.default_rng((seed, int(scale * 1000), 1))
    n = int(BASE_EVENTS * scale)
    n_users = int(BASE_USERS * scale)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span = 30 * 86_400 * 1_000_000
    ts = t0 + rng.integers(0, span, n)
    types = np.array(["signup", "purchase", "view", "click", "error"])
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype="int64")),
            "ts": pa.array(np.sort(ts)).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n).astype("int64")),
            "event_type": pa.array(types[rng.integers(0, 5, n)]),
            "value": pa.array(rng.gamma(2.0, 25.0, n)),
            "props": pa.array(np.full(n, "{}", dtype=object)),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"))


def gen_documents(out_dir: str, scale: float, seed: int = SEED) -> None:
    """Documents grow by adding CLUSTERS: each doc is, with fixed
    probability, a lightly mutated copy of a recent doc (geometric
    cluster sizes, window-bounded), else a fresh Zipf-vocab sample.
    Dup rate, cluster-size distribution, and shingle hotness are all
    scale-invariant, so LSH bucket occupancy per bucket stays flat
    while bucket COUNT grows — the linear-scaling regime the banded
    design promises."""
    rng = np.random.default_rng((seed, int(scale * 1000), 2))
    n = int(BASE_DOCS * scale)
    weights = _zipf_weights(len(_VOCAB))
    langs = np.array(["en", "de", "fr", "es", "pt"])
    lengths = rng.integers(10, 95, n)
    dup_of = np.where(
        (rng.random(n) < 0.20) & (np.arange(n) > 0),
        np.maximum(0, np.arange(n) - rng.integers(1, 100, n)),
        -1,
    )
    texts: list[str] = []
    for i in range(n):
        if dup_of[i] >= 0:
            words = texts[dup_of[i]].split(" ")
            w = np.array(words, dtype=object)
            mut = rng.random(len(w)) < 0.05
            if mut.any():
                w[mut] = rng.choice(_VOCAB, mut.sum(), p=weights)
            texts.append(" ".join(w.tolist()))
        else:
            texts.append(
                " ".join(rng.choice(_VOCAB, lengths[i], p=weights).tolist())
            )
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype="int64")),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs[rng.integers(0, 5, n)]),
            "source": pa.array(
                [f"src{int(x):02d}" for x in rng.integers(0, 20, n)]
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype="int64")
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(out_dir: str, scale: float, seed: int = SEED) -> None:
    """Embeddings grow within a FIXED 10-center Gaussian mixture, so
    IVF/PQ cell structure is scale-invariant and only per-cell
    population grows."""
    rng = np.random.default_rng((seed, int(scale * 1000), 3))
    n = int(BASE_VECS * scale)
    centers_rng = np.random.default_rng((seed, 99))  # scale-independent
    centers = centers_rng.normal(0, 1, (10, EMB_DIM))
    label = rng.integers(0, 10, n)
    vecs = (centers[label] + rng.normal(0, 0.3, (n, EMB_DIM))).astype(
        "float32"
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype="int64")),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel()), EMB_DIM
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(label.astype("int32")),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def generate(root: str, scale: float, seed: int = SEED) -> str:
    out_dir = os.path.join(root, f"x{scale:g}")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    gen_events(out_dir, scale, seed)
    gen_documents(out_dir, scale, seed)
    gen_embeddings(out_dir, scale, seed)
    return out_dir


def _sketch_build(spark, sf_dir):
    from pyspark.sql import functions as F

    from feast_spark.operators.sketches import build_distinct_sketches
    from feast_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return build_distinct_sketches(ev, "user_id", ["day"])


def _names(spark, sf_dir):
    """Record-linkage name table derived from documents: a Zipf-hot
    leading word (the hot-gram hazard real name corpora have — 'inc',
    'ltd') plus a unique md5 tail.  True dist<=1 matches are rare, the
    realistic shape."""
    from pyspark.sql import functions as F

    from feast_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat_ws(
            "-",
            F.split(F.col("text"), " ").getItem(0),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
        ).alias("name"),
    )


def _edit_join(max_gram_freq):
    def fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from feast_spark.operators.fuzzy_join import edit_distance_join

        names = _names(spark, sf_dir)
        left = names.filter(F.col("doc_id") % 2 == 0)
        right = names.filter(F.col("doc_id") % 2 == 1)
        return edit_distance_join(
            left, right, "doc_id", "name", "doc_id", "name",
            max_dist=1, max_gram_freq=max_gram_freq,
        )

    return fn


def _semantic_dedup_auto(spark, sf_dir):
    from feast_spark.operators.semdedup import semantic_dedup_pairs
    from feast_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(emb, "vec_id", "embedding", threshold=0.97)


def _contamination_fixed_eval(spark, sf_dir):
    """The realistic decontamination shape: the EVAL set (benchmarks)
    stays fixed while the train corpus grows — eval is pinned to the
    1x document-id range, train scales with the corpus.  Fast
    (xxhash64) shingles, like the other curve ops; the gated query is
    the portable md5 twin."""
    from pyspark.sql import functions as F

    from feast_spark.operators.contamination import ngram_contamination
    from feast_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("doc_id") % 3 != 0),
        docs.filter(
            (F.col("doc_id") % 3 == 0) & (F.col("doc_id") < BASE_DOCS)
        ),
        "doc_id",
        "text",
        n=5,
    )


def _ops():
    import __spark_entry__ as e
    from bench import q_pq_search

    return {
        "pit_join": e.q_pit_join,
        "sessionize": e.q_sessionize,
        "corpus_clean": e.q_corpus_clean,
        "minhash_lsh_fast": e.q_minhash_fast,
        "dup_groups_resolved": e.q_dup_groups_resolved,
        "pq_search": q_pq_search,
        "doc_chunks": e.q_doc_chunks,
        "sketch_build": _sketch_build,
        "bm25_topk": e.q_bm25_topk,
        "edit_join": _edit_join(None),
        "edit_join_capped": _edit_join(2000),
        "semantic_dedup_auto": _semantic_dedup_auto,
        "contamination_fixed_eval": _contamination_fixed_eval,
    }


def fit_exponent(scales: list[float], times: list[float]) -> float:
    """Least-squares slope of log t vs log s: t ~ t1 * s**alpha."""
    xs = np.log(np.asarray(scales, dtype=float))
    ys = np.log(np.asarray(times, dtype=float))
    return float(np.polyfit(xs, ys, 1)[0])


def run_curve(
    spark,
    root: str,
    scales: list[float],
    runs: int = 2,
    op_names: list[str] | None = None,
) -> dict:
    ops = _ops()
    if op_names:
        ops = {k: ops[k] for k in op_names}
    dirs = {s: generate(root, s) for s in scales}
    results: dict[str, dict] = {}
    for name, fn in ops.items():
        # one untimed execution absorbs JVM/codegen/file-listing warmup
        # so the first (op, scale) sample isn't charged session startup
        fn(spark, dirs[scales[0]]).count()
        per_scale = {}
        for s in scales:
            samples = []
            for _ in range(runs):
                t0 = time.monotonic()
                fn(spark, dirs[s]).count()
                samples.append(time.monotonic() - t0)
            per_scale[s] = round(statistics.median(samples), 3)
        ss, ts = list(per_scale), list(per_scale.values())
        # full-range fit + the top-end marginal exponent: small scales
        # are dominated by fixed per-job overhead (~0.3s of scheduling
        # at local[32]), which drags the full fit sublinear; the tail
        # slope is the honest answer to "what happens at 10x more"
        results[name] = {
            "times": {f"x{s:g}": t for s, t in per_scale.items()},
            "exponent": round(fit_exponent(ss, ts), 3) if len(ss) >= 2 else None,
            "tail_exponent": (
                round(fit_exponent(ss[-2:], ts[-2:]), 3) if len(ss) >= 2 else None
            ),
        }
    return results


def main() -> None:
    from pyspark.sql import SparkSession

    scales = [
        float(s)
        for s in os.environ.get("SPARK_GRAFT_SCALES", "1,3,10").split(",")
    ]
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    root = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata"),
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("feast_spark-scale-curve")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    only = os.environ.get("SPARK_GRAFT_SCALE_OPS")
    results = run_curve(
        spark, root, scales, runs, op_names=only.split(",") if only else None
    )
    print(
        json.dumps(
            {
                "metric": "scale_curve",
                "scales": scales,
                "runs": runs,
                "ops": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
