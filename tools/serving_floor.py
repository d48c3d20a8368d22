"""Serving-floor A/B: per-query latency of the all-index serving
shapes over a SEQUENTIAL query batch, with the control-plane cache
(io/model_cache.py) on vs off.

The r10 finding (SCALE.md): the all-index hybrid query has a
~2.4-2.8 s floor at every corpus size — per-query stage scheduling
plus control-plane loads (manifest, centroids, codebooks, BM25 corpus
stats) that do not shrink with partition pruning.  The cache removes
the repeated loads; this harness measures what that buys a serving
deployment answering many queries against an unchanged index, which
is the workload the per-query floor actually taxes.

Shapes timed (each query an independent *_index_topk call, as a
serving endpoint would issue them):
- hybrid (BM25 postings + IVF cells, both pruned)
- ivfpq (probed-cell ADC)
- bm25 (postings only)

Usage: python tools/serving_floor.py   (solo — never run two Spark
jobs concurrently when timing; SCALE.md protocol).  Prints one JSON
line; the measured table is recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from feast_spark.io import model_cache
    from feast_spark.operators.bm25 import (
        bm25_index_topk,
        build_bm25_index,
        hybrid_index_topk,
    )
    from feast_spark.operators.pq_index import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )
    from feast_spark.operators.similarity import build_ivf_index
    from feast_spark.sources.testdata import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_queries = int(os.environ.get("SPARK_GRAFT_FLOOR_QUERIES", "20"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("feast_spark-serving-floor")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    base = tempfile.mkdtemp(prefix="serving_floor_")
    bm25_path, ivf_path, ivfpq_path = (
        base + "/bm25", base + "/ivf", base + "/ivfpq",
    )
    # setup, untimed: indexes built once — the serving premise
    build_bm25_index(docs, bm25_path, "doc_id", "text", n_term_buckets=64)
    build_ivf_index(emb, ivf_path, n_centroids=64, iters=2)
    build_ivfpq_index(emb, ivfpq_path, n_centroids=64, iters=2)
    terms = ["hash", "scan", "filter"]

    def qvec(i: int) -> list[float]:
        return [float((j * 37 + i) % 19) / 19.0 for j in range(dim)]

    shapes = {
        "hybrid": lambda i: hybrid_index_topk(
            spark, bm25_path, None, terms, qvec(i), k=10,
            vec_index_path=ivf_path, n_probe=8,
        ),
        "ivfpq": lambda i: ivfpq_index_topk(
            spark, ivfpq_path, emb.filter(F.col("vec_id") == i),
            n_probe=8, k=10,
        ),
        "bm25": lambda i: bm25_index_topk(
            spark, bm25_path, terms + [f"t{i}"], k=10
        ),
    }

    # the batch shape: the SAME n_queries in ONE call — the per-query
    # floor (stage scheduling + control plane) is paid once for the
    # whole batch, which is the real high-throughput serving pattern
    from feast_spark.operators.bm25 import hybrid_index_topk_batch

    batch_rows = [
        (i, terms, qvec(i)) for i in range(1, n_queries + 1)
    ]
    batch_df = spark.createDataFrame(
        batch_rows, "query_id LONG, terms ARRAY<STRING>, qvec ARRAY<DOUBLE>"
    )

    def hybrid_batch():
        return hybrid_index_topk_batch(
            spark, bm25_path, None, batch_df, k=10,
            vec_index_path=ivf_path, n_probe=8,
        )

    real_get_or_load = model_cache.get_or_load
    results: dict[str, float] = {}
    try:
        for cached in (False, True):
            model_cache.clear()
            model_cache.get_or_load = (
                real_get_or_load if cached else (lambda key, loader: loader())
            )
            tag = "cached" if cached else "uncached"
            for name, fn in shapes.items():
                fn(0).count()  # untimed warmup (codegen, Python workers)
                samples = []
                for i in range(1, n_queries + 1):
                    t0 = time.monotonic()
                    fn(i).count()
                    samples.append(time.monotonic() - t0)
                results[f"{name}_{tag}_mean"] = round(
                    sum(samples) / len(samples), 3
                )
                results[f"{name}_{tag}_median"] = round(
                    statistics.median(samples), 3
                )
            hybrid_batch().count()  # untimed warmup
            samples = []
            for _ in range(3):
                t0 = time.monotonic()
                hybrid_batch().count()
                samples.append(time.monotonic() - t0)
            med = statistics.median(samples)
            results[f"hybrid_batch{n_queries}_{tag}_median"] = round(med, 3)
            results[f"hybrid_batch{n_queries}_{tag}_per_query"] = round(
                med / n_queries, 4
            )
    finally:
        # always unpatch — an exception mid-loop must not leave the
        # module with the cache-bypassing lambda for the process
        model_cache.get_or_load = real_get_or_load
    # the historical top-level cache_stats field describes the CACHED
    # measurement loop — snapshot before later phases reset the counters
    cached_loop_stats = dict(model_cache.stats())

    # the request coalescer (serving.HybridQueryCoalescer): the SAME
    # n_queries issued as concurrent per-request .query() calls — the
    # serving-tier shape — must land near the raw batch per-query
    # floor, since it executes as one hybrid_index_topk_batch call
    import threading

    from feast_spark.serving import HybridQueryCoalescer

    errs: list[BaseException] = []

    def _call(co, i):
        try:
            co.query(terms, qvec(i))
        except BaseException as e:  # noqa: BLE001 — fail the RUN, not a thread
            errs.append(e)

    with HybridQueryCoalescer(
        spark, bm25_path, ivf_path, k=10, n_probe=8,
        max_batch=n_queries, max_wait_ms=2000.0,
    ) as co:
        co.query(terms, qvec(0))  # untimed warmup
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            threads = [
                threading.Thread(target=_call, args=(co, i))
                for i in range(1, n_queries + 1)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            samples.append(time.monotonic() - t0)
        med = statistics.median(samples)
    if errs:
        # a swallowed per-thread failure would publish a per-query
        # floor that never ran the queries
        raise errs[0]
    results[f"coalescer{n_queries}_median"] = round(med, 3)
    results[f"coalescer{n_queries}_per_query"] = round(med / n_queries, 4)

    # per-kind coalescers (r13): the same amortization for a
    # lexical-only tier (BM25QueryCoalescer -> bm25_index_topk_batch)
    # and a vector-only tier (VectorQueryCoalescer -> one
    # vector_index_topk call over the fused batch, here IVFPQ ADC)
    from feast_spark.serving import BM25QueryCoalescer, VectorQueryCoalescer

    kind_setups = {
        "bm25_coalescer": (
            BM25QueryCoalescer(
                spark, bm25_path, k=10,
                max_batch=n_queries, max_wait_ms=2000.0,
            ),
            lambda co, i: co.query(terms + [f"t{i}"]),
        ),
        "vector_coalescer": (
            VectorQueryCoalescer(
                spark, ivfpq_path, k=10, n_probe=8,
                max_batch=n_queries, max_wait_ms=2000.0,
            ),
            lambda co, i: co.query(qvec(i)),
        ),
    }
    for kname, (co, issue) in kind_setups.items():
        kerrs: list[BaseException] = []

        def _kcall(i, co=co, issue=issue, kerrs=kerrs):
            try:
                issue(co, i)
            except BaseException as e:  # noqa: BLE001 — fail the RUN
                kerrs.append(e)

        with co:
            issue(co, 0)  # untimed warmup
            samples = []
            for _ in range(3):
                t0 = time.monotonic()
                threads = [
                    threading.Thread(target=_kcall, args=(i,))
                    for i in range(1, n_queries + 1)
                ]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                samples.append(time.monotonic() - t0)
            med = statistics.median(samples)
        if kerrs:
            raise kerrs[0]
        results[f"{kname}{n_queries}_median"] = round(med, 3)
        results[f"{kname}{n_queries}_per_query"] = round(med / n_queries, 4)

    # many-index serving: cycle 3 indexes' single-query shapes to pin
    # that the control-plane cache (_MAX_ENTRIES=64 LRU) does not
    # thrash back to the uncached floor when a tier serves several
    # indexes at once (each index pins ~2-3 small entries)
    model_cache.clear()
    for name, fn in shapes.items():
        fn(0).count()  # warm each shape once (codegen + cache fill)
    samples = []
    for i in range(1, n_queries + 1):
        t0 = time.monotonic()
        for name, fn in shapes.items():
            fn(i).count()
        samples.append(time.monotonic() - t0)
    results["cycle3_median"] = round(statistics.median(samples), 3)
    results["cycle3_cache"] = dict(model_cache.stats())
    print(
        json.dumps(
            {
                "metric": "serving_floor",
                "sf_dir": sf_dir,
                "n_queries": n_queries,
                "cache_stats": cached_loop_stats,
                "seconds": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
