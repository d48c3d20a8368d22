"""Hybrid-retrieval serving curve: per-query wall-time of the brute
vector channel vs the persisted-IVF vector channel as the corpus grows
1x -> 30x (documents AND embeddings together).

The round-10 claim (operators/bm25.py hybrid_index_topk): with
``vec_index_path`` set, BOTH channels of a hybrid query read pruned
index partitions — the lexical channel its terms' bucket dirs, the
vector channel its probed cells — so per-query cost stops growing with
the corpus.  The brute shape (embeddings frame, the r9 default) scans
every vector per query; its curve should grow ~linearly while the
all-index curve stays ~flat.

The IVF cell count scales with the corpus (n // 500, the semdedup
auto-k discipline) so probed-cell population — the bytes a query
actually reads — is held ~constant; that is exactly the knob a 100 TB
deployment turns.

Usage: python tools/hybrid_curve.py   (solo; SCALE.md protocol).
Prints one JSON line; the measured table is recorded in SCALE.md.
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

    from feast_spark.operators.bm25 import build_bm25_index, hybrid_index_topk
    from feast_spark.operators.pq_index import build_ivfpq_index
    from feast_spark.operators.similarity import build_ivf_index
    from feast_spark.sources.testdata import load_table
    from tools.scale_curve import generate

    scales = [
        float(s)
        for s in os.environ.get("SPARK_GRAFT_SCALES", "1,3,10,30").split(",")
    ]
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    root = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata",
        ),
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("feast_spark-hybrid-curve")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    terms = ["hash", "scan", "filter"]
    for s in scales:
        sf_dir = generate(root, s)
        docs = load_table(spark, sf_dir, "documents")
        emb = load_table(spark, sf_dir, "embeddings")
        n_vecs = emb.count()
        dim = len(emb.select("embedding").first()[0])
        qvec = [float((i * 37) % 19) / 19.0 for i in range(dim)]
        base = tempfile.mkdtemp(prefix=f"hybrid_curve_x{s:g}_")
        bm25_path = base + "/bm25"
        ivf_path = base + "/ivf"
        # setup, untimed: both indexes built once — that is the point
        build_bm25_index(docs, bm25_path, "doc_id", "text", n_term_buckets=64)
        n_cells = max(16, n_vecs // 500)
        build_ivf_index(emb, ivf_path, n_centroids=n_cells, iters=2)

        def time_shape(fn):
            fn().count()  # untimed warmup
            samples = []
            for _ in range(runs):
                t0 = time.monotonic()
                fn().count()
                samples.append(time.monotonic() - t0)
            return round(statistics.median(samples), 3)

        results[f"x{s:g}_brute"] = time_shape(
            lambda: hybrid_index_topk(
                spark, bm25_path, emb, terms, qvec, k=10
            )
        )
        results[f"x{s:g}_index"] = time_shape(
            lambda: hybrid_index_topk(
                spark, bm25_path, None, terms, qvec, k=10,
                vec_index_path=ivf_path, n_probe=8,
            )
        )
        # the memory-bound stack: probed cells hold M-byte PQ codes,
        # not d*4-byte float vectors — the read-volume tail claim
        ivfpq_path = base + "/ivfpq"
        build_ivfpq_index(emb, ivfpq_path, n_centroids=n_cells, iters=2)
        results[f"x{s:g}_ivfpq"] = time_shape(
            lambda: hybrid_index_topk(
                spark, bm25_path, None, terms, qvec, k=10,
                vec_index_path=ivfpq_path, n_probe=8,
                vec_index_kind="ivfpq",
            )
        )
        results[f"x{s:g}_cells"] = n_cells
    print(
        json.dumps(
            {
                "metric": "hybrid_serving_curve",
                "base_vecs": 2000,
                "scales": scales,
                "runs": runs,
                "seconds": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
