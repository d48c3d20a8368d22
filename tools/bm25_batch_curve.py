"""Batch-retrieval curve: bm25_topk_batch wall-time vs QUERY COUNT at a
fixed corpus (the scale axis tools/scale_curve.py does not cover).

The batch operator's promise is one corpus pass per call regardless of
batch size — time should grow far slower than linearly in the query
count (the growth that remains is the widening term set: more distinct
terms survive the postings semi-join).  The persisted-index variant
(bm25_index_topk_batch) additionally replaces the corpus pass with a
partition-pruned postings read, so its absolute time stays near-flat.

Usage: python tools/bm25_batch_curve.py   (solo — never run two Spark
jobs concurrently when timing; see SCALE.md protocol).  Prints one
JSON line; the measured table is recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "join", "table", "row", "shuffle",
    "merge", "stream", "state", "cache", "disk", "plan", "stage", "task",
]


def queries_df(spark, n: int):
    """n deterministic 3-term queries over the corpus vocabulary."""
    rows = [
        (i, [VOCAB[(i * 7 + j * 13) % len(VOCAB)] for j in range(3)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "query_id INT, terms ARRAY<STRING>")


def main() -> None:
    from pyspark.sql import SparkSession

    from feast_spark.operators.bm25 import (
        bm25_index_topk_batch,
        bm25_topk_batch,
        build_bm25_index,
    )
    from feast_spark.sources.testdata import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    counts = [
        int(c)
        for c in os.environ.get("SPARK_GRAFT_QCOUNTS", "4,16,64,256").split(",")
    ]
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("feast_spark-bm25-batch-curve")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    idx = tempfile.mkdtemp(prefix="bm25_curve_") + "/idx"
    build_bm25_index(docs, idx, "doc_id", "text", n_term_buckets=64)

    results: dict[str, dict] = {"inline_batch": {}, "index_batch": {}}
    # untimed warmups absorb JVM/codegen startup
    bm25_topk_batch(docs, queries_df(spark, counts[0]), k=10).count()
    bm25_index_topk_batch(spark, idx, queries_df(spark, counts[0]), k=10).count()
    for n in counts:
        qs = queries_df(spark, n)
        for label, fn in (
            ("inline_batch", lambda: bm25_topk_batch(docs, qs, k=10)),
            ("index_batch", lambda: bm25_index_topk_batch(spark, idx, qs, k=10)),
        ):
            samples = []
            for _ in range(runs):
                t0 = time.monotonic()
                fn().count()
                samples.append(time.monotonic() - t0)
            results[label][f"q{n}"] = round(statistics.median(samples), 3)
    print(
        json.dumps(
            {
                "metric": "bm25_batch_curve",
                "sf_dir": sf_dir,
                "counts": counts,
                "runs": runs,
                "ops": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
