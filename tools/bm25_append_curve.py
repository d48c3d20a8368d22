"""BM25-index append curve: bm25_index_append wall-time for a
FIXED-size new slice as the indexed corpus grows 1x -> 30x.

The operator's promise (operators/bm25.py) is that folding this week's
crawl into the lexical index costs O(new docs) — one tokenize/aggregate
pass over the slice plus an O(1) manifest flip, ~FLAT in corpus size —
while the rebuild it replaces (build_bm25_index over corpus ∪ new)
re-tokenizes everything and grows with it.  bm25_index_compact is
timed too: it rewrites index ROWS (postings), so it grows with index
size but never re-tokenizes text.

Usage: python tools/bm25_append_curve.py   (solo — never run two Spark
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

NEW_DOCS = 500  # held constant across scales: "this week's crawl"


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from feast_spark.operators.bm25 import (
        bm25_index_append,
        bm25_index_compact,
        bm25_index_vacuum,
        build_bm25_index,
    )
    from feast_spark.sources.testdata import load_table
    from tools.scale_curve import generate

    scales = [
        float(s)
        for s in os.environ.get("SPARK_GRAFT_SCALES", "1,3,10,30").split(",")
    ]
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
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
        .appName("feast_spark-bm25-append-curve")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {"append": {}, "rebuild": {}, "compact": {}}
    for s in scales:
        sf_dir = generate(root, s)
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        new = docs.filter(F.col("doc_id") < NEW_DOCS)
        corpus = docs.filter(F.col("doc_id") >= NEW_DOCS)
        base = tempfile.mkdtemp(prefix=f"bm25app_x{s:g}_")
        # warm the append path on a DISJOINT throwaway index so no
        # measured index ever violates the doc-id uniqueness contract
        warm = f"{base}/warm"
        build_bm25_index(corpus.limit(200), warm, "doc_id", "text")
        bm25_index_append(spark, warm, new.limit(50))
        samples: dict[str, list[float]] = {k: [] for k in results}
        for r in range(runs):
            # fresh base index per run: each timed append folds the
            # slice into a contract-clean corpus-only index
            run_idx = f"{base}/idx{r}"
            build_bm25_index(corpus, run_idx, "doc_id", "text")
            t0 = time.monotonic()
            bm25_index_append(spark, run_idx, new)
            samples["append"].append(time.monotonic() - t0)

            t0 = time.monotonic()
            bm25_index_compact(spark, run_idx)
            samples["compact"].append(time.monotonic() - t0)
            bm25_index_vacuum(run_idx)

            reb = f"{base}/reb{r}"
            t0 = time.monotonic()
            build_bm25_index(docs, reb, "doc_id", "text")
            samples["rebuild"].append(time.monotonic() - t0)
        for k in results:
            results[k][f"x{s:g}"] = round(statistics.median(samples[k]), 3)
    print(
        json.dumps(
            {
                "metric": "bm25_append_curve",
                "new_docs": NEW_DOCS,
                "scales": scales,
                "runs": runs,
                "ops": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
