"""Incremental-dedup curve: dedup_against_index wall-time for a
FIXED-size new slice as the indexed corpus grows 1x -> 30x.

The operator's promise (operators/minhash_index.py) is that deduping
this week's crawl against the corpus costs O(new docs + touched
buckets) — i.e. ~FLAT in corpus size — while the full recompute it
replaces (minhash_dedup_pairs over corpus ∪ new) re-signs the whole
corpus and grows with it.  This harness measures both on the same
scale_curve corpora (shape-constant growth; the new slice is the same
500 docs at every scale), index build untimed — paying the corpus
signing pass once at append time instead of every dedup IS the
operator.

Usage: python tools/incdedup_curve.py   (solo — never run two Spark
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

    from feast_spark.operators.docdedup import minhash_dedup_pairs
    from feast_spark.operators.minhash_index import (
        build_minhash_index,
        dedup_against_index,
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
        .appName("feast_spark-incdedup-curve")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {"incremental": {}, "full_recompute": {}}
    pair_counts: dict[str, int] = {}
    for s in scales:
        sf_dir = generate(root, s)
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        new = docs.filter(F.col("doc_id") < NEW_DOCS)
        corpus = docs.filter(F.col("doc_id") >= NEW_DOCS)
        idx = tempfile.mkdtemp(prefix=f"incdedup_x{s:g}_") + "/idx"
        build_minhash_index(corpus, idx, "doc_id", "text")  # untimed
        dedup_against_index(spark, idx, new).count()  # untimed warmup
        for label, fn in (
            ("incremental", lambda: dedup_against_index(spark, idx, new)),
            (
                "full_recompute",
                lambda: minhash_dedup_pairs(docs, "doc_id", "text"),
            ),
        ):
            samples = []
            for _ in range(runs):
                t0 = time.monotonic()
                n = fn().count()
                samples.append(time.monotonic() - t0)
            results[label][f"x{s:g}"] = round(statistics.median(samples), 3)
            if label == "incremental":
                pair_counts[f"x{s:g}"] = n
    print(
        json.dumps(
            {
                "metric": "incdedup_curve",
                "new_docs": NEW_DOCS,
                "scales": scales,
                "runs": runs,
                "ops": results,
                "incremental_pairs": pair_counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
