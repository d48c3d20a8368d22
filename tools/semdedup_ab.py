"""Solo A/B harness for the `semantic_dedup` bench slot (SCALE.md
measurement protocol: solo session, untimed warmup, median of N).

Replicates bench.py's slot exactly — quantizer trained once untimed,
each timed run re-executes assign + pair + verify + resolve at
threshold 0.99 over the sf embeddings table — but in a MINIMAL session
(no index builds, no other slots), so it separates code cost from the
bench session's shape.  Run it at two checkouts to A/B code versions
(the protocol that closed the r9 dup_groups_resolved spike); run it at
one checkout to place today's host in the noise band.

Usage: python tools/semdedup_ab.py          (solo — never concurrent
with another Spark job when timing).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("semdedup-ab")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from feast_spark.operators.semdedup import semantic_dedup
    from feast_spark.operators.similarity import ivf_train_centroids
    from feast_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train_centroids(
        emb, "vec_id", "embedding", n_centroids=16, iters=2
    )

    def run() -> float:
        t0 = time.monotonic()
        semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.99, centroids=cents
        ).count()
        return time.monotonic() - t0

    run()  # untimed warmup (codegen + file listing)
    samples = [run() for _ in range(runs)]
    print(
        json.dumps(
            {
                "slot": "semantic_dedup",
                "sf_dir": sf_dir,
                "samples": [round(s, 3) for s in samples],
                "median": round(statistics.median(samples), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
