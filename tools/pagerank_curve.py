"""PageRank iteration-cost curve: fixed 5-iteration wall-time as the
edge table grows 1x -> 30x, on a synthetic Zipf-skewed link graph
(hub-heavy in-degree, the web's shape).

The operator's claim (operators/graph.py) is per-iteration cost
O(edges) — one edges-vs-ranks equi-join plus a map-side-combined sum
on dst — with hot in-degree keys absorbed by partial aggregation.
A superlinear fit here would falsify that.

Graph: n_edges = 100k * scale over n_nodes = n_edges / 10; dst is
Zipf-ish (md5-hash powered down so low ids are hot hubs), src uniform.
Deterministic via md5 on the edge index — same graph every run.

Usage: python tools/pagerank_curve.py   (solo; SCALE.md protocol).
Prints one JSON line; the measured table is recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_EDGES = 100_000
ITERS = 5


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from feast_spark.operators.graph import pagerank

    scales = [
        float(s)
        for s in os.environ.get("SPARK_GRAFT_SCALES", "1,3,10,30").split(",")
    ]
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("feast_spark-pagerank-curve")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}
    for s in scales:
        n_edges = int(BASE_EDGES * s)
        n_nodes = max(1000, n_edges // 10)
        h = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        edges = (
            spark.range(n_edges)
            .select(
                F.pmod(h.cast("long"), F.lit(n_nodes)).alias("src"),
                # zipf-ish hub skew: square the uniform hash fraction so
                # small dst ids absorb disproportionate in-degree
                (
                    F.pow(
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(F.concat(F.lit("d"), F.col("id"))),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(1_000_000),
                        )
                        / 1_000_000.0,
                        2.0,
                    )
                    * n_nodes
                )
                .cast("long")
                .alias("dst"),
            )
            .localCheckpoint(eager=True)
        )
        pagerank(edges, max_iter=1, tol=None).count()  # untimed warmup
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            pagerank(edges, max_iter=ITERS, tol=None).count()
            samples.append(time.monotonic() - t0)
        results[f"x{s:g}"] = round(statistics.median(samples), 3)
        # prepartitioned variant: one setup shuffle, then every
        # iteration's edge join reuses the cached src partitioning
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            pagerank(
                edges, max_iter=ITERS, tol=None, prepartition=True
            ).count()
            samples.append(time.monotonic() - t0)
        results[f"x{s:g}_pre"] = round(statistics.median(samples), 3)
    print(
        json.dumps(
            {
                "metric": "pagerank_curve",
                "base_edges": BASE_EDGES,
                "iters": ITERS,
                "scales": scales,
                "runs": runs,
                "seconds": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
