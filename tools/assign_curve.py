"""Nearest-centroid assignment throughput: expression tree vs the
Arrow/NumPy path (`similarity.nearest_centroid_arrow`) as the corpus
grows — the evidence behind the size-adaptive dispatch in
`assign_nearest_centroid`.

The expression form evaluates its higher-order-function legs
interpreted per row, so the corpus-wide assignment pass (semdedup,
IVF build/append, IVFPQ encode) is CPU-bound at ~10-20 us per
row-core at C=16, D=64.  The Arrow path runs the identical arithmetic
batched in NumPy.  Both are bit-identical (pinned in
tests/test_r16_optimizations.py); this tool measures the crossover.

Usage: python tools/assign_curve.py [multipliers, default 1,10,50]
"""
from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,10,50").split(",")]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("assign-curve")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from feast_spark.operators.similarity import (
        nearest_centroid,
        nearest_centroid_arrow,
    )
    from feast_spark.sources.testdata import load_table

    random.seed(11)
    cents = [[random.random() for _ in range(64)] for _ in range(16)]
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("i"), F.col("embedding").alias("v")
    )
    base_n = emb.count()
    print(f"{'rows':>10s} {'expr_s':>8s} {'arrow_s':>8s} {'speedup':>8s}")
    for m in mults:
        big = (
            emb.crossJoin(spark.range(m).withColumnRenamed("id", "__r"))
            .select("i", "v")
            .repartition(int(cpus))
            .persist()
        )
        n = big.count()
        times = {}
        for label, builder in (
            ("expr", nearest_centroid),
            ("arrow", nearest_centroid_arrow),
        ):
            best = float("inf")
            for _ in range(3):
                t0 = time.monotonic()
                big.withColumn("c", builder("v", cents)).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            times[label] = best
        big.unpersist()
        print(
            f"{n:10d} {times['expr']:8.2f} {times['arrow']:8.2f} "
            f"{times['expr'] / times['arrow']:8.1f}x"
        )


if __name__ == "__main__":
    main()
