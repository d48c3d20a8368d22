"""Measure what a versioned dataset commit costs OVER the plain
parquet write a pipeline already pays (datasets.commit_dataset vs
df.write.parquet of the same rows): the SCALE.md claim is "one extra
JSON flip", so the two should be within noise of each other.

Usage: python tools/dataset_commit_bench.py [sf_dir] [runs]
Solo, like every timing harness in tools/ — never run concurrently
with another Spark workload.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dataset-commit-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from feast_spark.datasets import commit_dataset
    from feast_spark.sources.testdata import load_table

    df = load_table(spark, sf_dir, "events")
    n = df.count()  # warm the scan + JVM

    base = tempfile.mkdtemp(prefix="dsbench_")
    plain, versioned = [], []
    for i in range(runs):
        p = f"{base}/plain_{i}"
        t0 = time.monotonic()
        df.write.parquet(p)
        plain.append(time.monotonic() - t0)
        shutil.rmtree(p)

        r = f"{base}/versioned_{i}"
        t0 = time.monotonic()
        commit_dataset(df, r)
        versioned.append(time.monotonic() - t0)
        shutil.rmtree(r)

    pm, vm = statistics.median(plain), statistics.median(versioned)
    print(
        f"rows={n} runs={runs}\n"
        f"plain df.write.parquet   median {pm:.3f}s "
        f"min {min(plain):.3f}s all {[round(s, 3) for s in plain]}\n"
        f"datasets.commit_dataset  median {vm:.3f}s "
        f"min {min(versioned):.3f}s all {[round(s, 3) for s in versioned]}\n"
        f"overhead: {vm - pm:+.3f}s median ({(vm / pm - 1) * 100:+.1f}%)"
    )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
