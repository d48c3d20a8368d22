"""Measure datasets.diff_dataset at bench scale: commit the documents
table twice (v2 = ~1% rows removed, ~1% perturbed, a small appended
slice) and time the keyed + unkeyed diffs.

Usage: python tools/diff_bench.py [sf_dir] [runs] [table] [id_col] [mut_col]
(default `documents doc_id text`; pass `events event_id value` for the
larger frame — mut_col is the non-key column perturbed to create the
"changed" bucket)

Solo-host discipline applies (SCALE.md): never run while another Spark
workload is active.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    table = sys.argv[3] if len(sys.argv) > 3 else "documents"
    id_col = sys.argv[4] if len(sys.argv) > 4 else "doc_id"
    mut_col = sys.argv[5] if len(sys.argv) > 5 else "text"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("diff-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from feast_spark.datasets import commit_dataset, diff_dataset
    from feast_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, table)
    n = docs.count()
    v2 = (
        docs.filter(F.col(id_col) % 100 != 7)  # ~1% removed
        .withColumn(
            mut_col,
            F.when(
                F.col(id_col) % 100 == 11,  # ~1% changed content
                F.concat(F.col(mut_col).cast("string"), F.lit("x"))
                .cast(docs.schema[mut_col].dataType)
                if docs.schema[mut_col].dataType.typeName() == "string"
                else F.col(mut_col) + F.lit(1),
            ).otherwise(F.col(mut_col)),
        )
        .unionByName(
            docs.filter(F.col(id_col) % 100 == 3).withColumn(
                id_col, F.col(id_col) + 10_000_000  # ~1% added
            )
        )
    )
    base = os.path.join(tempfile.gettempdir(), "diff_bench_ds")
    shutil.rmtree(base, ignore_errors=True)
    root = base + "/ds"
    commit_dataset(docs, root)
    commit_dataset(v2, root)

    for label, kwargs in (
        ("unkeyed", {}),
        ("keyed", {"key_cols": [id_col]}),
    ):
        samples, out = [], None
        for _ in range(runs):
            t0 = time.monotonic()
            out = diff_dataset(spark, root, 1, 2, **kwargs)
            samples.append(time.monotonic() - t0)
        print(
            f"{label}: rows={n} median={statistics.median(samples):.3f}s "
            f"min={min(samples):.3f}s counts="
            + str({k: v for k, v in out.items() if not k.startswith('sample_')})
        )
    spark.stop()


if __name__ == "__main__":
    main()
