"""Measure the r16 contaminated_spans rewrite: semi-join the train
shingle stream against the broadcast eval shingles BEFORE the
max_shingle_freq aggregate (hit-bounded, train-shuffle-free) vs the
pre-r16 shape (frequency over EVERY train shingle first).

Both variants run on the sf0.1 documents table with the gate's
train/eval split (train = doc_id % 3 != 0, eval = the rest, n=5
hashed shingles, cap=1000), outputs asserted identical, min-of-N warm
timings printed as one JSON line.  The numbers are recorded in
SCALE.md.  Run SOLO — ambient Spark contention fakes regressions.

Usage:
    python tools/spans_bench.py [SF_DIR]
    SPARK_GRAFT_SPANS_RUNS=3 python tools/spans_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from feast_spark.operators.contamination import contaminated_spans  # noqa: E402
from feast_spark.operators.docdedup import with_hashed_shingles  # noqa: E402


def old_contaminated_spans(train_df, eval_df, n, cap):
    """The pre-r16 shape: shingle frequency over the FULL train corpus
    before the eval probe (kept here only as the measurement baseline;
    the operator itself no longer does this)."""
    ev = (
        with_hashed_shingles(
            eval_df.select(F.col("doc_id").alias("eval_id"), "text"),
            "text", n,
        ).select("eval_id", F.explode("shingles").alias("__sh"))
    )
    tr = (
        with_hashed_shingles(
            train_df.select(F.col("doc_id").alias("train_id"), "text"),
            "text", n,
        ).select("train_id", F.explode("shingles").alias("__sh"))
    )
    freq = tr.groupBy("__sh").agg(F.count(F.lit(1)).alias("__freq"))
    tr = tr.join(freq.filter(F.col("__freq") <= cap), "__sh").drop("__freq")
    return (
        tr.join(F.broadcast(ev), "__sh")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(os.environ.get("SPARK_GRAFT_SPANS_RUNS", "3"))
    n, cap = 5, 1000
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from feast_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    ev = docs.filter(F.col("doc_id") % 3 == 0)

    def run_new():
        return contaminated_spans(
            train, ev, "doc_id", "doc_id", "text", n=n,
            max_shingle_freq=cap,
        )

    def run_old():
        return old_contaminated_spans(train, ev, n, cap)

    # identity first (one warm pass each): same pairs, same counts
    got_new = {(r[0], r[1]): r[2] for r in run_new().collect()}
    got_old = {(r[0], r[1]): r[2] for r in run_old().collect()}
    assert got_new == got_old, (
        f"rewrite changed results: {len(got_new)} vs {len(got_old)} pairs"
    )

    def best(fn):
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn().count()
            times.append(time.monotonic() - t0)
        return round(min(times), 3)

    out = {
        "sf_dir": sf_dir,
        "pairs": len(got_new),
        "runs": runs,
        "new_semi_join_s": best(run_new),
        "old_full_freq_s": best(run_old),
    }
    out["speedup"] = round(out["old_full_freq_s"] / out["new_semi_join_s"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
