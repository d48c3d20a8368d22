"""Per-query build/plan/exec split: how much of each bench slot's wall
time is Python DSL construction + Catalyst analysis (build), physical
planning (plan), and actual execution (exec).

Motivation (r16 optimization round): q_minhash_fast measured ~1.7 s
build vs ~1.0 s exec at sf0.1 — the DSL/analysis cost IS the query for
many sub-3s slots, and it recurs per call in bench.py (cold DataFrame
per run, like the driver).

Usage: SPARK_GRAFT_SF_DIR=... python tools/buildsplit_bench.py [q1,q2,...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    only = set()
    if len(sys.argv) > 1:
        only = {q.strip() for q in sys.argv[1].split(",") if q.strip()}
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("buildsplit")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from feast_spark.sources.testdata import load_table

    load_table(spark, sf_dir, "events").count()
    load_table(spark, sf_dir, "documents").count()

    queries = dict(entry_mod.queries())
    queries["minhash_lsh_fast"] = entry_mod.q_minhash_fast
    queries["bm25_topk"] = entry_mod.q_bm25_topk
    queries["latest_per_key"] = entry_mod.q_latest_per_key
    queries["pit_join"] = entry_mod.q_pit_join

    names = [n for n in queries if not only or n in only]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    print(f"{'query':30s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in names:
        fn = queries[name]
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t1 = time.monotonic()
            _ = df._jdf.queryExecution().executedPlan()
            t2 = time.monotonic()
            df.count()
            t3 = time.monotonic()
            row = (t1 - t0, t2 - t1, t3 - t2, t3 - t0)
            if best is None or row[3] < best[3]:
                best = row
        print(
            f"{name:30s} {best[0]:7.3f} {best[1]:7.3f} "
            f"{best[2]:7.3f} {best[3]:7.3f}"
        )


if __name__ == "__main__":
    main()
