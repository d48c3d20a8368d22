"""Dump `.explain("formatted")` for named queries into a directory —
the per-round plan evidence (`plans/r16/<query>_{before,after}.txt`).

Usage:
  python tools/dump_round_plans.py OUT_DIR SUFFIX q1,q2,...   [REPO_DIR]

REPO_DIR (default: this file's parent's parent) is prepended to
sys.path, so the same script can dump plans from a `git worktree` of an
older commit (the "before" side).
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = [q.strip() for q in sys.argv[3].split(",") if q.strip()]
    repo = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump_round_plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import importlib

    entry = importlib.import_module("__spark_entry__")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    queries = dict(entry.queries())
    # bench-only slots (bench.py's name -> entry function)
    for extra, attr in (
        ("minhash_lsh_fast", "q_minhash_fast"),
        ("bm25_topk", "q_bm25_topk"),
        ("latest_per_key", "q_latest_per_key"),
    ):
        fn = getattr(entry, attr, None)
        if fn is not None:
            queries.setdefault(extra, fn)
    queries.setdefault("pit_join", entry.q_pit_join)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"skip {name}: unknown query")
            continue
        df = fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
