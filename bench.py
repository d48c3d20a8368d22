"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("feast_spark-bench")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    # Headline subset: the core temporal operators + the heaviest
    # training-data ops. Everything else still runs under selfcheck.
    headline = [
        name
        for name in (
            "pit_join",
            "pit_join_multiview",
            "latest_per_key",
            "rollup_pit_join",
            "window_agg_hourly",
            "sessionize",
            "pricing_summary",
            "dedup_exact",
            "corpus_clean",
            "minhash_lsh_dedup",
            "ann_topk_cosine",
            "text_quality",
        )
        if name in queries
    ]

    # Warm the JVM / codegen / file-listing paths once so the first
    # headline query isn't charged session startup.
    from feast_spark.sources.testdata import load_table

    load_table(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    for name in headline:
        fn = queries[name]
        # warm nothing: cold per query, like the driver
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        _ = n

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
