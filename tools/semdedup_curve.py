"""Incremental-semantic-dedup curve: semdedup_against_index wall-time
for a FIXED-size new vector slice as the indexed corpus grows
1x -> 30x, vs the full recompute it replaces.

The operator's promise (operators/semdedup.py) is O(new vectors +
touched-cell corpus vectors) per slice.  With the quantizer frozen at
index-build time the touched-cell population grows with the corpus
(cells fatten as vectors accumulate under fixed k) — the honest
caveat: stay flat by rebuilding with auto-scaled k when cells exceed
target_cluster_size (ivf_index_stats is the signal).  The full
recompute (semantic_dedup_pairs over corpus ∪ new with auto-k)
re-assigns EVERY corpus vector every run; the incremental path reads
only touched cells, never re-embeds, and skips corpus-vs-corpus pairs.

Usage: python tools/semdedup_curve.py   (solo — never run two Spark
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

NEW_VECS = 500  # held constant across scales: "this week's embeddings"
THRESHOLD = 0.3


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from feast_spark.operators.semdedup import (
        semantic_dedup_pairs,
        semdedup_against_index,
    )
    from feast_spark.operators.similarity import build_ivf_index
    from feast_spark.sources.testdata import load_table
    from tools.scale_curve import generate

    scales = [
        float(s)
        for s in os.environ.get("SPARK_GRAFT_SCALES", "1,3,10,30").split(",")
    ]
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
    # which columns to time: at x100 the full recompute re-clusters a
    # 500k-vector corpus (many minutes) — the incremental column can be
    # extended alone once the recompute trend is established
    ops = [
        t.strip()
        for t in os.environ.get(
            "SPARK_GRAFT_OPS", "incremental,full_recompute"
        ).split(",")
        if t.strip()
    ]
    unknown = set(ops) - {"incremental", "full_recompute"}
    if unknown or not ops:
        # a typo'd label would silently time NOTHING after paying the
        # full corpus-generation + index-build cost at every scale
        raise SystemExit(
            f"SPARK_GRAFT_OPS must name incremental/full_recompute, "
            f"got {sorted(unknown) or ops}"
        )
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
        .appName("feast_spark-semdedup-curve")
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
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        new = emb.filter(F.col("vec_id") < NEW_VECS)
        corpus = emb.filter(F.col("vec_id") >= NEW_VECS)
        # index k auto-scales with the corpus at BUILD time (the
        # rebuild-when-cells-fatten discipline); build untimed
        n = corpus.count()
        k = max(8, n // 1024)
        idx = tempfile.mkdtemp(prefix=f"semdd_x{s:g}_") + "/idx"
        build_ivf_index(corpus, idx, n_centroids=k, iters=2)
        if "incremental" in ops:  # warmup only for a column we time
            semdedup_against_index(
                spark, idx, new, threshold=THRESHOLD
            ).count()
        for label, fn in (
            (
                "incremental",
                lambda: semdedup_against_index(
                    spark, idx, new, threshold=THRESHOLD
                ),
            ),
            (
                "full_recompute",
                lambda: semantic_dedup_pairs(emb, threshold=THRESHOLD),
            ),
        ):
            if label not in ops:
                continue
            samples = []
            for _ in range(runs):
                t0 = time.monotonic()
                cnt = fn().count()
                samples.append(time.monotonic() - t0)
            results[label][f"x{s:g}"] = round(statistics.median(samples), 3)
            if label == "incremental":
                pair_counts[f"x{s:g}"] = cnt
    print(
        json.dumps(
            {
                "metric": "semdedup_curve",
                "new_vecs": NEW_VECS,
                "threshold": THRESHOLD,
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
