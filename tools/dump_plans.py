"""Regenerate PLANS.md: `.explain("formatted")` for the headline
queries at sf0.01 — the physical-plan record backing SCALE.md's claims
(single Exchange, PushedFilters, TakeOrderedAndProject, broadcast
dims, no Python in hot paths).

Usage: python tools/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

HEADLINE = [
    "pit_join",
    "pit_join_multiview",
    "latest_per_key",
    "rollup_pit_join",
    "window_agg_hourly",
    "sessionize",
    "pricing_summary",
    "shipping_priority",
    "topk_revenue",
    "rollup_revenue",
    "dedup_exact",
    "corpus_clean",
    "minhash_lsh_dedup",
    "ann_topk_cosine",
    "attribution_join",
    "table_profile",
    "ngram_contamination",
    "pack_sequences",
    "corpus_mix",
    "weighted_sample",
    "ts_topk_similar",
    "corpus_pipeline",
    "doc_chunks",
    "pii_scrub",
    "repetition_stats",
    "sketch_rollup",
    "decayed_agg",
    "bm25_topk",
    # round-9 gated additions (bm25_index_topk's plan is the partition-
    # pruning evidence: PartitionFilters on the term bucket)
    "cdc_merge",
    "lag_features",
    "edit_distance_join",
    "sketch_distinct",
    "hybrid_rrf",
    "bm25_index_topk",
    "dedup_against_index",
    "retrieval_ndcg",
    "resample_grid",
    # round-10 gated additions + the all-index serving shapes
    # (hybrid_all_index's plan is the both-channels-pruned evidence:
    # PartitionFilters on the term bucket AND on the IVF cell;
    # ivfpq_index_topk's scan reads code bytes from probed cells only)
    "pagerank",
    "drift_psi",
    "hybrid_all_index",
    "ivfpq_index_topk",
    # round-11 gated addition (hybrid_rrf rotated out but kept via
    # re-registration below; the gated hybrid_index_topk's plan is the
    # hybrid_all_index entry; the gated ivfpq_index_topk's plan is the
    # entry above)
    "semdedup",
    # round-12 gated addition (bm25_topk rotated out but kept via
    # re-registration below; substr_dedup's plan is the no-Python
    # winnowing evidence: fingerprint selection inside codegen, one
    # fp-keyed exchange)
    "substr_dedup",
    # round-13 gated addition (latest_per_key rotated out but kept via
    # re-registration below; dsir_resample's plan is the two-linear-
    # passes evidence: histogram aggregates map-side combined, the
    # n_buckets-row log-ratio table broadcast, selection a
    # TakeOrderedAndProject — never a full sort)
    "dsir_resample",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(entry_mod.queries())

    def _contamination(spark, sf):
        from pyspark.sql import functions as F

        from feast_spark.functions.split import hash_split
        from feast_spark.operators.contamination import ngram_contamination
        from feast_spark.sources.testdata import load_table

        docs = hash_split(
            load_table(spark, sf, "documents"),
            "doc_id",
            {"train": 0.5, "eval": 0.5},
        )
        return ngram_contamination(
            docs.filter(F.col("split") == "train"),
            docs.filter(F.col("split") == "eval"),
            "doc_id",
            "text",
            n=5,
        )

    queries["ngram_contamination"] = _contamination

    def _ts_topk(spark, sf):
        from feast_spark.operators.timeseries import ts_topk_similar
        from feast_spark.sources.testdata import load_table

        ev = load_table(spark, sf, "events")
        return ts_topk_similar(
            ev, "user_id", "ts", "value",
            [1.0, 2.0, 4.0, 8.0, 4.0, 2.0, 1.0, 0.0],
            k=10, tiebreak_col="event_id",
        )

    queries["ts_topk_similar"] = _ts_topk

    def _sketch_rollup(spark, sf):
        from pyspark.sql import functions as F

        from feast_spark.operators.sketches import (
            build_distinct_sketches, estimate_distinct,
        )
        from feast_spark.sources.testdata import load_table

        ev = load_table(spark, sf, "events").withColumn(
            "day", F.to_date("ts")
        )
        sk = build_distinct_sketches(ev, "user_id", ["day", "event_type"])
        return estimate_distinct(sk, group_cols=["event_type"])

    queries["sketch_rollup"] = _sketch_rollup

    def _decayed(spark, sf):
        from datetime import timedelta

        from feast_spark.operators.timeseries import decayed_agg
        from feast_spark.sources.testdata import load_table

        ev = load_table(spark, sf, "events")
        return decayed_agg(
            ev, ["user_id"], "ts", "value",
            half_life=timedelta(days=7), at_time="2024-01-20 00:00:00",
        )

    queries["decayed_agg"] = _decayed
    # rotated out of the gate in r9/r10/r11 but kept in PLANS for
    # continuity
    queries["topk_revenue"] = entry_mod.q_topk_revenue
    queries["rollup_revenue"] = entry_mod.q_rollup_revenue
    queries["hybrid_rrf"] = entry_mod.q_hybrid_rrf
    queries["bm25_topk"] = entry_mod.q_bm25_topk
    queries["latest_per_key"] = entry_mod.q_latest_per_key  # rotated r13
    queries["embed_near_dup"] = entry_mod.q_embed_near_dup  # rotated r15
    # the gate slot runs the r15 dataset-lifecycle variant; PLANS keeps
    # dumping the plain PIT join the bench headline times
    queries["pit_join"] = entry_mod.q_pit_join

    def _dedup_against_index(spark, sf):
        import tempfile

        from pyspark.sql import functions as F

        from feast_spark.operators.minhash_index import (
            build_minhash_index, dedup_against_index,
        )
        from feast_spark.sources.testdata import load_table

        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        path = tempfile.mkdtemp(prefix="plans_mhidx_") + "/idx"
        build_minhash_index(
            docs.filter(F.col("doc_id") % 3 != 0), path, "doc_id", "text"
        )
        return dedup_against_index(
            spark, path, docs.filter(F.col("doc_id") % 3 == 0), threshold=0.5
        )

    queries["dedup_against_index"] = _dedup_against_index

    def _hybrid_all_index(spark, sf):
        import tempfile

        from feast_spark.operators.bm25 import (
            build_bm25_index, hybrid_index_topk,
        )
        from feast_spark.operators.similarity import build_ivf_index
        from feast_spark.sources.testdata import load_table

        docs = load_table(spark, sf, "documents")
        emb = load_table(spark, sf, "embeddings")
        base = tempfile.mkdtemp(prefix="plans_hybrid_")
        build_bm25_index(docs, base + "/bm25", "doc_id", "text",
                         n_term_buckets=16)
        build_ivf_index(emb, base + "/ivf", n_centroids=8, iters=2)
        dim = len(emb.select("embedding").first()[0])
        qvec = [float((i * 37) % 19) / 19.0 for i in range(dim)]
        return hybrid_index_topk(
            spark, base + "/bm25", None, ["hash", "scan"], qvec, k=10,
            vec_index_path=base + "/ivf", n_probe=3,
        )

    queries["hybrid_all_index"] = _hybrid_all_index

    def _ivfpq_index_topk(spark, sf):
        import tempfile

        from feast_spark.operators.pq_index import (
            build_ivfpq_index, ivfpq_index_topk,
        )
        from feast_spark.sources.testdata import load_table

        emb = load_table(spark, sf, "embeddings")
        path = tempfile.mkdtemp(prefix="plans_ivfpq_") + "/idx"
        build_ivfpq_index(emb, path, n_centroids=8, iters=2)
        return ivfpq_index_topk(
            spark, path, emb.filter("vec_id < 3"), k=5, n_probe=3
        )

    queries["ivfpq_index_topk"] = _ivfpq_index_topk
    out = [
        "# PLANS — formatted physical plans for the headline queries",
        "",
        f"Generated by `python tools/dump_plans.py` at `{sf_dir}`.",
        "Read together with SCALE.md: each plan shows the shuffle count,",
        "pushed filters, broadcast choices, and codegen spans the design",
        "relies on. Regenerate after changing any operator.",
        "",
    ]
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}\n\n```\n{plan.rstrip()}\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
