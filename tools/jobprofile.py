"""Per-query job-level profile: run a bench slot, list every Spark job
(duration, description) via the app status store, print totals.

Usage: python /tmp/jobprofile.py <slot> [<slot> ...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("jobprofile")
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

# Build the same extra slots bench.py has, minimally.
import tempfile
from pyspark.sql import functions as F

queries = dict(entry_mod.queries())
queries["minhash_lsh_fast"] = entry_mod.q_minhash_fast
queries["bm25_topk"] = entry_mod.q_bm25_topk
queries["latest_per_key"] = entry_mod.q_latest_per_key
queries["pit_join"] = entry_mod.q_pit_join

want = set(sys.argv[1:])

if want & {"semantic_dedup"}:
    from feast_spark.operators.similarity import ivf_train_centroids

    _sem_cents = ivf_train_centroids(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        n_centroids=16, iters=2,
    )

    def q_semantic_dedup(spark, sf_dir):
        from feast_spark.operators.semdedup import semantic_dedup

        emb = load_table(spark, sf_dir, "embeddings")
        return semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.99, centroids=_sem_cents
        )

    queries["semantic_dedup"] = q_semantic_dedup

if want & {"bm25_index_topk", "hybrid_index_topk", "hybrid_index_batch"}:
    from feast_spark.operators.bm25 import bm25_index_topk, build_bm25_index
    from feast_spark.operators.similarity import build_ivf_index

    _bm25_idx = tempfile.mkdtemp(prefix="prof_bm25_") + "/idx"
    build_bm25_index(
        load_table(spark, sf_dir, "documents"), _bm25_idx,
        "doc_id", "text", n_term_buckets=64,
    )
    _ivf_idx = tempfile.mkdtemp(prefix="prof_ivf_") + "/idx"
    _emb = load_table(spark, sf_dir, "embeddings")
    build_ivf_index(_emb, _ivf_idx, n_centroids=64, iters=2)
    _dim = len(_emb.select("embedding").first()[0])
    _qvec = [float((i * 37) % 19) / 19.0 for i in range(_dim)]

    def q_bm25_index_topk(spark, sf_dir):
        return bm25_index_topk(spark, _bm25_idx, ["hash", "scan", "filter"], k=15)

    def q_hybrid_index_topk(spark, sf_dir):
        from feast_spark.operators.bm25 import hybrid_index_topk

        return hybrid_index_topk(
            spark, _bm25_idx, None, ["hash", "scan", "filter"],
            _qvec, k=10, vec_index_path=_ivf_idx, n_probe=8,
        )

    from feast_spark.io.localframe import local_df as _ldf

    _batch_df = _ldf(
        spark,
        [
            (i, ["hash", "scan", "filter"],
             [float((j * 37 + i) % 19) / 19.0 for j in range(_dim)])
            for i in range(32)
        ],
        "query_id LONG, terms ARRAY<STRING>, qvec ARRAY<DOUBLE>",
    )

    def q_hybrid_index_batch(spark, sf_dir):
        from feast_spark.operators.bm25 import hybrid_index_topk_batch

        return hybrid_index_topk_batch(
            spark, _bm25_idx, None, _batch_df, k=10,
            vec_index_path=_ivf_idx, n_probe=8,
        )

    queries["bm25_index_topk"] = q_bm25_index_topk
    queries["hybrid_index_topk"] = q_hybrid_index_topk
    queries["hybrid_index_batch"] = q_hybrid_index_batch

store = spark.sparkContext._jsc.sc().statusStore()


def job_list():
    it = store.jobsList(None)
    out = []
    for i in range(it.size()):
        j = it.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        out.append((j.jobId(), dur, j.numTasks(), (j.description().isDefined() and j.description().get()) or j.name()))
    return out


for name in sys.argv[1:]:
    fn = queries[name]
    for run in range(3):
        spark.catalog.clearCache()  # honest recompute, like bench.py
        before_ids = {j[0] for j in job_list()}
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        t_build = time.monotonic() - t0
        df.count()
        t_total = time.monotonic() - t0
        jobs = [j for j in job_list() if j[0] not in before_ids]
        jobs.sort(key=lambda j: j[0])
        jsum = sum(j[1] or 0 for j in jobs)
        print(f"\n=== {name} run{run}: build={t_build:.3f} total={t_total:.3f} "
              f"jobs={len(jobs)} jobtime={jsum:.3f}")
        if run == 2:
            for jid, dur, ntasks, desc in jobs:
                print(f"  job {jid}: {dur if dur is not None else -1:6.3f}s tasks={ntasks:4d} {desc[:110]}")

spark.stop()
